from t41x.mesh.sharding import channel_sharded_run, make_mesh  # noqa: F401
