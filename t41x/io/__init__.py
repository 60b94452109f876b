from t41x.io import signals, wav  # noqa: F401
