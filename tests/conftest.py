"""Test harness: force an 8-device virtual CPU mesh.

The machine environment pins JAX_PLATFORMS=axon (a single-tenant remote
TPU tunnel) and a sitecustomize registers that backend in every
interpreter, overriding the env var — so we must override via
jax.config.update, before any computation runs.  Sharding/halo logic is
validated on virtual CPU devices; the driver separately dry-run-compiles
the multi-chip path, and bench.py targets the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (sitecustomize has already imported it anyway)

jax.config.update("jax_platforms", "cpu")
