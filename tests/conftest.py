"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Sharding/halo logic is validated on virtual CPU devices (the driver
separately dry-run-compiles the multi-chip path); numerical kernels are
platform-independent.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
