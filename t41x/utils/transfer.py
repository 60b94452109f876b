"""Device->host fetch that tolerates restricted PJRT transports.

Some remote TPU transports (e.g. the axon loopback relay in this image)
only implement device->host copies for float32 buffers; complex64,
int32, bool, and some odd 2-D shapes fail with UNIMPLEMENTED.  `fetch`
reshapes/bitcasts any array to a flat float32 buffer on device, copies
that, and reassembles the original dtype/shape on host.

Use `fetch(x)` anywhere you would call `np.asarray(device_array)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _as_flat_f32(x):
    if jnp.iscomplexobj(x):
        return jnp.stack([x.real.ravel(), x.imag.ravel()]).ravel()
    if x.dtype == jnp.float32:
        return x.ravel()
    if x.dtype in (jnp.int32, jnp.uint32):
        return jax.lax.bitcast_convert_type(x.ravel(), jnp.float32)
    # everything else: widen/convert to f32 by value
    return x.ravel().astype(jnp.float32)


def fetch(x) -> np.ndarray:
    """Copy a device array to host, working around f32-only transports."""
    if isinstance(x, np.ndarray):
        return x
    shape, dtype = x.shape, x.dtype
    try:
        return np.asarray(x)
    except Exception:
        pass
    flat = np.asarray(_as_flat_f32(x))
    if np.issubdtype(dtype, np.complexfloating):
        half = flat.reshape(2, -1)
        out = (half[0] + 1j * half[1]).astype(dtype)
    elif dtype in (np.dtype(np.int32), np.dtype(np.uint32)):
        out = flat.view(np.int32).astype(dtype)
    elif dtype == np.dtype(bool):
        out = flat > 0.5
    else:
        out = flat.astype(dtype)
    return out.reshape(shape)


def fetch_tree(tree):
    """fetch() every leaf of a pytree."""
    return jax.tree.map(fetch, tree)
