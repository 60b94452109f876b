"""Narrow-band FM quadrature-discriminator demodulation (JAX).

y[n] = K * (q[n] i[n-1] - i[n] q[n-1]) / (i[n]^2 + q[n]^2), then a hard
limiter to [-1, 1] (reference `nfmdemod` `Demod.cpp:220-235` and limiter
`Process.cpp:719-727`, csdr-derived, Lyons 13.22).  One complex sample of
carried state; elementwise otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# csdr's discriminator gain (reference `Demod.h:7`).
FMDEMOD_QUADRI_K = 0.3404475502381010


def nfm_state(channels: tuple[int, ...] = ()):
    """(...,) complex carried last sample (host array)."""
    return np.zeros(channels, np.complex64)


def nfm_demod(last: jnp.ndarray, z: jnp.ndarray, limit: bool = True):
    """z: (..., N) complex baseband at audio rate.
    Returns (new_last, audio) with audio real (..., N)."""
    zprev = jnp.concatenate([last[..., None], z[..., :-1]], axis=-1)
    i, q = z.real, z.imag
    il, ql = zprev.real, zprev.imag
    power = i * i + q * q
    out = FMDEMOD_QUADRI_K * (q * il - i * ql) / jnp.maximum(power, 1e-20)
    if limit:
        out = jnp.clip(out, -1.0, 1.0)
    return z[..., -1], out
