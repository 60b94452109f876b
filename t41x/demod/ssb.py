"""SSB demodulation (JAX).

USB and LSB share one code path: the overlap-save band-pass mask has
already selected the sideband, so demodulation is just the real part of
the filtered analytic signal (reference `Process.cpp:616-695`).
"""

from __future__ import annotations

import jax.numpy as jnp


def ssb_demod(y: jnp.ndarray) -> jnp.ndarray:
    """y: (..., N) complex filtered baseband -> (..., N) real audio."""
    return y.real
