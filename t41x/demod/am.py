"""AM envelope demodulation (JAX).

alpha-max + beta-min magnitude approximation followed by a one-pole DC
removal and a biquad lowpass (reference `Process.cpp:697-707`,
`AlphaBetaMag` `Utility.cpp:269-285`).
"""

from __future__ import annotations

import jax.numpy as jnp

from t41x.dsp import iir

ALPHA = 0.960433870103
BETA = 0.397824734759


def alpha_beta_mag(i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """|i + jq| approximated as alpha*max(|i|,|q|) + beta*min(|i|,|q|)."""
    ai, aq = jnp.abs(i), jnp.abs(q)
    return ALPHA * jnp.maximum(ai, aq) + BETA * jnp.minimum(ai, aq)


def am_demod(dc_state, bq_state, y: jnp.ndarray, b, a):
    """y: (..., N) complex filtered baseband.

    dc_state: (...,) one-pole DC-block carry (`wold`)
    bq_state: (..., 1, 2) audio lowpass biquad state
    Returns (dc_state, bq_state, audio).
    """
    mag = alpha_beta_mag(y.real, y.imag)
    dc_state, audio = iir.one_pole_dc_block(dc_state, mag, 0.99)
    bq_state, audio = iir.biquad_apply(bq_state, audio, b, a)
    return dc_state, bq_state, audio
