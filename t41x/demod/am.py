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


def am_post_cascade(lp_b, lp_a, pole: float = 0.99):
    """(b, a) for the 2-stage post-detector cascade: the one-pole DC
    removal (`wold` recurrence, Process.cpp:700-704 — expressed as the
    equivalent biquad b=[1,-1,0], a=[1,-pole,0]) followed by the audio
    lowpass.  Feed to `iir.BiquadChunked` for chunk-parallel streaming.
    """
    import numpy as np
    b = np.vstack([[1.0, -1.0, 0.0], np.reshape(lp_b, (3,))])
    a = np.vstack([[1.0, -pole, 0.0], np.reshape(lp_a, (3,))])
    return b.astype(np.float32), a.astype(np.float32)


def am_demod(bq_state, y: jnp.ndarray, op: "iir.BiquadChunked"):
    """y: (..., N) complex filtered baseband.

    bq_state: (..., 2, 2) post-detector cascade state (DC block + lowpass)
    Returns (bq_state, audio).
    """
    mag = alpha_beta_mag(y.real, y.imag)
    bq_state, audio = op.apply(bq_state, mag)
    return bq_state, audio
