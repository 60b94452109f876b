"""Streaming IIR biquads (JAX).

Re-expression of the CMSIS biquad cascades the reference uses everywhere
(`arm_biquad_cascade_df2T_f32` / `_df1_f32`: DC block `Process.cpp:127`,
AM lowpass `Process.cpp:705`, CW audio filters `Process.cpp:882-912`,
EQ bands `Filter.cpp:117-165`, Zoom-FFT pre-filters `FFT.cpp:86-90`).

Direct-form II transposed as a `lax.scan` over samples with a 2-element
state per stage; channels ride a leading batch axis so one scan serves
the whole channel batch (the per-sample dependency is unavoidable for
IIR, but the per-step work is a fat vector op across channels).
Coefficients use the standard convention b=[b0,b1,b2], a=[1,a1,a2]:
    y = b0 x + s1;  s1' = b1 x - a1 y + s2;  s2' = b2 x - a2 y
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def biquad_state(channels: tuple[int, ...] = (), stages: int = 1,
                 dtype=np.float32) -> np.ndarray:
    """(..., stages, 2) df2T state (host array; see fir.fir_state)."""
    return np.zeros(channels + (stages, 2), np.dtype(dtype).name)


def biquad_apply(state: jnp.ndarray, x: jnp.ndarray, b: jnp.ndarray,
                 a: jnp.ndarray):
    """Apply a cascade of biquad stages to a block.

    state: (..., S, 2)   x: (..., N)
    b: (S, 3)  a: (S, 3) with a[:,0]==1
    Returns (new_state, y).
    """
    b = jnp.atleast_2d(jnp.asarray(b, x.dtype))
    a = jnp.atleast_2d(jnp.asarray(a, x.dtype))

    def per_sample(s, xn):
        # xn: (...,) one sample across channels; s: (..., S, 2)
        def stage(carry, inputs):
            v, s_all = carry  # v: current sample through cascade
            idx = inputs
            s1 = s_all[..., idx, 0]
            s2 = s_all[..., idx, 1]
            y = b[idx, 0] * v + s1
            ns1 = b[idx, 1] * v - a[idx, 1] * y + s2
            ns2 = b[idx, 2] * v - a[idx, 2] * y
            s_all = s_all.at[..., idx, 0].set(ns1)
            s_all = s_all.at[..., idx, 1].set(ns2)
            return (y, s_all), None

        (y, s), _ = jax.lax.scan(stage, (xn, s), jnp.arange(b.shape[0]))
        return s, y

    new_state, y = jax.lax.scan(per_sample, state, jnp.moveaxis(x, -1, 0))
    return new_state, jnp.moveaxis(y, 0, -1)


def biquad_reference(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """NumPy oracle: cascade of df2T biquads, zero initial state."""
    b = np.atleast_2d(b)
    a = np.atleast_2d(a)
    y = np.asarray(x, np.float64).copy()
    for s in range(b.shape[0]):
        out = np.empty_like(y)
        s1 = s2 = 0.0
        for n, v in enumerate(y):
            o = b[s, 0] * v + s1
            s1 = b[s, 1] * v - a[s, 1] * o + s2
            s2 = b[s, 2] * v - a[s, 2] * o
            out[n] = o
        y = out
    return y


def one_pole_dc_block(state, x, pole: float = 0.99):
    """The AM demod's one-pole DC-removal recurrence (reference
    `Process.cpp:700-704`):  w = x + pole*w_old;  y = w - w_old.

    state: (...,) w_old;  x: (..., N).  Returns (new_state, y).
    """
    def step(w_old, xn):
        w = xn + pole * w_old
        return w, w - w_old

    w, y = jax.lax.scan(step, state, jnp.moveaxis(x, -1, 0))
    return w, jnp.moveaxis(y, 0, -1)
