"""14-band audio equalizer (JAX).

Re-expression of the reference's receive/transmit EQ (tmr4/T41_SDR
`DoReceiveEQ` `Filter.cpp:117-165`, `DoExciterEQ` `:176-224`): 14 parallel
4-pole band-pass biquad cascades at 1/3-octave centers
(fc_i = 125 * 2^((i+1)/3), 198 Hz ... 4 kHz, `FIR.cpp:279-371`), each
scaled by the user's per-band gain — the reference alternates the sign of
odd bands to compensate the cascades' phase inversion — and summed.

The band filters are designed at trace time (4th-order Butterworth
band-pass via bilinear transform) rather than shipped as baked tables;
they match the reference filters' centers and ~0.3 fc bandwidths.
All 14 bands across all channels run as one batched biquad scan.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from t41x import constants as C

NUM_BANDS = 14


def band_centers() -> np.ndarray:
    i = np.arange(1, NUM_BANDS + 1)
    return 125.0 * 2.0 ** ((i + 1) / 3.0)


def design_eq_bands(rate: float = C.AUDIO_RATE):
    """Returns (b, a) of shape (14, S, 3): per-band biquad cascades."""
    from scipy import signal

    bs, as_ = [], []
    for fc in band_centers():
        bw = 0.3045 * fc
        lo = max(fc - bw / 2.0, 10.0)
        hi = min(fc + bw / 2.0, rate / 2.0 * 0.98)
        sos = signal.butter(2, [lo, hi], btype="bandpass", fs=rate,
                            output="sos")
        bs.append(sos[:, :3])
        as_.append(sos[:, 3:])
    return (np.asarray(bs, np.float32), np.asarray(as_, np.float32))


class EQDesign:
    def __init__(self, rate: float = C.AUDIO_RATE):
        self.b, self.a = design_eq_bands(rate)
        self.stages = self.b.shape[1]

    def init_state(self, channels: tuple[int, ...] = ()) -> np.ndarray:
        """(..., 14, S, 2) biquad states."""
        return np.zeros(channels + (NUM_BANDS, self.stages, 2), np.float32)

    def apply(self, state: jnp.ndarray, x: jnp.ndarray,
              gains: jnp.ndarray):
        """x: (..., N) audio; gains: (..., 14) in 0..1 (user setting/100).
        Returns (state, y).  Odd bands are negated like the reference
        (`Filter.cpp:136-149`)."""
        xb = jnp.repeat(x[..., None, :], NUM_BANDS, axis=-2)  # (...,14,N)
        state, yb = _banked_biquads(state, xb, jnp.asarray(self.b),
                                    jnp.asarray(self.a))
        signs = jnp.asarray([(-1.0) ** (i + 1) * -1.0
                             for i in range(NUM_BANDS)], x.dtype)
        # signs: band1 -, band2 +, band3 -, ... (Filter.cpp:136-149)
        y = jnp.sum(yb * (signs * gains)[..., None], axis=-2)
        return state, y


def _banked_biquads(state, xb, b, a):
    """Apply band-specific biquad cascades: state (..., B, S, 2),
    xb (..., B, N), b/a (B, S, 3)."""
    import jax

    def per_sample(s, xn):
        # xn: (..., B); s: (..., B, S, 2)
        v = xn
        outs = s
        for stage in range(b.shape[1]):
            s1 = outs[..., stage, 0]
            s2 = outs[..., stage, 1]
            y = b[:, stage, 0] * v + s1
            ns1 = b[:, stage, 1] * v - a[:, stage, 1] * y + s2
            ns2 = b[:, stage, 2] * v - a[:, stage, 2] * y
            outs = outs.at[..., stage, 0].set(ns1)
            outs = outs.at[..., stage, 1].set(ns2)
            v = y
        return outs, v

    xs = jnp.moveaxis(xb, -1, 0)  # (N, ..., B)
    state, ys = jax.lax.scan(per_sample, state, xs)
    return state, jnp.moveaxis(ys, 0, -1)
