"""Wideband polyphase channelizer (JAX).

The piece with no reference analog (SURVEY.md §7 phase 6): the reference
receives ONE 192 kHz channel from analog hardware; t41x decomposes a
single wideband I/Q capture (K x 192 kHz wide) into K critically-sampled
192 kHz channels — which then fan out over the mesh's channel axis into
the standard RX chain.

Classic critically-sampled polyphase DFT filter bank.  Derivation:
channel k is decimate-by-K of x[n] e^{-j2pi kn/K} filtered by the
prototype h.  Substituting n = tK+p:

    y_k[m] = sum_p e^{+j2pi kp/K} v_p[m]
    v_p[m] = sum_t h[tK+p] * u_p[m-t],   with  u_p[m] = x[mK - p]

i.e. the commutator feeds the phases in REVERSED order with a
one-sample stagger — that pairing is what makes the per-branch aliases
cancel.  On TPU the branch FIRs are P fused multiply-adds over
(n_out, K) frames and the phase DFT is one batched length-K IFFT.
"""

from __future__ import annotations

import jax.numpy as jnp

from t41x.kernels import mxu_fft
import numpy as np

from t41x import constants as C
from t41x.utils import windows as W


class Channelizer:
    def __init__(self, num_channels: int, taps_per_phase: int = 12,
                 fs_channel: float = C.SAMPLE_RATE):
        self.K = num_channels
        self.P = taps_per_phase
        self.fs_channel = fs_channel
        self.fs_in = num_channels * fs_channel
        n = num_channels * taps_per_phase
        # prototype lowpass: cutoff at the channel Nyquist
        beta = W.kaiser_beta(80.0)
        h = np.sinc(np.arange(n) / num_channels
                    - taps_per_phase / 2) * W.kaiser(n, beta)
        h /= h.sum()
        # polyphase decomposition: hp[p, t] = h[t*K + p]
        self.hp = (h.reshape(taps_per_phase, num_channels).T
                   * num_channels).astype(np.float32)

    def init_state(self, batch: tuple[int, ...] = ()) -> np.ndarray:
        """(..., P*K - 1) raw-sample history (commutator + FIR tails)."""
        return np.zeros(batch + (self.P * self.K - 1,), np.complex64)

    def block(self, state: jnp.ndarray, x: jnp.ndarray):
        """x: (..., N) wideband complex at K*fs, N divisible by K.
        Returns (state, channels) with channels (..., K, N/K); channel k
        is centered at +k*fs_channel (k > K/2: negative frequencies)."""
        K, P = self.K, self.P
        L = P * K - 1
        n_out = x.shape[-1] // K
        xc = jnp.concatenate([state, x], axis=-1)  # xc[j] = x[j - L]
        hp = jnp.asarray(self.hp)

        v = None
        for t in range(P):
            start = L - K + 1 - t * K
            w = xc[..., start: start + n_out * K]
            w = w.reshape(x.shape[:-1] + (n_out, K))[..., ::-1]  # u_p[m-t]
            term = hp[:, t] * w                     # (..., n_out, K)
            v = term if v is None else v + term
        new_state = xc[..., -L:]

        # channel k = sum_p e^{+j2pi kp/K} v_p == K * ifft over phases
        ch = mxu_fft.ifft(v, axis=-1) * K           # (..., n_out, K)
        return new_state, jnp.swapaxes(ch, -1, -2).astype(jnp.complex64)

    def channel_center_hz(self, k: int) -> float:
        """Center frequency of channel k in the wideband capture."""
        k = k if k <= self.K // 2 else k - self.K
        return k * self.fs_channel
