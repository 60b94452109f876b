"""Pallas TPU kernel: fused two-stage polyphase decimator (hot loop #1).

The RX chain's 192 kHz -> 24 kHz front end (x4 then x2 FIR decimation,
reference `Process.cpp:474-479`) as ONE VMEM-resident kernel per channel
tile: both stages' histories, the 2048-sample input block, and the
intermediate 48 kHz signal never touch HBM.  Per block and channel the
work is T1*N/4 + T2*N/8 ~ 26k MACs — VPU-bound streaming, fused across
both stages and both I/Q components.

Strided access is expressed as reshape-to-(n_out, M) on loaded values
(Mosaic lowers this to lane shuffles), with a static unrolled tap loop.

Falls back trivially: t41x.dsp.fir.fir_decimate remains the reference
path and the two are tested equal in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from t41x import constants as C

TILE_C = 128


def _make_kernel(h1: np.ndarray, h2: np.ndarray, n_in: int):
    t1, t2 = len(h1), len(h2)
    m1, m2 = C.DF1, C.DF2
    n_mid = n_in // m1
    n_out = n_mid // m2
    h1_rev = h1[::-1].astype(np.float32)
    h2_rev = h2[::-1].astype(np.float32)

    def decimate(xc, h_rev, m, n_o):
        # xc: (C, T-1+N) values; y[n] = sum_k h_rev[k] * xc[M-1 + n*M + k].
        # Pad the tail by M-1 so every tap's slice reshapes to (n_o, M);
        # the padded positions land in discarded lanes [:, :, 1:].
        xs = jnp.concatenate(
            [xc[:, m - 1:],
             jnp.zeros((xc.shape[0], m - 1), xc.dtype)], axis=1)
        y = None
        for k in range(len(h_rev)):
            seg = xs[:, k: k + n_o * m]
            seg = seg.reshape(seg.shape[0], n_o, m)[:, :, 0]
            term = float(h_rev[k]) * seg
            y = term if y is None else y + term
        return y

    def kernel(s1_ref, s2_ref, x_ref, y_ref, ns1_ref, ns2_ref):
        s1 = s1_ref[:]
        s2 = s2_ref[:]
        x = x_ref[:]
        xc1 = jnp.concatenate([s1, x], axis=1)
        mid = decimate(xc1, h1_rev, m1, n_mid)
        xc2 = jnp.concatenate([s2, mid], axis=1)
        y_ref[:] = decimate(xc2, h2_rev, m2, n_out)
        ns1_ref[:] = xc1[:, -(t1 - 1):]
        ns2_ref[:] = xc2[:, -(t2 - 1):]

    return kernel, n_out


@functools.partial(jax.jit,
                   static_argnames=("h1", "h2", "n_in", "interpret"))
def _call(s1, s2, x, h1, h2, n_in, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t1, t2 = len(h1), len(h2)
    kernel, n_out = _make_kernel(np.asarray(h1), np.asarray(h2), n_in)
    n_ch = x.shape[0]
    tile = min(TILE_C, n_ch)
    grid = (max(n_ch // tile, 1),)

    def spec(cols):
        return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    y, ns1, ns2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(t1 - 1), spec(t2 - 1), spec(n_in)],
        out_specs=[spec(n_out), spec(t1 - 1), spec(t2 - 1)],
        out_shape=[
            jax.ShapeDtypeStruct((n_ch, n_out), jnp.float32),
            jax.ShapeDtypeStruct((n_ch, t1 - 1), jnp.float32),
            jax.ShapeDtypeStruct((n_ch, t2 - 1), jnp.float32),
        ],
        interpret=interpret,
    )(s1, s2, x)
    return y, ns1, ns2


class FusedDecimator:
    """Two-stage x8 decimator with Pallas execution.

    Complex I/Q runs as two real passes sharing the tap tables."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray,
                 n_in: int = C.BLOCK_SIZE, interpret: bool = False):
        self.h1 = np.asarray(h1, np.float32)
        self.h2 = np.asarray(h2, np.float32)
        self.n_in = n_in
        self.interpret = interpret

    def init_state(self, channels: tuple[int, ...] = ()):
        return (np.zeros(channels + (len(self.h1) - 1,), np.complex64),
                np.zeros(channels + (len(self.h2) - 1,), np.complex64))

    def block(self, state, x: jnp.ndarray):
        s1, s2 = state
        h1t = tuple(float(v) for v in self.h1)
        h2t = tuple(float(v) for v in self.h2)

        def run_real(s1r, s2r, xr):
            return _call(s1r, s2r, xr, h1=h1t, h2=h2t,
                         n_in=self.n_in, interpret=self.interpret)

        yr, ns1r, ns2r = run_real(jnp.real(s1).astype(jnp.float32),
                                  jnp.real(s2).astype(jnp.float32),
                                  jnp.real(x).astype(jnp.float32))
        yi, ns1i, ns2i = run_real(jnp.imag(s1).astype(jnp.float32),
                                  jnp.imag(s2).astype(jnp.float32),
                                  jnp.imag(x).astype(jnp.float32))
        y = (yr + 1j * yi).astype(jnp.complex64)
        ns1 = (ns1r + 1j * ns1i).astype(jnp.complex64)
        ns2 = (ns2r + 1j * ns2i).astype(jnp.complex64)
        return (ns1, ns2), y
