"""Pallas TPU kernel: fused x2 + x4 output interpolation (hot loop #3).

The RX chain ends by interpolating 256 audio samples back to 2048 at
192 kHz (reference `Process.cpp:915-931`: `arm_fir_interpolate_f32`
x2 then x4, then the volume scale).  As two XLA convs this stage
measured 96 us/block at 1024 channels — the single largest cost after
the fused front end — dominated by HBM round-trips of the intermediate
and output streams and the 3-pass matmul-precision tax on the conv
lowerings.  This kernel runs BOTH polyphase stages and the volume scale
in one program: the 24 kHz block is read once, the 48 kHz intermediate
lives only in VMEM, and the 192 kHz result is written once.

Per 128-channel tile (time-major inside, like the decimator in
frontend_pallas):

  * stage 1 (x2, 48 taps): per output phase p, y[2n+p] =
    sum_j hp1[j, p] * xc1[n + j] — `sub1` shifted VMEM mult-adds on
    (256, 128) tiles; phases interleave via a stack+reshape on values.
  * stage 2 (x4, 32 taps): same over the (512, 128) intermediate.
  * volume: the per-channel DF*vol scale folds into the final store
    (the reference's x^5 taper applied at `Process.cpp:925-931`).

Exact `fir.fir_interpolate` semantics (CMSIS zero-stuff convention,
histories at input rate); state carries stay interchangeable with the
unfused path: int1 is the last sub1-1 input samples (computed outside),
int2 is the stage-1 output tail (a tiny second kernel output).
Parity: tests/test_pallas_kernels.py (interpret mode on CPU) and
tools/chipcheck.py (real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t41x import constants as C

TILE_C = 128


class FusedInterp:
    def __init__(self, h1: np.ndarray, h2: np.ndarray,
                 interpret: bool | None = None):
        h1 = np.asarray(h1, np.float32)     # x2 stage (C.DF2)
        h2 = np.asarray(h2, np.float32)     # x4 stage (C.DF1)
        self.sub1 = len(h1) // C.DF2
        self.sub2 = len(h2) // C.DF1
        # hp_rev[j, p] = h[(sub-1-j)*L + p]  (window oldest-first)
        self.hp1 = h1.reshape(self.sub1, C.DF2)[::-1].copy()
        self.hp2 = h2.reshape(self.sub2, C.DF1)[::-1].copy()
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)

    # ------------------------------------------------------------------
    def _kernel(self, n, x_ref, s1_ref, s2_ref, vol_ref, y_ref, t1_ref,
                xc1_ref, xc2_ref):
        sub1, sub2 = self.sub1, self.sub2
        n2 = 2 * n
        xc1_ref[: sub1 - 1] = s1_ref[0].T
        xc1_ref[sub1 - 1:] = x_ref[0].T

        def stage(xc_ref, hp, n_in):
            phases = []
            for p in range(hp.shape[1]):
                acc = hp[0, p] * xc_ref[0:n_in]
                for j in range(1, hp.shape[0]):
                    acc = acc + hp[j, p] * xc_ref[j: j + n_in]
                phases.append(acc)
            # interleave phases: (n_in, L, TILE_C) -> (n_in*L, TILE_C)
            return jnp.stack(phases, axis=1).reshape(
                n_in * hp.shape[1], TILE_C)

        y1 = stage(xc1_ref, self.hp1, n)          # (2n, TILE_C) @48 kHz
        t1_ref[0] = y1[n2 - (sub2 - 1):].T        # stage-2 history tail
        xc2_ref[: sub2 - 1] = s2_ref[0].T
        xc2_ref[sub2 - 1:] = y1
        y = stage(xc2_ref, self.hp2, n2)          # (8n, TILE_C)
        y_ref[0] = y.T * vol_ref[0]

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _call(self, x, s1, s2, vol):
        gdim, _, n = x.shape
        f32 = jnp.float32
        sub1, sub2 = self.sub1, self.sub2

        def cspec(d):
            return pl.BlockSpec((1, TILE_C, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        out_shape = [
            jax.ShapeDtypeStruct((gdim, TILE_C, C.DF * n), f32),
            jax.ShapeDtypeStruct((gdim, TILE_C, sub2 - 1), f32),
        ]
        scratch = [
            pltpu.VMEM((n + sub1 - 1, TILE_C), f32),
            pltpu.VMEM((2 * n + sub2 - 1, TILE_C), f32),
        ]
        return pl.pallas_call(
            functools.partial(self._kernel, n),
            grid=(gdim,),
            in_specs=[cspec(n), cspec(sub1 - 1), cspec(sub2 - 1),
                      cspec(1)],
            out_specs=[cspec(C.DF * n), cspec(sub2 - 1)],
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=self.interpret,
        )(x, s1, s2, vol)

    # ------------------------------------------------------------------
    def apply(self, audio: jnp.ndarray, int1: jnp.ndarray,
              int2: jnp.ndarray, vol: jnp.ndarray):
        """audio: (..., N) f32; int1/int2: fir_interpolate histories;
        vol: (...,) per-channel output scale (DF * volume taper).
        Returns (int1', int2', y (..., N*8) scaled)."""
        lead = audio.shape[:-1]
        n = audio.shape[-1]
        c = 1
        for d in lead:
            c *= d
        gdim = max(1, -(-c // TILE_C))
        pad = gdim * TILE_C - c

        def tiles(a, d):
            a = a.reshape(c, d)
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0)))
            return a.reshape(gdim, TILE_C, d)

        y, t1 = self._call(
            tiles(audio, n), tiles(int1, self.sub1 - 1),
            tiles(int2, self.sub2 - 1),
            tiles(jnp.broadcast_to(vol[..., None], lead + (1,)), 1))
        unt = lambda a, d: a.reshape(gdim * TILE_C, d)[  # noqa: E731
            :c].reshape(lead + (d,))
        int1_new = audio[..., -(self.sub1 - 1):]
        return (int1_new, unt(t1, self.sub2 - 1),
                unt(y, C.DF * n))
