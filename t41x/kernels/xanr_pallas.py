"""Pallas TPU kernel: the variable-leak LMS (Xanr) sample recurrence.

The WDSP Xanr NR/autonotch (reference `Noise.cpp:322-370`; functional
derivation in `t41x.dsp.nr.xanr`) is the chain's last true serial wall:
a 64-tap adaptive predictor whose weights update every audio sample.
As a `lax.scan` every step hauls the (C, 64) weight matrix and
regressor window through HBM several times — ~400 MB of traffic per
2048-sample block at 1024 channels, measured +982 us over the baseline
chain (PERF.md stage table).

Here the whole recurrence runs inside one Pallas program per channel
tile: the weights, the [history | block] regressor buffer, and the leak
state stay resident in VMEM across all N steps, so HBM traffic is the
block in / audio out / carried state — and each step is pure VPU work
(two (T, 8, 128) reductions and one fused weight update).

Step math is `t41x.dsp.nr.xanr`'s, oldest-first convention; parity vs
the scan path is `tests/test_pallas_kernels.py::test_xanr_pallas...`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8
_LANES = 128
TILE_C = _SUB * _LANES  # channels per program


def _kernel(p, n, x_ref, h_ref, w_ref, li_ref, ng_ref,
            y_ref, wo_ref, lio_ref, ngo_ref, pad_ref):
    f32 = jnp.float32
    T, D = p.taps, p.delay
    HD = T + D

    # oldest-first [history | block] regressor buffer in VMEM
    pad_ref[0:HD] = h_ref[0]
    pad_ref[HD:HD + n] = x_ref[0]

    w0 = w_ref[0]                       # (T, SUB, LANES) oldest-first

    def body(i, carry):
        w, lidx, ngamma = carry
        xn = pad_ref[HD + i]
        reg = pad_ref[pl.ds(i + 1, T)]  # x[n-D-(T-1) .. n-D], oldest first
        y = jnp.sum(w * reg, axis=0)
        sigma = jnp.sum(reg * reg, axis=0)
        inv_sigp = 1.0 / (sigma + f32(1e-10))
        error = xn - y

        y_ref[0, i] = error if p.notch else y

        nel = jnp.abs(error * (1.0 - p.two_mu * sigma * inv_sigp))
        nev = jnp.abs(xn - (1.0 - p.two_mu * ngamma) * y
                      - p.two_mu * error * sigma * inv_sigp)
        over = (lidx + p.lincr) > p.lidx_max
        lidx_new = jnp.where(
            over, p.lidx_max,
            jnp.maximum(lidx + p.lincr - p.ldecr, p.lidx_min))
        lidx = jnp.where(nev < nel, lidx_new, lidx)
        ngamma = p.gamma * (lidx ** 4) * p.den_mult

        c0 = 1.0 - p.two_mu * ngamma
        c1 = p.two_mu * error * inv_sigp
        w = c0[None] * w + c1[None] * reg
        return (w, lidx, ngamma)

    w, lidx, ngamma = jax.lax.fori_loop(
        0, n, body, (w0, li_ref[0], ng_ref[0]))
    wo_ref[0] = w
    lio_ref[0] = lidx
    ngo_ref[0] = ngamma


@functools.partial(jax.jit, static_argnums=(0, 6))
def _call(p, x, hist, w, lidx, ngamma, interpret):
    g, n, sub, lanes = x.shape
    T = p.taps
    HD = T + p.delay
    f32 = jnp.float32
    tm = lambda r: pl.BlockSpec((1, r, sub, lanes),  # noqa: E731
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    tc = pl.BlockSpec((1, sub, lanes), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, p, n),
        grid=(g,),
        in_specs=[tm(n), tm(HD), tm(T), tc, tc],
        out_specs=[tm(n), tm(T), tc, tc],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, T, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
        ],
        scratch_shapes=[pltpu.VMEM((HD + n, sub, lanes), f32)],
        interpret=interpret,
    )(x, hist, w, lidx, ngamma)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def xanr_block_pallas(p, st, x, *, interpret=None):
    """Drop-in for `t41x.dsp.nr.xanr`'s scan: same XanrState in/out
    (public newest-first layout), same output."""
    if interpret is None:
        interpret = _auto_interpret()
    n = x.shape[-1]
    T, D = p.taps, p.delay
    HD = T + D
    ch_shape = x.shape[:-1]
    c = 1
    for d in ch_shape:
        c *= d
    g = max(1, -(-c // TILE_C))
    pad = g * TILE_C - c

    def tiles_t(a, t):
        a = a.reshape(c, t)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.reshape(g, _SUB, _LANES, t).transpose(0, 3, 1, 2)

    def tiles_c(a):
        a = jnp.asarray(a, jnp.float32).reshape(c)
        if pad:
            a = jnp.pad(a, ((0, pad),))
        return a.reshape(g, _SUB, _LANES)

    xs = tiles_t(x.astype(jnp.float32), n)
    hist = tiles_t(st.dline[..., ::-1], HD)       # oldest-first
    w = tiles_t(st.w[..., ::-1], T)               # oldest-first
    outs = _call(p, xs, hist, w, tiles_c(st.lidx), tiles_c(st.ngamma),
                 interpret)

    def from_t(a):
        t = a.shape[1]
        return a.transpose(0, 2, 3, 1).reshape(g * TILE_C, t)[:c].reshape(
            ch_shape + (t,))

    def from_c(a):
        return a.reshape(g * TILE_C)[:c].reshape(ch_shape)

    ys = from_t(outs[0]) * (1.0 if p.notch else p.post_gain)
    padded = jnp.concatenate([st.dline[..., ::-1], x], axis=-1)
    new_dline = padded[..., -HD:][..., ::-1]
    from t41x.dsp.nr import XanrState
    new_st = XanrState(new_dline, from_t(outs[1])[..., ::-1],
                       from_c(outs[2]), from_c(outs[3]))
    return new_st, ys
