"""Pallas TPU kernel: the SAM PLL per-sample recurrence.

The synchronous-AM demodulator's phase-locked loop (reference
`AMDecodeSAM` `Demod.cpp:40-139`; functional form `t41x.demod.sam`) is
per-sample sequential — the NCO phase at n depends on the loop filter
at n-1.  As a `lax.scan` it costs +84 us over the fused chain at 1024
channels (stage table, PERF.md).  This kernel runs the whole block's
loop inside one Pallas program with the five per-channel loop states in
VPU registers; channels tile (sublane, lane) like the AGC kernel, so
each of the N steps is a handful of full-width VPU ops (sin/cos/atan2
transcendentals included) and HBM traffic is the baseband in / audio
out / carried state.

Step math is `t41x.demod.sam.sam_step` — one source of truth with the
scan path; parity in `tests/test_pallas_kernels.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8
_LANES = 128
TILE_C = _SUB * _LANES


def _kernel(p, n, yr_ref, yi_ref, phz_ref, fil_ref, om2_ref, dc_ref,
            dci_ref, a_ref, phzo_ref, filo_ref, om2o_ref, dco_ref,
            dcio_ref):
    from t41x.demod.sam import sam_step

    def body(t, carry):
        carry, audio = sam_step(p, carry, yr_ref[0, t], yi_ref[0, t])
        a_ref[0, t] = audio
        return carry

    phz, fil, om2, dc, dci = jax.lax.fori_loop(
        0, n, body,
        (phz_ref[0], fil_ref[0], om2_ref[0], dc_ref[0], dci_ref[0]))
    phzo_ref[0] = phz
    filo_ref[0] = fil
    om2o_ref[0] = om2
    dco_ref[0] = dc
    dcio_ref[0] = dci


@functools.partial(jax.jit, static_argnums=(0, 3))
def _call(p, ys, states, interpret):
    g, n, sub, lanes = ys[0].shape
    f32 = jnp.float32
    tm = pl.BlockSpec((1, n, sub, lanes), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    tc = pl.BlockSpec((1, sub, lanes), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, p, n),
        grid=(g,),
        in_specs=[tm, tm] + [tc] * 5,
        out_specs=[tm] + [tc] * 5,
        out_shape=[jax.ShapeDtypeStruct((g, n, sub, lanes), f32)]
        + [jax.ShapeDtypeStruct((g, sub, lanes), f32)] * 5,
        interpret=interpret,
    )(*ys, *states)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def sam_block_pallas(p, st, y, *, interpret=None):
    """Drop-in for the SAM `lax.scan`: st: SAMState; y: (..., N)
    complex64 baseband.  Returns (new SAMState, audio)."""
    if interpret is None:
        interpret = _auto_interpret()
    n = y.shape[-1]
    ch_shape = y.shape[:-1]
    c = 1
    for d in ch_shape:
        c *= d
    g = max(1, -(-c // TILE_C))
    pad = g * TILE_C - c

    def tiles_t(a):
        a = a.reshape(c, n)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.reshape(g, _SUB, _LANES, n).transpose(0, 3, 1, 2)

    def tiles_c(a):
        a = jnp.asarray(a, jnp.float32).reshape(c)
        if pad:
            a = jnp.pad(a, ((0, pad),))
        return a.reshape(g, _SUB, _LANES)

    ys = (tiles_t(y.real.astype(jnp.float32)),
          tiles_t(y.imag.astype(jnp.float32)))
    states = tuple(tiles_c(s) for s in
                   (st.phzerror, st.fil_out, st.omega2, st.dc,
                    st.dc_insert))
    outs = _call(p, ys, states, interpret)

    def from_t(a):
        return a.transpose(0, 2, 3, 1).reshape(g * TILE_C, n)[:c].reshape(
            ch_shape + (n,))

    def from_c(a):
        return a.reshape(g * TILE_C)[:c].reshape(ch_shape)

    from t41x.demod.sam import SAMState
    new_st = SAMState(*(from_c(o) for o in outs[1:]))
    return new_st, from_t(outs[0])
