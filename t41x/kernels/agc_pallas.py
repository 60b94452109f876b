"""Pallas TPU kernel: the WDSP AGC gain recurrence (hot loop #2).

The AGC's per-sample state machine (reference `DSP_Fn.cpp:479-632`; see
`t41x/dsp/agc.py` for the functional derivation) is an inherently
sequential recurrence: gain at sample n depends on gain at n-1.  As a
`lax.scan` it costs one XLA while-loop iteration per audio sample —
256 iterations/block whose fixed loop overhead dwarfs the ~30 vector
ops of real work each.

This kernel runs the same 256-step loop *inside* one Pallas program:
the per-channel state lives in VPU registers/VMEM across the whole
block, channels are laid out on (sublane, lane) tiles so every step is
a handful of full-width VPU ops, and the only HBM traffic is the
time-major ring_max/abs_out inputs and the volts sequence output.

The step math itself is `t41x.dsp.agc.agc_step` — one source of truth,
pinned by the scalar oracle (`tests/test_agc_oracle.py`); kernel-vs-scan
equality is covered in `tests/test_pallas_kernels.py`.  The parallel
prework (look-ahead delay line, sliding-window max, log-domain gain
curve) stays in XLA — bandwidth-trivial at audio rate and fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# channels per program instance: sublanes x lanes
_SUB = 8
_LANES = 128
TILE_C = _SUB * _LANES  # 1024


def _kernel(p, n, rm_ref, ao_ref, v_ref, sv_ref, fb_ref, hb_ref, hc_ref,
            dt_ref, st_ref, vseq_ref, vo_ref, svo_ref, fbo_ref, hbo_ref,
            hco_ref, dto_ref, sto_ref):
    from t41x.dsp.agc import agc_step

    carry0 = (v_ref[0], sv_ref[0], fb_ref[0], hb_ref[0],
              hc_ref[0], dt_ref[0], st_ref[0])

    def body(t, carry):
        new = agc_step(p, carry, rm_ref[0, t], ao_ref[0, t])
        vseq_ref[0, t] = new[0]
        return new

    v, sv, fb, hb, hc, dt, st = jax.lax.fori_loop(0, n, body, carry0)
    vo_ref[0] = v
    svo_ref[0] = sv
    fbo_ref[0] = fb
    hbo_ref[0] = hb
    hco_ref[0] = hc
    dto_ref[0] = dt
    sto_ref[0] = st


@functools.partial(jax.jit, static_argnums=(0, 5))
def _call(p, rm, ao, fstates, istates, interpret):
    """rm/ao: (G, N, SUB, LANES) time-major; fstates: 4x (G, SUB, LANES)
    f32; istates: 3x (G, SUB, LANES) i32.  Grid over channel-tile G."""
    g, n, sub, lanes = rm.shape
    tile_t = pl.BlockSpec((1, n, sub, lanes), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    tile_c = pl.BlockSpec((1, sub, lanes), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    f32, i32 = jnp.float32, jnp.int32
    return pl.pallas_call(
        functools.partial(_kernel, p, n),
        grid=(g,),
        in_specs=[tile_t, tile_t] + [tile_c] * 7,
        out_specs=[tile_t] + [tile_c] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((g, n, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
        ],
        interpret=interpret,
    )(rm, ao, *fstates, *istates)


def _auto_interpret() -> bool:
    import jax as _jax
    return _jax.default_backend() == "cpu"


def agc_scan_pallas(params, carry0, rm_t, ao_t, *, interpret=None):
    """Drop-in replacement for the AGC gain `lax.scan`.

    carry0: 7-tuple of (...,) channel-shaped state arrays (4 float32,
    then hang_counter/decay_type/state int32); rm_t/ao_t: (N, ...)
    time-major ring-max and |out| streams.  Returns
    (final_carry, volts_seq) with volts_seq (N, ...) like lax.scan.
    """
    if interpret is None:
        interpret = _auto_interpret()  # Mosaic on TPU, interpreter on CPU
    n = rm_t.shape[0]
    ch_shape = rm_t.shape[1:]
    c = 1
    for d in ch_shape:
        c *= d

    # pad channel count up to a whole number of (SUB, LANES) tiles
    g = max(1, -(-c // TILE_C))
    pad = g * TILE_C - c

    def to_tiles(a, time_major):
        if time_major:
            a = a.reshape(n, c)
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
            return a.reshape(n, g, _SUB, _LANES).transpose(1, 0, 2, 3)
        a = a.reshape(c)
        if pad:
            a = jnp.pad(a, ((0, pad),))
        return a.reshape(g, _SUB, _LANES)

    rm = to_tiles(rm_t, True)
    ao = to_tiles(ao_t, True)
    fstates = tuple(to_tiles(jnp.asarray(s, jnp.float32), False)
                    for s in carry0[:4])
    istates = tuple(to_tiles(jnp.asarray(s, jnp.int32), False)
                    for s in carry0[4:])

    outs = _call(params, rm, ao, fstates, istates, interpret)
    vseq = outs[0].transpose(1, 0, 2, 3).reshape(n, g * TILE_C)[:, :c]
    vseq = vseq.reshape((n,) + ch_shape)
    finals = tuple(o.reshape(g * TILE_C)[:c].reshape(ch_shape)
                   for o in outs[1:])
    return finals, vseq
