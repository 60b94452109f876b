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


def _block_kernel(p, n, b, xr_ref, xi_ref, rr_ref, ri_ref, ar_ref,
                  v_ref, sv_ref, fb_ref, hb_ref, hc_ref, dt_ref, st_ref,
                  yr_ref, yi_ref, vo_ref, svo_ref, fbo_ref, hbo_ref,
                  hco_ref, dto_ref, sto_ref, buf_ref, ao_ref, rm_ref):
    """Whole AGC block in one program: |x|, look-ahead delay, sliding-
    window peak (in-place doubling table + two-window overlap combine),
    the gain recurrence, the log-domain gain curve, and the delayed
    multiply.  HBM traffic is x in / y out / the carried rings+state —
    the XLA prework passes (concat, chunked cummax, 2 transposes of the
    scan operands, gain curve) all become VMEM ops."""
    from t41x.dsp.agc import agc_step

    f32 = jnp.float32
    L = b + n

    # abs_full = [ |ring| , |x| ] along time
    buf_ref[0:b] = ar_ref[0]
    buf_ref[b:L] = jnp.sqrt(xr_ref[0] * xr_ref[0] + xi_ref[0] * xi_ref[0])
    # abs_out = abs_full[:n] — copy before the in-place passes clobber it
    ao_ref[0:n] = buf_ref[0:n]

    # doubling table in place: after the pass with shift s,
    # buf[i] = max(a[i .. min(i+2s-1, L-1)])
    s = 1
    while s * 2 <= b:
        v = jnp.maximum(buf_ref[0:L - s], buf_ref[s:L])
        buf_ref[0:L - s] = v
        s *= 2
    # window of width b as two overlapping width-s windows
    off = b - s
    rm_ref[0:n] = jnp.maximum(buf_ref[1:n + 1],
                              buf_ref[1 + off:n + 1 + off])

    carry0 = (v_ref[0], sv_ref[0], fb_ref[0], hb_ref[0],
              hc_ref[0], dt_ref[0], st_ref[0])

    def body(t, carry):
        new = agc_step(p, carry, rm_ref[t], ao_ref[t])
        volts = new[0]
        # log-domain gain curve (DSP_Fn.cpp:623-627), written back over
        # the ring-max slot this step just consumed
        mult = (p.out_target - p.slope_constant * jnp.minimum(
            f32(0.0), jnp.log10(p.inv_max_input * volts))) / volts
        rm_ref[t] = mult
        return new

    v, sv, fb, hb, hc, dt, st = jax.lax.fori_loop(0, n, body, carry0)
    vo_ref[0] = v
    svo_ref[0] = sv
    fbo_ref[0] = fb
    hbo_ref[0] = hb
    hco_ref[0] = hc
    dto_ref[0] = dt
    sto_ref[0] = st

    # delayed output: y[t] = full[t] * mult[t]; full[t] is the carried
    # ring for t < b and x[t - b] after
    yr_ref[0, 0:b] = rr_ref[0] * rm_ref[0:b]
    yi_ref[0, 0:b] = ri_ref[0] * rm_ref[0:b]
    yr_ref[0, b:n] = xr_ref[0, 0:n - b] * rm_ref[b:n]
    yi_ref[0, b:n] = xi_ref[0, 0:n - b] * rm_ref[b:n]


@functools.partial(jax.jit, static_argnums=(0, 4))
def _block_call(p, xs, rings, states, interpret):
    """xs: 2x (G, N, SUB, LANES) f32; rings: 3x (G, B, SUB, LANES) f32;
    states: 4x f32 + 3x i32 (G, SUB, LANES)."""
    g, n, sub, lanes = xs[0].shape
    b = rings[0].shape[1]
    f32, i32 = jnp.float32, jnp.int32
    tm = lambda r: pl.BlockSpec((1, r, sub, lanes),  # noqa: E731
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    tile_c = pl.BlockSpec((1, sub, lanes), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, p, n, b),
        grid=(g,),
        in_specs=[tm(n)] * 2 + [tm(b)] * 3 + [tile_c] * 7,
        out_specs=[tm(n)] * 2 + [tile_c] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((g, n, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, n, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), f32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
            jax.ShapeDtypeStruct((g, sub, lanes), i32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b + n, sub, lanes), f32),
            pltpu.VMEM((n, sub, lanes), f32),
            pltpu.VMEM((n, sub, lanes), f32),
        ],
        interpret=interpret,
    )(*xs, *rings, *states)


def agc_block_pallas(p, st, x, *, interpret=None):
    """Whole-block AGC: drop-in for the prework+scan+gain of
    `t41x.dsp.agc.agc_apply` when the block is at least one delay line
    long (N >= attack_buffsize).  st: AGCState; x: (..., N) complex64.
    Returns (new AGCState, y)."""
    if interpret is None:
        interpret = _auto_interpret()
    n = x.shape[-1]
    b = p.attack_buffsize
    if n < b:
        # the delayed-output slices and `x[..., n-b:]` ring rebuild below
        # assume at least one full delay line of new samples; agc_apply
        # routes shorter blocks to the scan path instead
        raise ValueError(
            f"agc_block_pallas needs N >= attack_buffsize ({n} < {b}); "
            "use agc_apply / agc_scan_pallas for short blocks")
    ch_shape = x.shape[:-1]
    c = 1
    for d in ch_shape:
        c *= d
    g = max(1, -(-c // TILE_C))
    pad = g * TILE_C - c

    def tiles_t(a, t):  # (..., T) -> (G, T, SUB, LANES) time-major
        a = a.reshape(c, t)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.reshape(g, _SUB, _LANES, t).transpose(0, 3, 1, 2)

    def tiles_c(a, dt):  # (...,) -> (G, SUB, LANES)
        a = jnp.asarray(a, dt).reshape(c)
        if pad:
            a = jnp.pad(a, ((0, pad),))
        return a.reshape(g, _SUB, _LANES)

    xs = (tiles_t(x.real.astype(jnp.float32), n),
          tiles_t(x.imag.astype(jnp.float32), n))
    rings = (tiles_t(st.ring.real.astype(jnp.float32), b),
             tiles_t(st.ring.imag.astype(jnp.float32), b),
             tiles_t(st.abs_ring, b))
    states = tuple(tiles_c(s, jnp.float32)
                   for s in (st.volts, st.save_volts, st.fast_backaverage,
                             st.hang_backaverage))
    states += tuple(tiles_c(s, jnp.int32)
                    for s in (st.hang_counter, st.decay_type, st.state))

    outs = _block_call(p, xs, rings, states, interpret)

    def from_t(a):  # (G, T, SUB, LANES) -> (..., T)
        t = a.shape[1]
        return a.transpose(0, 2, 3, 1).reshape(g * TILE_C, t)[:c].reshape(
            ch_shape + (t,))

    def from_c(a):
        return a.reshape(g * TILE_C)[:c].reshape(ch_shape)

    y = (from_t(outs[0]) + 1j * from_t(outs[1])).astype(jnp.complex64)
    new_ring = x[..., n - b:]
    from t41x.dsp.agc import AGCState
    new_state = AGCState(
        ring=new_ring, abs_ring=jnp.abs(new_ring),
        volts=from_c(outs[2]), save_volts=from_c(outs[3]),
        fast_backaverage=from_c(outs[4]), hang_backaverage=from_c(outs[5]),
        hang_counter=from_c(outs[6]), decay_type=from_c(outs[7]),
        state=from_c(outs[8]))
    return new_state, y


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
