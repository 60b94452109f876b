"""Pallas TPU kernel: the Kim NR per-hop gain recursion.

The Kim & Ruwisch gain update (reference `Kim1_NR` `Noise.cpp:108-311`;
functional form `t41x.dsp.nr._kim_gain`) chains two sequential per-hop
updates per block, each rewriting the minimum-statistics rings —
X (C, 3, 128) and E (C, 15, 128).  In XLA the two chained
dynamic-update-slices materialize the full ring buffers per hop
(~36 MB/block at 1024 channels), measured at +84 us on the production
chain.  This kernel runs BOTH hops inside one program: the rings are
copied HBM->VMEM once, updated in place with predicated static-slot
stores, and written back once — the HBM traffic drops to one
read + one write of the state (~19 MB) and the ~45 VPU ops per hop
run register-resident.

The DFT halves of kim_nr (batched matmul rdft/irdft) stay in XLA — they
are already MXU-bound.  Math matches `_kim_gain` op for op; parity is
pinned by `tests/test_pallas_kernels.py` and the per-hop oracle
(`tests/test_nr_hop_parity.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HOP = 128
CH_T = 64       # channels per program instance


def _kernel(p, n_hops, sl_ref, p_ref, X_ref, E_ref, G_ref,
            go_ref, nX_ref, nE_ref, nGts_ref):
    f32 = jnp.float32
    nX_ref[:] = X_ref[:]
    nE_ref[:] = E_ref[:]
    gts = G_ref[:]                                   # (CH_T, HOP)
    bins = jax.lax.broadcasted_iota(jnp.int32, (CH_T, HOP), 1)
    in_band = (bins >= p.vad_low) & (bins < p.vad_high)
    beta = f32(p.beta)
    omb = f32(1.0 - 2.0 * p.beta)
    alpha = f32(p.alpha)

    for h in range(n_hops):
        power = p_ref[h]
        s3 = sl_ref[0, 2 * h]
        s15 = sl_ref[0, 2 * h + 1]
        # ring writes: predicated static-slot stores (the slot index is
        # a traced scalar; static slices keep Mosaic happy)
        for s in range(3):
            @pl.when(s3 == s)
            def _(s=s):
                nX_ref[:, s] = power
        E_new = (nX_ref[:, 0] + nX_ref[:, 1] + nX_ref[:, 2]) / f32(3.0)
        for s in range(15):
            @pl.when(s15 == s)
            def _(s=s):
                nE_ref[:, s] = E_new
        M = nE_ref[:, 0]
        for s in range(1, 15):
            M = jnp.minimum(M, nE_ref[:, s])

        T = power / jnp.maximum(M, f32(1e-30))
        lam = jnp.where(T > p.psi, M, E_new)
        G = jnp.maximum(1.0 - lam / jnp.maximum(E_new, f32(1e-30)), 0.0)
        G = jnp.where(in_band, G, 0.0)
        gts = alpha * gts + (f32(1.0) - alpha) * G
        # 3-bin frequency smoothing with edge replication
        left = jnp.concatenate([gts[:, :1], gts[:, :-1]], axis=1)
        right = jnp.concatenate([gts[:, 1:], gts[:, -1:]], axis=1)
        go_ref[h] = beta * left + omb * gts + beta * right
    nGts_ref[:] = gts


@functools.partial(jax.jit, static_argnums=(0, 6))
def _call(p, slots, powers, X, E, Gts, interpret):
    n_hops = powers.shape[0]
    g = powers.shape[1] // CH_T
    f32 = jnp.float32
    two_t = pl.BlockSpec((n_hops, CH_T, HOP), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    ring = lambda r: pl.BlockSpec((CH_T, r, HOP),  # noqa: E731
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    flat = pl.BlockSpec((CH_T, HOP), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sl = pl.BlockSpec((1, 2 * n_hops), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel, p, n_hops),
        grid=(g,),
        in_specs=[sl, two_t, ring(3), ring(15), flat],
        out_specs=[two_t, ring(3), ring(15), flat],
        out_shape=[
            jax.ShapeDtypeStruct((n_hops, g * CH_T, HOP), f32),
            jax.ShapeDtypeStruct((g * CH_T, 3, HOP), f32),
            jax.ShapeDtypeStruct((g * CH_T, 15, HOP), f32),
            jax.ShapeDtypeStruct((g * CH_T, HOP), f32),
        ],
        interpret=interpret,
    )(slots, powers, X, E, Gts)


def kim_gains_pallas(p, gst, powers, *, interpret=None):
    """ALL hops' Kim gain updates in one Pallas program.

    gst: (X (..., 3, HOP), E (..., 15, HOP), Gts (..., HOP),
    idx (...,) i32); powers: (n_hops, ..., HOP) — 2 hops for one
    256-sample block, 2B hops for a B-block batch (cross-block NR
    batching: the minimum-statistics rings ride VMEM across the WHOLE
    batch instead of round-tripping HBM per block).
    Returns ((nX, nE, nGts, idx+n_hops), gains (n_hops, ..., HOP)) —
    the HALF-spectrum smoothed gains; mirror outside like
    `_kim_gain`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, E, Gts, idx = gst
    ch = Gts.shape[:-1]
    c = 1
    for d in ch:
        c *= d
    g = max(1, -(-c // CH_T))
    pad = g * CH_T - c

    def tiles(a, lead=()):
        a = a.reshape(lead + (c,) + a.shape[len(ch) + len(lead):])
        if pad:
            width = [(0, 0)] * a.ndim
            width[len(lead)] = (0, pad)
            a = jnp.pad(a, width)
        return a

    n_hops = powers.shape[0]
    cursor = idx.reshape(-1)[0]
    slots = jnp.stack([f(cursor + j) for j in range(n_hops)
                       for f in (lambda v: jnp.mod(v, 3),
                                 lambda v: jnp.mod(v, 15))]
                      ).astype(jnp.int32)[None]

    go, nX, nE, nGts = _call(p, slots, tiles(powers, (n_hops,)),
                             tiles(X), tiles(E), tiles(Gts),
                             bool(interpret))
    unt = lambda a, lead=(): a[  # noqa: E731
        (slice(None),) * len(lead) + (slice(0, c),)].reshape(
        lead + ch + a.shape[1 + len(lead):])
    return ((unt(nX), unt(nE), unt(nGts), idx + n_hops),
            unt(go, (n_hops,)))
