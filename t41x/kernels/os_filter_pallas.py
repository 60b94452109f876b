"""Pallas TPU kernel: fused overlap-save filter (hot loop #2).

The RX chain's core filter — FFT -> complex mask -> iFFT -> keep half
(reference `Process.cpp:535-595`) — collapses into one dense complex
operator `out = [state | x] @ W.T` (see t41x.dsp.osfilter).  This kernel
fuses the whole block into one VMEM-resident pass per channel tile:

  * the [history | new] concatenation (no HBM round trip for the
    concatenated buffer),
  * the complex matmul as 4 real MXU matmuls with fp32 accumulation,
  * the state update (history = new samples) via a second output.

Layout: channels tile to (TILE_C, F) blocks; the operator (F x F/2 per
re/im part) stays resident in VMEM across the channel grid.  For
F = 512 the operator is 2 x 512 x 256 x 4 B = 1 MB — comfortably under
the VMEM budget, so the kernel is pure MXU streaming at
8 * C * (F/2) * F flops per block.

Falls back to the jnp implementation on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_C = 256


def _kernel(sr_ref, si_ref, xr_ref, xi_ref, wr_ref, wi_ref,
            yr_ref, yi_ref, nsr_ref, nsi_ref):
    import jax.numpy as jnp

    # xw = [state | x]  (TILE_C, F)
    xwr = jnp.concatenate([sr_ref[:], xr_ref[:]], axis=1)
    xwi = jnp.concatenate([si_ref[:], xi_ref[:]], axis=1)
    wr = wr_ref[:]
    wi = wi_ref[:]
    # y = xw @ (wr + j wi):  4 real MXU matmuls.  Precision pinned
    # explicitly (decoupled from jax_default_matmul_precision, whose
    # HIGH value Mosaic rejects); Mosaic's DEFAULT f32 dot lowering is
    # ~3-pass accurate on the v5e — see the measured table at
    # frontend_pallas.DOT_PRECISION, and tools/chipcheck.py for this
    # kernel's own on-chip parity row.
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    yr_ref[:] = dot(xwr, wr) - dot(xwi, wi)
    yi_ref[:] = dot(xwr, wi) + dot(xwi, wr)
    # state update: this block's new samples
    nsr_ref[:] = xr_ref[:]
    nsi_ref[:] = xi_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(sr, si, xr, xi, wr, wi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ch, half = xr.shape
    grid = (max(n_ch // TILE_C, 1),)
    tile = min(TILE_C, n_ch)

    def cspec():
        return pl.BlockSpec((tile, half), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((2 * half, half), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((n_ch, half), jnp.float32)] * 4
    yr, yi, nsr, nsi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec(), cspec(), cspec(), cspec(), wspec, wspec],
        out_specs=[cspec(), cspec(), cspec(), cspec()],
        out_shape=out_shape,
        interpret=interpret,
    )(sr, si, xr, xi, wr, wi)
    return yr, yi, nsr, nsi


def os_filter_matmul_pallas(state: jnp.ndarray, x: jnp.ndarray,
                            W: jnp.ndarray, interpret: bool | None = None):
    """Drop-in for t41x.dsp.osfilter.os_filter_matmul on TPU.

    state, x: (C, F/2) complex64;  W: (F/2, F) complex64 from
    os_matmul_operator.  Returns (new_state, y).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.ndim == 1:
        st, y = os_filter_matmul_pallas(state[None], x[None], W, interpret)
        return st[0], y[0]
    # W.T arranged (F, F/2) real/imag
    wt = jnp.transpose(W)
    yr, yi, nsr, nsi = _call(
        jnp.real(state).astype(jnp.float32),
        jnp.imag(state).astype(jnp.float32),
        jnp.real(x).astype(jnp.float32),
        jnp.imag(x).astype(jnp.float32),
        jnp.real(wt).astype(jnp.float32),
        jnp.imag(wt).astype(jnp.float32),
        interpret=interpret,
    )
    return (nsr + 1j * nsi).astype(jnp.complex64), \
        (yr + 1j * yi).astype(jnp.complex64)
