"""Pallas TPU kernel: the entire RF front end fused (hot loop #0).

Covers the reference's per-block RF-rate pipeline (`Process.cpp:94-479`):
DC-block biquad, RF gain, IQ amplitude/phase correction, +Fs/4 shift,
NCO fine-tune mix, x4 then x2 FIR decimation — as ONE kernel whose only
HBM traffic is the 2048-sample RF block in and the 256-sample baseband
block out.  In the unfused XLA path these are ~7 materialized passes
over 16.8 MB (measured 465 us/block at 1024 channels, dominated by a
pathological conv lowering for the x4 decimator); fused, the traffic is
~19 MB total.

Structure per 128-channel tile (grid over channel tiles):

* DC biquad: the chunk-parallel state-space form of
  `t41x.dsp.iir.BiquadChunked` — 16 (128,128) MXU matmuls per I/Q
  stream instead of a 2048-step recurrence, in the reference's
  gain-then-DC-block order so the carried state is interchangeable
  with the unfused path's (`Process.cpp:117-175`).
* gain / IQ correction / fs4 / NCO: elementwise on (128, 2048)
  channel-major tiles.  fs4 keeps the EXACT j^n integer pattern (no
  trig error); the NCO angle is computed from an in-kernel iota and the
  carried per-channel phase, matching `t41x.dsp.nco.nco_mix`.
* decimation: one in-kernel transpose to time-major (2048, 128), then
  both FIR stages as static tap loops over stride-4 / stride-2 SUBLANE
  slices — Mosaic supports strided sublane slicing, and the x4/x2
  streams never leave VMEM.  Phase conventions match
  `t41x.dsp.fir.fir_decimate` (CMSIS newest-sample phase).

Parity: `tests/test_frontend_fused.py` checks the FULL chain fused vs
plain (multi-block state carry, non-tile channel counts, spectrum-tap
and no-tap paths, AM/SAM tails, fused<->plain state interchange); the
kernel auto-selects interpreter mode on CPU so CI exercises this graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t41x import constants as C
from t41x.dsp import iir

TILE_C = 128
_K = 128  # DC-biquad chunk length (one MXU tile)


class FusedFrontEnd:
    """Trace-time designed, shape-specialized fused front end."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, dc_b: np.ndarray,
                 dc_a: np.ndarray, sample_rate: float = C.SAMPLE_RATE,
                 nco_gain: float = 1.1, interpret=None):
        self.h1_rev = np.asarray(h1, np.float32)[::-1].copy()
        self.h2_rev = np.asarray(h2, np.float32)[::-1].copy()
        self.t1 = len(self.h1_rev)
        self.t2 = len(self.h2_rev)
        self.fs = float(sample_rate)
        self.nco_gain = float(nco_gain)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)
        # chunk-parallel biquad operator matrices (single stage)
        op = iir.BiquadChunked(dc_b, dc_a, chunk=_K)
        self.Rt = op.R[0].T.copy()    # (2, K)
        self.Lt = op.L[0].T.copy()    # (K, K)
        self.AKt = op.AK[0].T.copy()  # (2, 2)
        self.G = op.G[0].copy()       # (K, 2)
        self.b0 = float(op.b0[0])

    # ------------------------------------------------------------------
    def init_state(self, channels: tuple[int, ...]):
        """(dc_bq, nco_phase, dec1, dec2) exactly like the unfused chain
        state fields (host numpy; complex histories)."""
        return (np.zeros(channels + (2, 1, 2), np.float32),
                np.zeros(channels, np.float32),
                np.zeros(channels + (self.t1 - 1,), np.complex64),
                np.zeros(channels + (self.t2 - 1,), np.complex64))

    # ------------------------------------------------------------------
    def _kernel(self, n, Rt_ref, Lt_ref, G_ref, pp_ref, dcs_ref,
                h1r_ref, h1i_ref, h2r_ref, h2i_ref, xr_ref, xi_ref,
                yr_ref, yi_ref, ndcs_ref, nph_ref, nh1r_ref, nh1i_ref,
                nh2r_ref, nh2i_ref, xc1_ref, xc2_ref, xr2_ref, xi2_ref,
                *q15_scratch):
        f32 = jnp.float32
        if q15_scratch:
            # q15 ingest: one whole-tile int16 -> f32 relayout up front
            # (per-chunk converts of strided lane slices are slower)
            xf_r, xf_i = q15_scratch
            xf_r[:] = xr_ref[0].astype(f32)
            xf_i[:] = xi_ref[0].astype(f32)
            ld_r = lambda sl: xf_r[:, sl]      # noqa: E731
            ld_i = lambda sl: xf_i[:, sl]      # noqa: E731
        else:
            ld_r = lambda sl: xr_ref[0, :, sl]  # noqa: E731
            ld_i = lambda sl: xi_ref[0, :, sl]  # noqa: E731
        t1, t2 = self.t1, self.t2
        n1 = n // C.DF1            # 512
        n2 = n1 // C.DF2           # 256

        g = pp_ref[0, :, 0:1]          # (TILE_C, 1) linear RF gain
        amp = pp_ref[0, :, 1:2]
        ph = pp_ref[0, :, 2:3]
        w = pp_ref[0, :, 3:4]          # NCO rad/sample
        ph0 = pp_ref[0, :, 4:5]        # carried NCO phase

        Rt = Rt_ref[:]
        Lt = Lt_ref[:]
        G = G_ref[:]
        AKt = self.AKt  # 2x2 numpy: embedded as scalar constants

        # --- one fused chunk loop: DC biquad + IQ correction + fs4/NCO.
        # The NCO phasor is the kernel's transcendental wall if computed
        # per sample (2 * TILE_C * n cos/sin per tile measured at ~68 us
        # of a 195 us kernel); instead evaluate cos/sin for ONE chunk of
        # _K samples and advance chunks by the angle-addition rotation
        # theta -> theta + w*_K (4 mul + 2 add per element), which is
        # exact up to ~16 fp32 roundings over the block.
        pos = ph >= 0.0
        nq = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, _K), 1)
        m4 = jnp.remainder(nq, 4)  # _K % 4 == 0: same pattern per chunk
        fr = jnp.where(m4 == 0, 1.0, jnp.where(m4 == 2, -1.0, 0.0))
        fi = jnp.where(m4 == 1, 1.0, jnp.where(m4 == 3, -1.0, 0.0))
        theta0 = ph0 + w * (nq.astype(f32) + 1.0)
        cs = jnp.cos(theta0)
        sn = jnp.sin(theta0)
        cd = jnp.cos(w * f32(_K))      # (TILE_C, 1) per-chunk rotation
        sd = jnp.sin(w * f32(_K))

        def chunk_body(k, carry):
            sI1, sI2, sQ1, sQ2, cs, sn = carry
            sl = pl.ds(k * _K, _K)
            # DC biquad chunk (reference order Process.cpp:117-175:
            # gain, DC block, IQ corr).  The K x K particular-solution
            # matmul rides the MXU; the rank-2 state terms are cheap
            # broadcasts (a (TILE_C,2)@(2,K) dot is a degenerate matmul
            # Mosaic handles poorly).
            # (for q15 ingest the 1/32768 scale is folded into g)
            xc = ld_r(sl) * g
            i_p = (self.b0 * xc + sI1 * Rt[0:1, :] + sI2 * Rt[1:2, :]
                   + jnp.dot(xc, Lt, preferred_element_type=f32))
            xg = jnp.dot(xc, G, preferred_element_type=f32)
            sI1, sI2 = (sI1 * AKt[0, 0] + sI2 * AKt[1, 0] + xg[:, 0:1],
                        sI1 * AKt[0, 1] + sI2 * AKt[1, 1] + xg[:, 1:2])
            xc = ld_i(sl) * g
            q_p = (self.b0 * xc + sQ1 * Rt[0:1, :] + sQ2 * Rt[1:2, :]
                   + jnp.dot(xc, Lt, preferred_element_type=f32))
            xg = jnp.dot(xc, G, preferred_element_type=f32)
            sQ1, sQ2 = (sQ1 * AKt[0, 0] + sQ2 * AKt[1, 0] + xg[:, 0:1],
                        sQ1 * AKt[0, 1] + sQ2 * AKt[1, 1] + xg[:, 1:2])

            # IQ amplitude/phase correction (Utility.cpp:178-187)
            i_c = jnp.where(pos, i_p * amp + ph * q_p, i_p * amp)
            q_c = jnp.where(pos, q_p, q_p + ph * i_c)

            # fs4 (exact j^n) x NCO phasor e^{-i theta} for this chunk
            tr = self.nco_gain * (fr * cs + fi * sn)
            ti = self.nco_gain * (fi * cs - fr * sn)
            xr2_ref[:, sl] = i_c * tr - q_c * ti
            xi2_ref[:, sl] = i_c * ti + q_c * tr
            return (sI1, sI2, sQ1, sQ2,
                    cs * cd - sn * sd, sn * cd + cs * sd)

        # partial unroll: UNROLL chunks per fori step — full static
        # unroll lets Mosaic pipeline best (146 us vs 177 us rolled at
        # 1024 ch) but costs ~10 min of Mosaic scheduling; 4x unroll
        # keeps most of the win at a sane compile time
        UNROLL = 4
        carry = (dcs_ref[0, :, 0:1], dcs_ref[0, :, 1:2],
                 dcs_ref[0, :, 2:3], dcs_ref[0, :, 3:4], cs, sn)

        def outer_body(j, carry):
            for u in range(UNROLL):
                carry = chunk_body(j * UNROLL + u, carry)
            return carry

        carry = jax.lax.fori_loop(0, n // _K // UNROLL, outer_body, carry)
        sI1, sI2, sQ1, sQ2, _, _ = carry

        xr2 = xr2_ref[:]
        xi2 = xi2_ref[:]
        ndcs_ref[0] = jnp.concatenate([sI1, sI2, sQ1, sQ2], axis=1)
        nph_ref[0] = jnp.remainder(ph0 + w * f32(n), f32(2.0 * np.pi))

        # time-major for the decimators
        xr_t = xr2.T                       # (n, TILE_C)
        xi_t = xi2.T

        def decimate(x_t, hist_ref, nhist_ref, xc_ref, h_rev, taps, m,
                     n_out):
            # strided slicing must read from a REF (on values it lowers
            # to an unsupported gather) — stage [history | block] into a
            # VMEM scratch buffer, then accumulate strided sublane reads
            xc_ref[0: taps - 1] = hist_ref[0]
            xc_ref[taps - 1:] = x_t
            nhist_ref[0] = xc_ref[m * n_out:]
            y = h_rev[0] * xc_ref[m - 1: m * n_out: m]
            for k in range(1, taps):
                s = m - 1 + k
                y = y + h_rev[k] * xc_ref[s: s + m * (n_out - 1) + 1: m]
            return y

        mr = decimate(xr_t, h1r_ref, nh1r_ref, xc1_ref, self.h1_rev,
                      t1, C.DF1, n1)
        mi = decimate(xi_t, h1i_ref, nh1i_ref, xc1_ref, self.h1_rev,
                      t1, C.DF1, n1)
        yr_t = decimate(mr, h2r_ref, nh2r_ref, xc2_ref, self.h2_rev,
                        t2, C.DF2, n2)
        yi_t = decimate(mi, h2i_ref, nh2i_ref, xc2_ref, self.h2_rev,
                        t2, C.DF2, n2)

        yr_ref[0] = yr_t.T                 # back to (TILE_C, n2)
        yi_ref[0] = yi_t.T

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _call(self, pp, dcs, h1r, h1i, h2r, h2i, xr, xi):
        gdim, _, n = xr.shape
        n2 = n // C.DF
        f32 = jnp.float32
        ch_t = lambda d: pl.BlockSpec(  # noqa: E731
            (1, TILE_C, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        tm_t = lambda r: pl.BlockSpec(  # noqa: E731
            (1, r, TILE_C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        full = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(self._kernel, n),
            grid=(gdim,),
            in_specs=[full(2, _K), full(_K, _K), full(_K, 2),
                      ch_t(8), ch_t(4), tm_t(self.t1 - 1), tm_t(self.t1 - 1),
                      tm_t(self.t2 - 1), tm_t(self.t2 - 1),
                      ch_t(n), ch_t(n)],
            out_specs=[ch_t(n2), ch_t(n2), ch_t(4), ch_t(1),
                       tm_t(self.t1 - 1), tm_t(self.t1 - 1),
                       tm_t(self.t2 - 1), tm_t(self.t2 - 1)],
            out_shape=[
                jax.ShapeDtypeStruct((gdim, TILE_C, n2), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, n2), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, 4), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, 1), f32),
                jax.ShapeDtypeStruct((gdim, self.t1 - 1, TILE_C), f32),
                jax.ShapeDtypeStruct((gdim, self.t1 - 1, TILE_C), f32),
                jax.ShapeDtypeStruct((gdim, self.t2 - 1, TILE_C), f32),
                jax.ShapeDtypeStruct((gdim, self.t2 - 1, TILE_C), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((self.t1 - 1 + n, TILE_C), f32),
                pltpu.VMEM((self.t2 - 1 + n // C.DF1, TILE_C), f32),
                pltpu.VMEM((TILE_C, n), f32),
                pltpu.VMEM((TILE_C, n), f32),
            ] + ([pltpu.VMEM((TILE_C, n), f32)] * 2
                 if xr.dtype == jnp.int16 else []),
            interpret=self.interpret,
        )(jnp.asarray(self.Rt), jnp.asarray(self.Lt), jnp.asarray(self.G),
          pp, dcs, h1r, h1i, h2r, h2i, xr, xi)

    # ------------------------------------------------------------------
    def block(self, params, state, iq: jnp.ndarray):
        """params: ChannelParams-compatible (nco_freq, rf_gain_db,
        band_gain, iq_amp, iq_phase as (...,) arrays); state: the
        4-tuple from init_state; iq: (..., N) complex64, or an
        (i, q) pair of int16 q15 arrays (ADC format) — the kernel
        converts on load with the 1/32768 scale folded into the gain.
        Returns (new_state, x) with x (..., N/8) complex64 at 24 kHz.
        """
        dc_bq, nco_phase, dec1, dec2 = state
        q15 = isinstance(iq, (tuple, list))
        xr_in, xi_in = (iq[0], iq[1]) if q15 else (iq.real, iq.imag)
        lead = xr_in.shape[:-1]
        n = xr_in.shape[-1]
        c = int(np.prod(lead)) if lead else 1
        gdim = max(1, -(-c // TILE_C))
        pad = gdim * TILE_C - c

        def chan_major(a, d):
            a = a.reshape(c, d)
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0)))
            return a.reshape(gdim, TILE_C, d)

        def time_major(a):  # (c, T) -> (gdim, T, TILE_C)
            t = a.shape[-1]
            return jnp.swapaxes(chan_major(a, t), -1, -2)

        g = (10.0 ** (params.rf_gain_db / 20.0) * params.band_gain
             ).astype(jnp.float32).reshape(-1)
        if q15:
            g = g * jnp.float32(1.0 / 32768.0)
        w = (2.0 * np.pi * jnp.asarray(params.nco_freq, jnp.float32)
             / self.fs).reshape(-1)
        pp = jnp.stack(
            [g, params.iq_amp.reshape(-1), params.iq_phase.reshape(-1),
             w, nco_phase.reshape(-1),
             jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros_like(g)],
            axis=-1)                                  # (c, 8)
        pp = chan_major(pp, 8)
        dcs = chan_major(dc_bq.reshape(-1, 4), 4)     # [s1I s2I s1Q s2Q]

        outs = self._call(
            pp, dcs,
            time_major(dec1.real), time_major(dec1.imag),
            time_major(dec2.real), time_major(dec2.imag),
            chan_major(xr_in, n), chan_major(xi_in, n))
        yr, yi, ndcs, nph, nh1r, nh1i, nh2r, nh2i = outs

        def from_chan(a):
            return a.reshape(gdim * TILE_C, a.shape[-1])[:c]

        def from_time(a):
            return jnp.swapaxes(a, -1, -2).reshape(
                gdim * TILE_C, a.shape[-2])[:c]

        n2 = n // C.DF
        x = (from_chan(yr) + 1j * from_chan(yi)).astype(jnp.complex64)
        new_state = (
            from_chan(ndcs).reshape(lead + (2, 1, 2)),
            from_chan(nph).reshape(lead),
            (from_time(nh1r) + 1j * from_time(nh1i)
             ).astype(jnp.complex64).reshape(lead + (self.t1 - 1,)),
            (from_time(nh2r) + 1j * from_time(nh2i)
             ).astype(jnp.complex64).reshape(lead + (self.t2 - 1,)),
        )
        return new_state, x.reshape(lead + (n2,))
