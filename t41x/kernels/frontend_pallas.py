"""Pallas TPU kernel: the entire RF front end fused (hot loop #0).

Covers the reference's per-block RF-rate pipeline (`Process.cpp:94-479`):
DC-block biquad, RF gain, IQ amplitude/phase correction, +Fs/4 shift,
NCO fine-tune mix, x4 then x2 FIR decimation — as ONE kernel whose only
HBM traffic is the 2048-sample RF block in and the 256-sample baseband
block out.  In the unfused XLA path these are ~7 materialized passes
over 16.8 MB (measured 465 us/block at 1024 channels, dominated by a
pathological conv lowering for the x4 decimator); fused, the traffic is
~19 MB total.

The RF display taps live in the SAME kernel (the reference computes the
panadapter spectrum inside its hot loop, `Process.cpp:185-215`):

* zoom x1 (`CalcZoom1Magn` `FFT.cpp:208-251`): the kernel emits the
  first 512 IQ-corrected samples (pre-Fs/4) as a side output; the
  Hann/FFT/EMA tail runs outside on that small segment.
* zoom 2^z (`ZoomFFTExe` `FFT.cpp:67-196`): the ENTIRE RF-rate zoom tap
  — 8th-order elliptic anti-alias IIR (`firdesign.zoom_antialias_iir`,
  reference `mag_coeffs` `FIR.cpp:582-885`), 4-tap FIR, decimate by
  2^z — is one LTI system, so it is composed at trace time into a
  single 11-state chunk operator with the decimation folded in as
  static output-row selection: per chunk, TWO matmuls on [x | state]
  ((TILE_C, K+11) @ (K+11, K/2^z) and @ (K+11, 11)) produce the
  decimated display samples and the next state directly, channel-major
  — no extra scratch, no transposes, no strided reads, no rank-N
  scalar update chains.  Only the decimated samples (N/2^z) leave the
  kernel; the ring/Hann/FFT/EMA tail runs outside
  (`ZoomFFT.spectrum_from_decimated`).

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
and no-tap paths, AM/SAM tails, fused<->plain state interchange, and
the zoom display taps); the kernel auto-selects interpreter mode on CPU
so CI exercises this graph.
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
_ZRES = 512  # zoom-1 display segment length (SPECTRUM_RES)

# In-kernel matmul precision, pinned EXPLICITLY so the kernels are
# independent of the global jax_default_matmul_precision (Mosaic also
# rejects HIGH outright).  Measured on the v5e (r5 sweep, full-chain
# audio parity vs the fp64-free CPU chain at 1024 ch):
#
#   kernel dots      XLA global   parity    us/block
#   HIGHEST          highest      125.6 dB    430
#   HIGHEST          high          93.4 dB    357
#   DEFAULT          high          92.3 dB    309   <- production
#   HIGHEST          default       48.9 dB    307
#
# i.e. Mosaic's DEFAULT lowering of an f32 dot is already ~3-pass
# accurate (~1 dB below HIGHEST under the XLA-high tail) while XLA's
# default is single-pass bf16 and unusable for audio; HIGHEST in-kernel
# costs +48 us/block for that last 1 dB.  `bench.py --check` guards
# this choice on every benched chip.
DOT_PRECISION = jax.lax.Precision.DEFAULT

# The zoom-tap chunk operator is an 11-state composition of the
# high-zoom elliptic cascade — poles within ~1e-3 of the unit circle at
# zoom x32 — whose state recursion amplifies dot rounding over the
# block; chipcheck measured 6.4 dB of displayed-spectrum error at
# DEFAULT on the real chip (vs 0.0 in the interpreter).  Its four dots
# pin HIGHEST; they are (TILE_C, K+11)-shaped — a small fraction of the
# kernel's matmul volume.
ZOOM_DOT_PRECISION = jax.lax.Precision.HIGHEST


def _dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=DOT_PRECISION)


def _zdot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=ZOOM_DOT_PRECISION)


def _compose_cascade_ops(b: np.ndarray, a: np.ndarray, K: int):
    """Compose an S-stage df2T biquad cascade into ONE 2S-state linear
    system and precompute its K-sample chunk operators (float64):

        y_chunk  = x @ L.T + s @ R.T        L: (K,K)  R: (K,2S)
        s_next   = s @ AK.T + x @ G         G: (K,2S) AK: (2S,2S)

    The composite state vector is the CONCATENATION of the per-stage
    normal-form states (iir.stage_normal_form), so it is
    interchangeable with `iir.BiquadChunked` state laid out
    (..., S, 2).reshape(..., 2S)."""
    b = np.atleast_2d(np.asarray(b, np.float64))
    a = np.atleast_2d(np.asarray(a, np.float64))
    S = b.shape[0]
    A_c = np.zeros((0, 0))
    B_c = np.zeros((0,))
    C_c = np.zeros((0,))
    D_c = 1.0
    for s in range(S):
        # balanced normal-form stages (iir.stage_normal_form): the df2T
        # companion form's chunk powers are catastrophically
        # ill-conditioned for near-unity poles — see BiquadChunked
        As, Bs, Cs, Ds = iir.stage_normal_form(b[s], a[s])
        m = A_c.shape[0]
        A_new = np.zeros((m + 2, m + 2))
        A_new[:m, :m] = A_c
        A_new[m:, :m] = np.outer(Bs, C_c)
        A_new[m:, m:] = As
        A_c = A_new
        B_c = np.concatenate([B_c, Bs * D_c])
        C_c = np.concatenate([Ds * C_c, Cs])
        D_c = Ds * D_c
    S2 = 2 * S
    P = np.empty((K + 1, S2, S2))
    P[0] = np.eye(S2)
    for m in range(K):
        P[m + 1] = A_c @ P[m]
    h = np.empty(K)
    h[0] = D_c
    for n in range(1, K):
        h[n] = C_c @ P[n - 1] @ B_c
    L = np.zeros((K, K))
    for n in range(K):
        L[n, : n + 1] = h[: n + 1][::-1]
    R = np.einsum("d,ndk->nk", C_c, P[:K])           # (K, S2)
    G = np.stack([P[K - 1 - j] @ B_c for j in range(K)])  # (K, S2)
    return L, R, G, P[K]


def _compose_systems(sys1, sys2):
    """Cascade two state-space systems (input -> sys1 -> sys2)."""
    A1, B1, C1, D1 = sys1
    A2, B2, C2, D2 = sys2
    m, n = A1.shape[0], A2.shape[0]
    A = np.zeros((m + n, m + n))
    A[:m, :m] = A1
    A[m:, :m] = np.outer(B2, C1)
    A[m:, m:] = A2
    B = np.concatenate([B1, B2 * D1])
    Cv = np.concatenate([D2 * C1, C2])
    return A, B, Cv, D2 * D1


def _zoom_chunk_ops(b: np.ndarray, a: np.ndarray, h: np.ndarray,
                    m: int, K: int):
    """Compose the WHOLE zoom tap — S-stage biquad cascade, t-tap FIR,
    decimate-by-m — into one K-sample chunk operator pair with the
    decimation folded in as static output-row selection (float64):

        y_dec  = [x | s] @ Wy        Wy: (K+S, K/m)
        s_next = [x | s] @ Ws        Ws: (K+S, S)

    with S = 2*stages + t - 1 composite states ordered
    [stage0 s1,s2, ..., u[n-1], u[n-2], u[n-3]] — the IIR part is
    interchangeable with per-stage `iir.BiquadChunked` (normal-form)
    states, the FIR part with `fir.fir_state` history REVERSED (newest
    first).  Output rows are the in-chunk sample indices m-1, 2m-1, ...
    (fir_decimate's newest-sample phase)."""
    b = np.atleast_2d(np.asarray(b, np.float64))
    a = np.atleast_2d(np.asarray(a, np.float64))
    h = np.asarray(h, np.float64)
    t = len(h)
    # IIR cascade composite
    A_c = np.zeros((0, 0))
    B_c = np.zeros((0,))
    C_c = np.zeros((0,))
    D_c = 1.0
    for s in range(b.shape[0]):
        # balanced normal-form stages (see _compose_cascade_ops)
        stage = iir.stage_normal_form(b[s], a[s])
        A_c, B_c, C_c, D_c = _compose_systems((A_c, B_c, C_c, D_c), stage)
    # FIR as a shift register: states (u[n-1], ..., u[n-t+1])
    nf = t - 1
    Af = np.zeros((nf, nf))
    Af[1:, :-1] = np.eye(nf - 1)
    Bf = np.zeros(nf)
    Bf[0] = 1.0
    A_c, B_c, C_c, D_c = _compose_systems((A_c, B_c, C_c, D_c),
                                          (Af, Bf, h[1:], h[0]))
    S = A_c.shape[0]
    P = np.empty((K + 1, S, S))
    P[0] = np.eye(S)
    for n in range(K):
        P[n + 1] = A_c @ P[n]
    h_imp = np.empty(K)
    h_imp[0] = D_c
    for n in range(1, K):
        h_imp[n] = C_c @ P[n - 1] @ B_c
    sel = np.arange(m - 1, K, m)                      # output sample rows
    L_sel = np.zeros((len(sel), K))
    for ji, n in enumerate(sel):
        L_sel[ji, : n + 1] = h_imp[: n + 1][::-1]
    R_sel = np.stack([C_c @ P[n] for n in sel])       # (K/m, S)
    G = np.stack([P[K - 1 - j] @ B_c for j in range(K)])  # (K, S)
    Wy = np.concatenate([L_sel.T, R_sel.T])           # (K+S, K/m)
    Ws = np.concatenate([G, P[K].T])                  # (K+S, S)
    return Wy, Ws, S

class FusedFrontEnd:
    """Trace-time designed, shape-specialized fused front end.

    zoom: None (no display tap), 0 (zoom x1 segment tap), or 1..7
    (in-kernel zoom IIR + decimate-by-2^zoom tap; pass zoom_sos —
    (S,3),(S,3) biquad cascade — and zoom_h, the short FIR decimator
    taps, both from `t41x.dsp.spectrum.ZoomFFT`)."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, dc_b: np.ndarray,
                 dc_a: np.ndarray, sample_rate: float = C.SAMPLE_RATE,
                 nco_gain: float = 1.1, interpret=None, zoom: int | None = None,
                 zoom_sos=None, zoom_h: np.ndarray | None = None):
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

        self.zoom = zoom
        if zoom is not None and zoom >= 1:
            zb, za = zoom_sos
            self.z_stages = np.atleast_2d(zb).shape[0]
            self.zt = len(np.asarray(zoom_h))
            self.zfactor = 1 << zoom
            assert _K % self.zfactor == 0, zoom
            Wy, Ws, S = _zoom_chunk_ops(zb, za, np.asarray(zoom_h),
                                        self.zfactor, _K)
            self.z_states = S                      # 2*stages + taps - 1
            self.Wy = Wy.astype(np.float32).copy()  # (K+S, K/m)
            self.Ws = Ws.astype(np.float32).copy()  # (K+S, S)

    # ------------------------------------------------------------------
    def init_state(self, channels: tuple[int, ...]):
        """(dc_bq, nco_phase, dec1, dec2) exactly like the unfused chain
        state fields (host numpy; complex histories)."""
        return (np.zeros(channels + (2, 1, 2), np.float32),
                np.zeros(channels, np.float32),
                np.zeros(channels + (self.t1 - 1,), np.complex64),
                np.zeros(channels + (self.t2 - 1,), np.complex64))

    # ------------------------------------------------------------------
    def _kernel(self, n, q15, *refs):
        f32 = jnp.float32
        z = self.zoom
        it = iter(refs)

        # ---- inputs (order must match _call) -----------------------------
        Rt_ref = next(it)
        Lt_ref = next(it)
        G_ref = next(it)
        pp_ref = next(it)
        dcs_ref = next(it)
        h1r_ref = next(it)
        h1i_ref = next(it)
        h2r_ref = next(it)
        h2i_ref = next(it)
        xr_ref = next(it)
        xi_ref = next(it)
        if z is not None and z >= 1:
            Wy_ref = next(it)
            Ws_ref = next(it)
            zs_ref = next(it)     # (1, TILE_C, 2S) composed states I|Q

        # ---- outputs -----------------------------------------------------
        yr_ref = next(it)
        yi_ref = next(it)
        ndcs_ref = next(it)
        nph_ref = next(it)
        nh1r_ref = next(it)
        nh1i_ref = next(it)
        nh2r_ref = next(it)
        nh2i_ref = next(it)
        if z == 0:
            z1r_ref = next(it)
            z1i_ref = next(it)
        elif z is not None:
            zyr_ref = next(it)
            zyi_ref = next(it)
            nzs_ref = next(it)

        # ---- scratch -----------------------------------------------------
        xc1_ref = next(it)
        xc2_ref = next(it)
        xr2_ref = next(it)
        xi2_ref = next(it)
        if z is not None and z >= 1:
            zsr_ref = next(it)    # (n_chunks, TILE_C, K/m) staging
            zsi_ref = next(it)
        if q15:
            # q15 ingest: one whole-tile int16 -> f32 relayout up front
            # (per-chunk converts of strided lane slices are slower)
            xf_r = next(it)
            xf_i = next(it)
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

        zoom_iir = z is not None and z >= 1
        if zoom_iir:
            Wy = Wy_ref[:]
            Ws = Ws_ref[:]
            kout = _K // self.zfactor

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
            sI1, sI2, sQ1, sQ2, cs, sn, sZI, sZQ = carry
            sl = pl.ds(k * _K, _K)
            # DC biquad chunk (reference order Process.cpp:117-175:
            # gain, DC block, IQ corr).  The K x K particular-solution
            # matmul rides the MXU; the rank-2 state terms are cheap
            # broadcasts (a (TILE_C,2)@(2,K) dot is a degenerate matmul
            # Mosaic handles poorly).
            # (for q15 ingest the 1/32768 scale is folded into g)
            xc = ld_r(sl) * g
            i_p = (self.b0 * xc + sI1 * Rt[0:1, :] + sI2 * Rt[1:2, :]
                   + _dot(xc, Lt))
            xg = _dot(xc, G)
            sI1, sI2 = (sI1 * AKt[0, 0] + sI2 * AKt[1, 0] + xg[:, 0:1],
                        sI1 * AKt[0, 1] + sI2 * AKt[1, 1] + xg[:, 1:2])
            xc = ld_i(sl) * g
            q_p = (self.b0 * xc + sQ1 * Rt[0:1, :] + sQ2 * Rt[1:2, :]
                   + _dot(xc, Lt))
            xg = _dot(xc, G)
            sQ1, sQ2 = (sQ1 * AKt[0, 0] + sQ2 * AKt[1, 0] + xg[:, 0:1],
                        sQ1 * AKt[0, 1] + sQ2 * AKt[1, 1] + xg[:, 1:2])

            # IQ amplitude/phase correction (Utility.cpp:178-187)
            i_c = jnp.where(pos, i_p * amp + ph * q_p, i_p * amp)
            q_c = jnp.where(pos, q_p, q_p + ph * i_c)

            if z == 0:
                # zoom x1 display tap: first _ZRES IQ-corrected samples,
                # PRE-fs4 (Process.cpp:185-187 taps before FreqShift1)
                @pl.when(k < _ZRES // _K)
                def _():
                    zsl = pl.ds(k * _K, _K)
                    z1r_ref[0, :, zsl] = i_c
                    z1i_ref[0, :, zsl] = q_c

            if zoom_iir:
                # zoom 2^z display tap input: fs4-shifted signal WITHOUT
                # the NCO mix/gain (Process.cpp:212-215 taps after
                # FreqShift1, before FreqShift2).  The whole tap —
                # 8-pole elliptic IIR, 4-tap FIR, decimate-by-2^z — is
                # ONE composed linear chunk operator with decimation
                # folded in as static row selection: two matmuls on
                # [x | state], output staged channel-major.
                zr_c = i_c * fr - q_c * fi
                zi_c = i_c * fi + q_c * fr
                zi_in = jnp.concatenate([zr_c, sZI], axis=1)
                zq_in = jnp.concatenate([zi_c, sZQ], axis=1)
                # stage per-chunk decimated outputs under a DYNAMIC
                # leading index (Mosaic only allows dynamic LANE-dim
                # store offsets at 128-sample granularity); the copy to
                # the contiguous output uses static offsets after the
                # loop
                zsr_ref[k] = _zdot(zi_in, Wy)
                zsi_ref[k] = _zdot(zq_in, Wy)
                sZI = _zdot(zi_in, Ws)
                sZQ = _zdot(zq_in, Ws)

            # fs4 (exact j^n) x NCO phasor e^{-i theta} for this chunk
            tr = self.nco_gain * (fr * cs + fi * sn)
            ti = self.nco_gain * (fi * cs - fr * sn)
            xr2_ref[:, sl] = i_c * tr - q_c * ti
            xi2_ref[:, sl] = i_c * ti + q_c * tr
            return (sI1, sI2, sQ1, sQ2,
                    cs * cd - sn * sd, sn * cd + cs * sd, sZI, sZQ)

        # partial unroll: UNROLL chunks per fori step — full static
        # unroll lets Mosaic pipeline best (146 us vs 177 us rolled at
        # 1024 ch) but costs ~10 min of Mosaic scheduling; 4x unroll
        # keeps most of the win at a sane compile time
        UNROLL = 4
        if zoom_iir:
            S = self.z_states
            sZI0 = zs_ref[0, :, 0:S]
            sZQ0 = zs_ref[0, :, S:2 * S]
        else:
            sZI0 = sZQ0 = jnp.zeros((TILE_C, 1), f32)
        carry = (dcs_ref[0, :, 0:1], dcs_ref[0, :, 1:2],
                 dcs_ref[0, :, 2:3], dcs_ref[0, :, 3:4], cs, sn, sZI0, sZQ0)

        def outer_body(j, carry):
            for u in range(UNROLL):
                carry = chunk_body(j * UNROLL + u, carry)
            return carry

        carry = jax.lax.fori_loop(0, n // _K // UNROLL, outer_body, carry)
        sI1, sI2, sQ1, sQ2, _, _, sZI, sZQ = carry

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

        if zoom_iir:
            nzs_ref[0] = jnp.concatenate([sZI, sZQ], axis=1)
            for c in range(n // _K):          # static-offset output copy
                zyr_ref[0, :, c * kout:(c + 1) * kout] = zsr_ref[c]
                zyi_ref[0, :, c * kout:(c + 1) * kout] = zsi_ref[c]

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _call(self, pp, dcs, h1r, h1i, h2r, h2i, xr, xi, *zoom_in):
        gdim, _, n = xr.shape
        n2 = n // C.DF
        f32 = jnp.float32
        z = self.zoom
        ch_t = lambda d: pl.BlockSpec(  # noqa: E731
            (1, TILE_C, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        tm_t = lambda r: pl.BlockSpec(  # noqa: E731
            (1, r, TILE_C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        full = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)

        in_specs = [full(2, _K), full(_K, _K), full(_K, 2),
                    ch_t(8), ch_t(4), tm_t(self.t1 - 1), tm_t(self.t1 - 1),
                    tm_t(self.t2 - 1), tm_t(self.t2 - 1),
                    ch_t(n), ch_t(n)]
        out_specs = [ch_t(n2), ch_t(n2), ch_t(4), ch_t(1),
                     tm_t(self.t1 - 1), tm_t(self.t1 - 1),
                     tm_t(self.t2 - 1), tm_t(self.t2 - 1)]
        out_shape = [
            jax.ShapeDtypeStruct((gdim, TILE_C, n2), f32),
            jax.ShapeDtypeStruct((gdim, TILE_C, n2), f32),
            jax.ShapeDtypeStruct((gdim, TILE_C, 4), f32),
            jax.ShapeDtypeStruct((gdim, TILE_C, 1), f32),
            jax.ShapeDtypeStruct((gdim, self.t1 - 1, TILE_C), f32),
            jax.ShapeDtypeStruct((gdim, self.t1 - 1, TILE_C), f32),
            jax.ShapeDtypeStruct((gdim, self.t2 - 1, TILE_C), f32),
            jax.ShapeDtypeStruct((gdim, self.t2 - 1, TILE_C), f32),
        ]
        scratch = [
            pltpu.VMEM((self.t1 - 1 + n, TILE_C), f32),
            pltpu.VMEM((self.t2 - 1 + n // C.DF1, TILE_C), f32),
            pltpu.VMEM((TILE_C, n), f32),
            pltpu.VMEM((TILE_C, n), f32),
        ]
        args = [jnp.asarray(self.Rt), jnp.asarray(self.Lt),
                jnp.asarray(self.G), pp, dcs, h1r, h1i, h2r, h2i, xr, xi]
        if z is not None and z >= 1:
            S = self.z_states
            nz = n // self.zfactor
            in_specs += [full(_K + S, _K // self.zfactor),
                         full(_K + S, S), ch_t(2 * S)]
            args += [jnp.asarray(self.Wy), jnp.asarray(self.Ws)] \
                + list(zoom_in)
            out_specs += [ch_t(nz), ch_t(nz), ch_t(2 * S)]
            out_shape += [
                jax.ShapeDtypeStruct((gdim, TILE_C, nz), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, nz), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, 2 * S), f32),
            ]
            scratch += [
                pltpu.VMEM((n // _K, TILE_C, _K // self.zfactor), f32),
                pltpu.VMEM((n // _K, TILE_C, _K // self.zfactor), f32),
            ]
        elif z == 0:
            out_specs += [ch_t(_ZRES), ch_t(_ZRES)]
            out_shape += [
                jax.ShapeDtypeStruct((gdim, TILE_C, _ZRES), f32),
                jax.ShapeDtypeStruct((gdim, TILE_C, _ZRES), f32),
            ]
        q15 = xr.dtype == jnp.int16
        if q15:
            scratch += [pltpu.VMEM((TILE_C, n), f32)] * 2
        return pl.pallas_call(
            functools.partial(self._kernel, n, q15),
            grid=(gdim,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=self.interpret,
        )(*args)

    # ------------------------------------------------------------------
    def block(self, params, state, iq: jnp.ndarray, zoom_state=None):
        """params: ChannelParams-compatible (nco_freq, rf_gain_db,
        band_gain, iq_amp, iq_phase as (...,) arrays); state: the
        4-tuple from init_state; iq: (..., N) complex64, or an
        (i, q) pair of int16 q15 arrays (ADC format) — the kernel
        converts on load with the 1/32768 scale folded into the gain.

        Returns (new_state, x) with x (..., N/8) complex64 at 24 kHz;
        with zoom=0, (new_state, x, z1seg) where z1seg is the (..., 512)
        complex IQ-corrected display segment; with zoom>=1, pass
        zoom_state=(iir (..., 2, S, 2) f32, dec (..., zt-1) complex64)
        and get (new_state, x, zdec, new_iir, new_dec) with zdec the
        (..., N/2^zoom) decimated zoom stream.
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

        zoom_in = ()
        if self.zoom is not None and self.zoom >= 1:
            z_iir, z_dec = zoom_state
            S2 = 2 * self.z_stages
            S = self.z_states
            # composed state layout per stream: [stage0 s1,s2, ...,
            # u[n-1], u[n-2], u[n-3]] — df2T states then the decimator
            # history reversed (fir_state keeps oldest first); streams
            # concatenated [I | Q]
            dec_r = z_dec.real.reshape(-1, self.zt - 1)[:, ::-1]
            dec_i = z_dec.imag.reshape(-1, self.zt - 1)[:, ::-1]
            zs = jnp.concatenate(
                [z_iir[..., 0, :, :].reshape(-1, S2), dec_r,
                 z_iir[..., 1, :, :].reshape(-1, S2), dec_i], axis=-1)
            zoom_in = (chan_major(zs, 2 * S),)

        outs = self._call(
            pp, dcs,
            time_major(dec1.real), time_major(dec1.imag),
            time_major(dec2.real), time_major(dec2.imag),
            chan_major(xr_in, n), chan_major(xi_in, n), *zoom_in)
        yr, yi, ndcs, nph, nh1r, nh1i, nh2r, nh2i = outs[:8]

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
        x = x.reshape(lead + (n2,))
        if self.zoom == 0:
            z1r, z1i = outs[8], outs[9]
            seg = (from_chan(z1r) + 1j * from_chan(z1i)).astype(
                jnp.complex64).reshape(lead + (_ZRES,))
            return new_state, x, seg
        if self.zoom is not None:
            zyr, zyi, nzs = outs[8:11]
            S2 = 2 * self.z_stages
            S = self.z_states
            nz = n // self.zfactor
            zdec = (from_chan(zyr) + 1j * from_chan(zyi)).astype(
                jnp.complex64).reshape(lead + (nz,))
            s_flat = from_chan(nzs)
            sI, sQ = s_flat[:, :S], s_flat[:, S:]
            new_iir = jnp.stack(
                [sI[:, :S2].reshape(-1, self.z_stages, 2),
                 sQ[:, :S2].reshape(-1, self.z_stages, 2)],
                axis=1).reshape(lead + (2, self.z_stages, 2))
            new_dec = (sI[:, S2:][:, ::-1]
                       + 1j * sQ[:, S2:][:, ::-1]).astype(
                jnp.complex64).reshape(lead + (self.zt - 1,))
            return new_state, x, zdec, new_iir, new_dec
        return new_state, x
