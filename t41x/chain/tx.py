"""Transmit chains (JAX).

Re-expression of the reference exciters:

  * SSB (`ExciterIQData`, tmr4/T41_SDR `Exciter.cpp:46-169`): mic audio
    at 192 kHz -> x4 + x2 decimation to 24 kHz -> optional TX EQ ->
    Hilbert-pair quadrature split -> sideband-select IQ combine -> IQ
    corrections -> x2 + x4 interpolation back to 192 kHz -> drive scale.
    The reference uses two fixed 100-tap +-45 deg FIR designs
    (`FIR.cpp:373-580`); t41x designs an equivalent delay + type-III
    Hilbert transformer pair at trace time.
  * CW (`CW_ExciterIQData`, `CW_Excite.cpp:66-118`): keyed quadrature
    sidetone with shaped edges, generated in closed form at the RF rate
    (the reference precomputes 24 kHz tone tables and interpolates x8).

Both are pure `(params, state, block) -> (state, iq)` functions,
channel-batched like the RX chain.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from t41x import constants as C
from t41x.chain import compressor as comp_mod
from t41x.dsp import eq as eq_mod
from t41x.dsp import fir, firdesign as fd

TX_SCALE = 20.0  # output drive scale (Exciter.cpp:153)


@dataclasses.dataclass(frozen=True)
class TxSpec:
    sideband: str = "usb"      # 'usb' | 'lsb'
    eq_on: bool = False
    hilbert_taps: int = 101
    compressor_on: bool = False
    sample_rate: float = C.SAMPLE_RATE


class TxParams(NamedTuple):
    iq_amp: jnp.ndarray     # TX IQ amplitude correction
    iq_phase: jnp.ndarray   # TX IQ phase correction
    drive: jnp.ndarray      # power scale 0..1
    eq_gains: jnp.ndarray   # (..., 14)


def default_tx_params(channels: tuple[int, ...] = ()) -> TxParams:
    f = lambda v: np.full(channels, v, np.float32)  # noqa: E731
    return TxParams(f(1.0), f(0.0), f(1.0),
                    np.ones(channels + (eq_mod.NUM_BANDS,), np.float32))


class SSBState(NamedTuple):
    dec1: jnp.ndarray
    dec2: jnp.ndarray
    delay: jnp.ndarray     # matched delay line for the I branch
    hilb: jnp.ndarray      # hilbert FIR history for the Q branch
    int1_i: jnp.ndarray    # interpolator histories, I branch
    int2_i: jnp.ndarray
    int1_q: jnp.ndarray    # interpolator histories, Q branch
    int2_q: jnp.ndarray
    eq: object
    comp: object           # mic compressor state (or ())


class SSBExciter:
    def __init__(self, spec: TxSpec = TxSpec()):
        self.spec = spec
        h1, h2 = fd.decimation_prototypes(3000.0)
        self.h1 = h1.astype(np.float32)
        self.h2 = h2.astype(np.float32)
        i1, i2 = fd.interpolation_prototypes(3000.0)
        self.hi1 = i1.astype(np.float32)
        self.hi2 = i2.astype(np.float32)
        from scipy import signal
        nt = spec.hilbert_taps | 1
        self.hilbert = signal.remez(
            nt, [250.0, 11750.0], [1.0],
            fs=spec.sample_rate / C.DF, type="hilbert").astype(np.float32)
        # matched delay for the in-phase branch: (nt-1)/2 samples
        d = np.zeros(nt, np.float32)
        d[(nt - 1) // 2] = 1.0
        self.delay_taps = d
        self.eq = (eq_mod.EQDesign(spec.sample_rate / C.DF)
                   if spec.eq_on else None)
        # mic compressor at the RF input rate (SetupMyCompressors,
        # T41_SDR.ino:1105-1113 defaults: -10 dB knee, 5:1)
        self.comp = (comp_mod.compressor_params(rate=spec.sample_rate)
                     if spec.compressor_on else None)

    def init_state(self, channels: tuple[int, ...] = ()) -> SSBState:
        nt = len(self.hilbert)
        i1 = lambda: np.zeros(channels + (len(self.hi1) // C.DF2 - 1,),
                              np.float32)  # noqa: E731
        i2 = lambda: np.zeros(channels + (len(self.hi2) // C.DF1 - 1,),
                              np.float32)  # noqa: E731
        return SSBState(
            dec1=fir.fir_state(len(self.h1), channels),
            dec2=fir.fir_state(len(self.h2), channels),
            delay=fir.fir_state(nt, channels),
            hilb=fir.fir_state(nt, channels),
            int1_i=i1(), int2_i=i2(), int1_q=i1(), int2_q=i2(),
            eq=(self.eq.init_state(channels) if self.eq else ()),
            comp=(comp_mod.compressor_state(channels) if self.comp
                  else ()),
        )

    def block(self, params: TxParams, st: SSBState, mic: jnp.ndarray):
        """mic: (..., BLOCK) float32 at 192 kHz.  Returns (state, iq)."""
        comp_state = st.comp
        if self.comp:
            comp_state, mic = comp_mod.compress(self.comp, comp_state, mic)
        dec1, x = fir.fir_decimate(st.dec1, mic, jnp.asarray(self.h1),
                                   C.DF1)
        dec2, x = fir.fir_decimate(st.dec2, x, jnp.asarray(self.h2), C.DF2)
        eq_state = st.eq
        if self.eq:
            eq_state, x = self.eq.apply(eq_state, x, params.eq_gains)

        delay_st, i_part = fir.fir_apply(st.delay, x,
                                         jnp.asarray(self.delay_taps))
        hilb_st, q_part = fir.fir_apply(st.hilb, x,
                                        jnp.asarray(self.hilbert))
        # scipy's remez hilbert convention yields the LOWER sideband for
        # i + j*q; negate q for USB
        if self.spec.sideband == "usb":
            q_part = -q_part

        # TX IQ corrections (Exciter.cpp:119-129)
        i_c = i_part * params.iq_amp[..., None]
        ph = params.iq_phase[..., None]
        pos = ph >= 0
        i_c = jnp.where(pos, i_c + ph * q_part, i_c)
        q_c = jnp.where(pos, q_part, q_part + ph * i_c)

        int1_i, i_up = fir.fir_interpolate(st.int1_i, i_c,
                                           jnp.asarray(self.hi1), C.DF2)
        int2_i, i_up = fir.fir_interpolate(st.int2_i, i_up,
                                           jnp.asarray(self.hi2), C.DF1)
        int1_q, q_up = fir.fir_interpolate(st.int1_q, q_c,
                                           jnp.asarray(self.hi1), C.DF2)
        int2_q, q_up = fir.fir_interpolate(st.int2_q, q_up,
                                           jnp.asarray(self.hi2), C.DF1)

        gain = (C.DF * TX_SCALE * params.drive)[..., None]
        iq = (i_up + 1j * q_up) * gain
        new_state = SSBState(dec1, dec2, delay_st, hilb_st,
                             int1_i, int2_i, int1_q, int2_q, eq_state,
                             comp_state)
        return new_state, iq.astype(jnp.complex64)


class CWState(NamedTuple):
    phase: jnp.ndarray   # (...,) tone phase
    env: jnp.ndarray     # (...,) current envelope level (for shaping)


class CWExciter:
    """Keyed quadrature sidetone at the RF rate (reference
    `CW_ExciterIQData` + keyed state machines `T41_SDR.ino:1179-1295`)."""

    def __init__(self, tone_hz: float = 750.0,
                 rate: float = C.SAMPLE_RATE, rise_ms: float = 5.0):
        self.tone_hz = tone_hz
        self.rate = rate
        self.rise_per_block = min(
            1.0, C.BLOCK_SIZE / (rise_ms * 1e-3 * rate))
        self.amp = 0.127 * TX_SCALE  # CW_Excite.cpp:69 x Exciter scale

    def init_state(self, channels: tuple[int, ...] = ()) -> CWState:
        return CWState(np.zeros(channels, np.float32),
                       np.zeros(channels, np.float32))

    def block(self, st: CWState, key_down: jnp.ndarray,
              drive: jnp.ndarray = 1.0):
        """key_down: (...,) bool/0-1 keying for this block.
        Returns (state, iq) with shaped raised-cosine edges."""
        n = C.BLOCK_SIZE
        target = jnp.asarray(key_down, jnp.float32)
        # first-order envelope ramp toward the key state over the block
        t_frac = jnp.arange(1, n + 1, dtype=jnp.float32) / n
        env = (st.env[..., None]
               + (target - st.env)[..., None]
               * jnp.minimum(t_frac / max(self.rise_per_block, 1e-6), 1.0))
        w = 2.0 * jnp.pi * self.tone_hz / self.rate
        theta = st.phase[..., None] + w * jnp.arange(1, n + 1,
                                                     dtype=jnp.float32)
        iq = (self.amp * jnp.asarray(drive) * env
              * jnp.exp(1j * theta)).astype(jnp.complex64)
        new_phase = jnp.mod(st.phase + w * n, 2.0 * jnp.pi)
        return CWState(new_phase, env[..., -1]), iq


def cw_power_scale(power_watts: jnp.ndarray, cal: float = 1.0):
    """TX power polynomial (reference `T41_SDR.ino:1180`):
    powerOutCW = (-0.0133 p^2 + 0.7884 p + 4.5146) * cal."""
    p = jnp.asarray(power_watts)
    return (-0.0133 * p * p + 0.7884 * p + 4.5146) * cal
