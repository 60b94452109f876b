"""Frequency translation kernels (JAX).

* `fs4_shift` — multiplication-free +Fs/4 translation (reference
  `FreqShift1`, `Freq_Shift.cpp:42-65`): x[n] * j**n, expressed as a
  4-periodic constant pattern so XLA folds it into one complex multiply.
* `nco_mix` — software quadrature-oscillator fine-tune mix (reference
  `FreqShift2`, `Freq_Shift.cpp:94-141`).  The reference integrates a
  recurrence oscillator with amplitude correction; t41x uses the
  closed-form phase ramp `exp(-i(phi0 + (n+1)w))`, which is what the
  recurrence converges to, with the phase carried across blocks so
  mixing is coherent over an arbitrarily long capture.

Sign conventions (verified against the reference source):
  FreqShift1 rotates UP by +Fs/4 (z -> j^n z); FreqShift2 mixes DOWN by
  the NCO frequency (z -> z e^{-i theta_n}), so a capture tone at
  (nco - fs/4) lands at DC.
"""

from __future__ import annotations

import jax.numpy as jnp

from t41x import constants as C

# The reference scales the mixed signal by this fudge factor
# (`Freq_Shift.cpp:137` freqAdjFactor); kept as the default for parity.
FREQ_ADJ_FACTOR = 1.1


def fs4_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Multiply by j**n along the last axis (block length divisible by 4)."""
    n = x.shape[-1]
    assert n % 4 == 0
    pattern = jnp.array([1, 1j, -1, -1j], dtype=jnp.complex64)
    return x * jnp.tile(pattern, n // 4)


def nco_phase_inc(freq_hz, fs: float = C.SAMPLE_RATE):
    """Per-sample NCO phase increment (reference `NCO_INC`,
    `Freq_Shift.cpp:121`)."""
    return 2.0 * jnp.pi * freq_hz / fs


def nco_mix(phase: jnp.ndarray, x: jnp.ndarray, freq_hz,
            fs: float = C.SAMPLE_RATE, gain: float = FREQ_ADJ_FACTOR):
    """Mix x DOWN by freq_hz with carried phase.

    phase: () or (...,) carried oscillator phase (radians)
    x:     (..., N) complex block
    freq_hz may be a scalar or broadcastable per-channel array.
    Returns (new_phase, y).
    """
    n = x.shape[-1]
    w = nco_phase_inc(jnp.asarray(freq_hz, jnp.float32), fs)
    steps = jnp.arange(1, n + 1, dtype=jnp.float32)
    theta = phase[..., None] + w[..., None] * steps
    y = (gain * x) * jnp.exp(-1j * theta).astype(jnp.complex64)
    new_phase = jnp.mod(phase + w * n, 2.0 * jnp.pi)
    return new_phase, y
