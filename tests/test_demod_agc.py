"""Demodulator and AGC behavioral tests against synthetic baseband signals."""

import jax.numpy as jnp
import numpy as np

from t41x import constants as C
from t41x.demod import am, nfm, sam, ssb
from t41x.dsp import agc, firdesign as fd, iir
from t41x.io import signals


def tone(freq, n, rate=C.AUDIO_RATE):
    t = np.arange(n) / rate
    return np.sin(2 * np.pi * freq * t)


def test_ssb_demod_is_real_part():
    z = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)
    np.testing.assert_array_equal(np.asarray(ssb.ssb_demod(jnp.asarray(z))),
                                  z.real)


def test_am_demod_recovers_envelope():
    n = 4096
    mod = tone(400.0, n)
    y = ((1.0 + 0.5 * mod) * np.exp(1j * 0.3)).astype(np.complex64)
    b, a = fd.biquad_rbj(3000.0, 1.3, C.AUDIO_RATE, "lowpass")
    op = iir.BiquadChunked(*am.am_post_cascade(b, a), chunk=64)
    bq, audio = am.am_demod(iir.biquad_state((), stages=2),
                            jnp.asarray(y), op)
    audio = np.asarray(audio)[1000:]
    assert signals.snr_db(audio, 0.5 * mod[1000:]) > 20


def test_nfm_demod_recovers_modulation():
    n = 4096
    rate = C.AUDIO_RATE
    dev, fm = 3000.0, 400.0
    t = np.arange(n) / rate
    phase = (dev / fm) * np.sin(2 * np.pi * fm * t)
    z = np.exp(1j * (2 * np.pi * 0.0 * t + phase)).astype(np.complex64)
    _, audio = nfm.nfm_demod(nfm.nfm_state(), jnp.asarray(z))
    audio = np.asarray(audio)[100:]
    # instantaneous frequency is dev*cos(2 pi fm t)
    expected = np.cos(2 * np.pi * fm * t)[100:]
    assert signals.snr_db(audio - audio.mean(), expected) > 20


def test_sam_demod_locks_to_carrier_offset():
    n = 24000  # 1 s
    rate = C.AUDIO_RATE
    t = np.arange(n) / rate
    offset = 97.0
    mod = tone(350.0, n)
    y = ((1.0 + 0.5 * mod) * np.exp(2j * np.pi * offset * t)).astype(np.complex64)
    p = sam.sam_params()
    st = sam.sam_state()
    st, audio, carrier = sam.sam_demod(p, st, jnp.asarray(y))
    assert abs(float(carrier) - offset) < 10.0
    audio = np.asarray(audio)[12000:]
    assert signals.snr_db(audio - audio.mean(), mod[12000:]) > 10


def test_agc_normalizes_levels():
    p = agc.agc_params(mode=4)  # fast
    n = 24000
    # amplitudes within the AGC's gain range (max_gain = 10 at 20 dB thresh)
    for amp in (0.1, 0.5):
        x = (amp * np.exp(2j * np.pi * 600.0 * np.arange(n) / 24000)
             ).astype(np.complex64)
        st = agc.agc_state(p)
        st, y = agc.agc_apply(p, st, jnp.asarray(x))
        level = np.abs(np.asarray(y)[-4000:]).mean()
        # converges toward out_target (~0.98) regardless of input level
        assert 0.4 < level < 1.5, (amp, level)


def test_agc_attack_limits_overshoot():
    p = agc.agc_params(mode=4)
    n = 8000
    x = np.ones(n, np.complex64) * 0.001
    x[4000:] = 1.0  # 60 dB step
    st = agc.agc_state(p)
    _, y = agc.agc_apply(p, st, jnp.asarray(x))
    y = np.abs(np.asarray(y))
    # after the step settles the output should not exceed ~2x target
    assert y[4200:].max() < 2.5


def test_agc_streaming_equals_oneshot():
    p = agc.agc_params(mode=2)
    x = (np.random.default_rng(3).standard_normal(1024)
         + 1j * np.random.default_rng(4).standard_normal(1024)
         ).astype(np.complex64) * 0.2
    st = agc.agc_state(p)
    parts = []
    for i in range(4):
        st, y = agc.agc_apply(p, st, jnp.asarray(x[i * 256:(i + 1) * 256]))
        parts.append(np.asarray(y))
    _, yall = agc.agc_apply(p, agc.agc_state(p), jnp.asarray(x))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(yall),
                               rtol=1e-4, atol=1e-5)


def test_agc_off_applies_fixed_gain():
    p = agc.agc_params(mode=0)
    x = jnp.ones(16, jnp.complex64) * 0.01
    _, y = agc.agc_apply(p, agc.agc_state(p), x)
    np.testing.assert_allclose(np.asarray(y), 0.2, rtol=1e-5)


def test_agc_batched_channels():
    p = agc.agc_params(mode=3)
    x = (np.random.default_rng(5).standard_normal((3, 512))
         ).astype(np.complex64) * 0.1
    st = agc.agc_state(p, (3,))
    st, y = agc.agc_apply(p, st, jnp.asarray(x))
    assert y.shape == (3, 512)
    # each channel independently equals the single-channel result
    for c in range(3):
        _, yc = agc.agc_apply(p, agc.agc_state(p), jnp.asarray(x[c]))
        np.testing.assert_allclose(np.asarray(y[c]), np.asarray(yc),
                                   rtol=1e-4, atol=1e-5)
