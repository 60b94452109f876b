import numpy as np

from t41x.io import signals, wav


def test_wav_roundtrip_mono(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(4800) / 48000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav.write_wav(p, x, 48000)
    y, rate = wav.read_wav(p)
    assert rate == 48000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_roundtrip_float32(tmp_path):
    x = (np.random.default_rng(0).standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t32.wav")
    wav.write_wav(p, x, 24000, bits=32)
    y, rate = wav.read_wav(p)
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_iq_wav_roundtrip(tmp_path):
    iq = signals.tone_iq(1000.0, 2048) * 0.5
    p = str(tmp_path / "iq.wav")
    wav.write_iq_wav(p, iq, 192000)
    iq2, rate = wav.read_iq_wav(p)
    assert rate == 192000
    np.testing.assert_allclose(iq2, iq, atol=1e-3)


def test_usb_signal_frequency_plan():
    # one audio tone at 1 kHz, nco=0: capture tone should be at -47 kHz
    n = 8192
    x = signals.usb_signal([1000.0], n)
    spec = np.fft.fftshift(np.abs(np.fft.fft(x)))
    freqs = np.fft.fftshift(np.fft.fftfreq(n, 1 / 192000))
    peak = freqs[np.argmax(spec)]
    assert abs(peak - (-47000.0)) < 192000 / n + 1


def test_snr_db_sanity():
    ref = np.sin(np.linspace(0, 100, 10000))
    noisy = ref + 0.01 * np.random.default_rng(0).standard_normal(10000)
    assert signals.snr_db(noisy, ref) > 35
    assert signals.snr_db(ref * 3.0, ref) > 100  # gain-invariant


def test_cw_envelope_timing():
    fs = 192000
    env = signals.cw_keying_envelope(".-", 20.0, fs)  # 'A'
    dit = 1.2 / 20.0
    # dit mark ~1 dit long, dah ~3 dits
    on = env > 0.5
    assert on[int(0.5 * dit * fs)]
    assert not on[int(1.5 * dit * fs)]
    assert on[int(3.5 * dit * fs)]
