"""Unit tests for the trace-time FIR/IIR designers against frequency-domain
specs (the reference has no tests; specs come from its design targets:
90 dB decimator stopband `T41_SDR.ino:336`, band-pass cutoffs
`Filter.cpp:239`)."""

import numpy as np
import pytest

from t41x import constants as C
from t41x.dsp import firdesign as fd
from t41x.utils import windows as W


def freq_response_db(h, fs, freqs):
    w = np.exp(-2j * np.pi * np.outer(freqs, np.arange(len(h))) / fs)
    return 20 * np.log10(np.abs(w @ np.asarray(h, np.complex128)) + 1e-12)


def test_izero_matches_series():
    x = np.array([0.0, 0.5, 1.0, 3.0, 8.0])
    expected = np.i0(x) if hasattr(np, "i0") else None
    got = W.izero(x)
    if expected is not None:
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_kaiser_beta_regimes():
    assert W.kaiser_beta(10.0) == 0.0
    assert W.kaiser_beta(90.0) == pytest.approx(0.1102 * (90.0 - 8.71))
    assert 0 < W.kaiser_beta(40.0) < W.kaiser_beta(60.0)


def test_lowpass_meets_spec():
    h = fd.fir_kaiser(C.dec1_taps(), 9000.0, 90.0, "lowpass", fs=192000.0)
    # passband flat within 2 dB of DC response (the reference design has
    # ~-1.5 dB absolute gain at DC; parity, not unity, is the spec)
    dc = freq_response_db(h, 192000.0, np.array([1.0]))[0]
    pb = freq_response_db(h, 192000.0, np.linspace(100, 5000, 40))
    assert np.all(np.abs(pb - dc) < 2.0)
    # solid attenuation beyond the first-stage alias edge (48-9=39 kHz)
    sb = freq_response_db(h, 192000.0, np.linspace(40000, 95000, 60))
    assert np.all(sb < -60.0)


def test_dec_tap_counts():
    assert C.dec1_taps() == 28
    assert C.dec2_taps() == 46


def test_complex_bandpass_usb_selects_positive_freqs():
    taps = fd.complex_bandpass(257, 200.0, 3000.0, 24000.0)
    f = np.linspace(-12000, 12000, 481)
    resp = freq_response_db(taps, 24000.0, f)
    inband = resp[(f > 500) & (f < 2700)]
    image = resp[(f < -500) & (f > -2700)]
    assert np.all(inband > -3.0)
    assert np.all(image < -50.0)  # opposite sideband heavily rejected


def test_complex_bandpass_lsb_mirror():
    taps = fd.complex_bandpass(257, -3000.0, -200.0, 24000.0)
    f = np.linspace(-12000, 12000, 481)
    resp = freq_response_db(taps, 24000.0, f)
    inband = resp[(f < -500) & (f > -2700)]
    image = resp[(f > 500) & (f < 2700)]
    assert np.all(inband > -3.0)
    assert np.all(image < -50.0)


def test_os_filter_mask_is_fft_of_taps():
    taps = fd.complex_bandpass(257, 200.0, 3000.0, 24000.0)
    mask = fd.os_filter_mask(taps, 512)
    assert mask.shape == (512,)
    direct = np.fft.fft(np.pad(taps, (0, 512 - 257)))
    np.testing.assert_allclose(mask, direct, atol=1e-12)


def test_biquad_lowpass_dc_gain_unity():
    b, a = fd.biquad_rbj(3000.0, 0.707, 24000.0, "lowpass")
    dc = np.sum(b) / np.sum(a)
    assert dc == pytest.approx(1.0, abs=1e-9)


def test_biquad_notch_kills_center():
    b, a = fd.biquad_rbj(1000.0, 10.0, 24000.0, "notch")
    w0 = 2 * np.pi * 1000.0 / 24000.0
    z = np.exp(1j * w0)
    h = (b[0] + b[1] / z + b[2] / z**2) / (a[0] + a[1] / z + a[2] / z**2)
    assert abs(h) < 1e-6


def test_hilbert_taps_odd_symmetric_imag():
    h = fd.fir_kaiser(100, 0.0, 60.0, "hilbert")
    # interleaved I/Q pairs: real part single delay tap, imag odd taps only
    re, im = h[0::2], h[1::2]
    assert np.count_nonzero(re) == 1
    assert np.count_nonzero(im) > 10
