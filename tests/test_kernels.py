"""Unit tests for the streaming JAX kernels vs NumPy/SciPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from t41x import constants as C
from t41x.dsp import fir, firdesign as fd, iir, nco, osfilter


RNG = np.random.default_rng(42)


def test_fir_decimate_matches_oracle():
    h = fd.fir_kaiser(28, 9000.0, 90.0, "lowpass", fs=192000.0).astype(np.float32)
    x = RNG.standard_normal(256).astype(np.float32)
    state = fir.fir_state(28)
    _, y = fir.fir_decimate(state, jnp.asarray(x), jnp.asarray(h), 4)
    ref = fir.decimate_reference(x, h, 4)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_fir_decimate_streaming_equals_oneshot():
    h = fd.fir_kaiser(46, 9000.0, 90.0, "lowpass", fs=48000.0).astype(np.float32)
    x = RNG.standard_normal(512).astype(np.float32)
    s = fir.fir_state(46)
    ys = []
    for i in range(4):
        s, y = fir.fir_decimate(s, jnp.asarray(x[i * 128:(i + 1) * 128]),
                                jnp.asarray(h), 2)
        ys.append(np.asarray(y))
    streamed = np.concatenate(ys)
    _, oneshot = fir.fir_decimate(fir.fir_state(46), jnp.asarray(x),
                                  jnp.asarray(h), 2)
    np.testing.assert_allclose(streamed, np.asarray(oneshot), rtol=1e-5, atol=1e-6)


def test_fir_decimate_complex_and_batched():
    h = np.ones(8, np.float32) / 8
    x = (RNG.standard_normal((3, 64)) + 1j * RNG.standard_normal((3, 64))
         ).astype(np.complex64)
    s = fir.fir_state(8, (3,), jnp.complex64)
    _, y = fir.fir_decimate(s, jnp.asarray(x), jnp.asarray(h), 4)
    assert y.shape == (3, 16)
    for c in range(3):
        ref = fir.decimate_reference(x[c], h, 4)
        np.testing.assert_allclose(np.asarray(y[c]), ref, rtol=1e-4, atol=1e-5)


def test_fir_interpolate_matches_zero_stuff_oracle():
    h = fd.fir_kaiser(48, 9000.0, 90.0, "lowpass", fs=48000.0).astype(np.float32)
    x = RNG.standard_normal(96).astype(np.float32)
    L = 2
    s = jnp.zeros(48 // L - 1)
    _, y = fir.fir_interpolate(s, jnp.asarray(x), jnp.asarray(h), L)
    # oracle: zero-stuff then causal FIR
    xu = np.zeros(len(x) * L, np.float32)
    xu[::L] = x
    hist = np.zeros(len(h) - 1, np.float32)
    xc = np.concatenate([hist, xu])
    ref = np.array([np.dot(xc[n: n + len(h)], h[::-1])
                    for n in range(len(xu))])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_fir_interpolate_streaming_equals_oneshot():
    h = fd.fir_kaiser(32, 9000.0, 90.0, "lowpass", fs=192000.0).astype(np.float32)
    x = RNG.standard_normal(128).astype(np.float32)
    L = 4
    s = jnp.zeros(32 // L - 1)
    parts = []
    for i in range(4):
        s, y = fir.fir_interpolate(s, jnp.asarray(x[i * 32:(i + 1) * 32]),
                                   jnp.asarray(h), L)
        parts.append(np.asarray(y))
    _, oneshot = fir.fir_interpolate(jnp.zeros(32 // L - 1), jnp.asarray(x),
                                     jnp.asarray(h), L)
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(oneshot),
                               rtol=1e-5, atol=1e-6)


def test_fs4_shift_is_jn():
    x = (RNG.standard_normal(64) + 1j * RNG.standard_normal(64)).astype(np.complex64)
    y = nco.fs4_shift(jnp.asarray(x))
    ref = x * (1j ** np.arange(64))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6, atol=1e-6)


def test_nco_mix_shifts_tone_to_dc():
    n = 4096
    f = 5000.0
    t = np.arange(n) / 192000.0
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    phase = jnp.zeros(())
    _, y = nco.nco_mix(phase, jnp.asarray(x), f, gain=1.0)
    y = np.asarray(y)
    # result should be (nearly) constant at exp(-i w) * 1
    assert np.std(np.angle(y[10:] / y[10])) < 1e-3


def test_nco_mix_phase_coherent_across_blocks():
    n = 512
    x = (RNG.standard_normal(2 * n) + 1j * RNG.standard_normal(2 * n)
         ).astype(np.complex64)
    ph = jnp.zeros(())
    ph, y1 = nco.nco_mix(ph, jnp.asarray(x[:n]), 1234.5)
    _, y2 = nco.nco_mix(ph, jnp.asarray(x[n:]), 1234.5)
    _, yall = nco.nco_mix(jnp.zeros(()), jnp.asarray(x), 1234.5)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(yall),
                               rtol=1e-3, atol=1e-4)


def test_os_filter_equals_linear_convolution():
    taps = fd.complex_bandpass(257, 200.0, 3000.0, 24000.0).astype(np.complex64)
    mask = jnp.asarray(fd.os_filter_mask(taps, 512).astype(np.complex64))
    x = (RNG.standard_normal(1024) + 1j * RNG.standard_normal(1024)
         ).astype(np.complex64)
    s = osfilter.os_state()
    outs = []
    for i in range(4):
        s, y = osfilter.os_filter(s, jnp.asarray(x[i * 256:(i + 1) * 256]), mask)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    ref = np.convolve(x.astype(np.complex128), taps.astype(np.complex128))[:1024]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_os_filter_matmul_matches_fft_path():
    taps = fd.complex_bandpass(257, -3000.0, -200.0, 24000.0)
    mask_np = fd.os_filter_mask(taps, 512)
    mask = jnp.asarray(mask_np.astype(np.complex64))
    W = jnp.asarray(osfilter.os_matmul_operator(mask_np))
    x = (RNG.standard_normal((2, 256)) + 1j * RNG.standard_normal((2, 256))
         ).astype(np.complex64)
    s = osfilter.os_state((2,))
    _, y_fft = osfilter.os_filter(s, jnp.asarray(x), mask)
    _, y_mm = osfilter.os_filter_matmul(s, jnp.asarray(x), W)
    np.testing.assert_allclose(np.asarray(y_fft), np.asarray(y_mm),
                               rtol=2e-3, atol=2e-4)


def test_biquad_matches_scipy():
    scipy_signal = pytest.importorskip("scipy.signal")
    b, a = fd.biquad_rbj(3000.0, 1.3, 24000.0, "lowpass")
    x = RNG.standard_normal(500).astype(np.float32)
    s = iir.biquad_state()
    _, y = iir.biquad_apply(s, jnp.asarray(x), jnp.asarray([b]), jnp.asarray([a]))
    ref = scipy_signal.lfilter(b, a, x)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_biquad_cascade_streaming():
    b1, a1 = fd.biquad_rbj(2000.0, 0.707, 24000.0, "lowpass")
    b2, a2 = fd.biquad_rbj(1000.0, 5.0, 24000.0, "notch")
    b = jnp.asarray(np.stack([b1, b2]))
    a = jnp.asarray(np.stack([a1, a2]))
    x = RNG.standard_normal(256).astype(np.float32)
    s = iir.biquad_state(stages=2)
    s, y1 = iir.biquad_apply(s, jnp.asarray(x[:128]), b, a)
    _, y2 = iir.biquad_apply(s, jnp.asarray(x[128:]), b, a)
    _, yall = iir.biquad_apply(iir.biquad_state(stages=2), jnp.asarray(x), b, a)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(yall),
                               rtol=1e-4, atol=1e-5)
    ref = iir.biquad_reference(x, np.stack([b1, b2]), np.stack([a1, a2]))
    np.testing.assert_allclose(np.asarray(yall), ref, rtol=1e-3, atol=1e-4)


def test_one_pole_dc_block_removes_dc():
    x = RNG.standard_normal(2048).astype(np.float32) + 5.0
    _, y = iir.one_pole_dc_block(jnp.zeros(()), jnp.asarray(x))
    assert abs(np.mean(np.asarray(y)[500:])) < 0.1
