"""MXU matmul-DFT kernels vs numpy FFT (reference FFT call sites use
`arm_cfft_f32`/`arm_rfft_q15`; on TPU runtimes without an FFT HLO every
transform in the framework lowers to these matmul DFTs)."""

import numpy as np
import pytest

from t41x.kernels import mxu_fft


@pytest.mark.parametrize("n", [32, 256, 512, 1024, 2048])
def test_fft_matmul_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
         ).astype(np.complex64)
    ref = np.fft.fft(x, axis=-1)
    got = np.asarray(mxu_fft.fft_matmul(x))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize("n", [256, 512, 2048])
def test_ifft_matmul_roundtrip(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    back = np.asarray(mxu_fft.ifft_matmul(mxu_fft.fft_matmul(x)))
    assert np.max(np.abs(back - x)) < 1e-5
    ref = np.fft.ifft(x, axis=-1)
    got = np.asarray(mxu_fft.ifft_matmul(x))
    assert np.max(np.abs(got - ref)) < 1e-6


def test_rfft_padded_matches_numpy():
    rng = np.random.default_rng(7)
    r = rng.standard_normal((4, 1600)).astype(np.float32)
    ref = np.fft.rfft(r, n=2048, axis=-1)
    got = np.asarray(mxu_fft.fft_matmul(
        np.pad(r, ((0, 0), (0, 448))).astype(np.complex64))[..., :1025])
    assert np.max(np.abs(got - ref)) < 1e-3  # abs scale ~1e3 bins


def test_dispatch_on_cpu_uses_exact_fft():
    # under the test harness the backend is CPU -> jnp.fft path
    x = (np.arange(512) % 7).astype(np.complex64)[None]
    got = np.asarray(mxu_fft.fft(x))
    assert np.allclose(got, np.fft.fft(x, axis=-1), atol=1e-3)


def test_factor_near_square():
    for n in (256, 512, 1024, 2048):
        n1, n2 = mxu_fft._factor(n)
        assert n1 * n2 == n and n1 > 1
