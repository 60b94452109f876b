"""Pallas kernel parity tests (interpreter mode; compiled-mode runs on
the real chip via bench --pallas)."""

import jax.numpy as jnp
import numpy as np

from t41x import constants as C
from t41x.dsp import fir, firdesign as fd, osfilter
from t41x.kernels import os_filter_matmul_pallas
from t41x.kernels.decimate_pallas import FusedDecimator

RNG = np.random.default_rng(5)


def test_os_filter_pallas_matches_matmul_path():
    mask = fd.bandpass_mask(200.0, 3000.0)
    W = jnp.asarray(osfilter.os_matmul_operator(mask))
    x = (RNG.standard_normal((8, 256))
         + 1j * RNG.standard_normal((8, 256))).astype(np.complex64)
    s = jnp.asarray(osfilter.os_state((8,)))
    s2, y2 = osfilter.os_filter_matmul(s, jnp.asarray(x), W)
    sp, yp = os_filter_matmul_pallas(s, jnp.asarray(x), W, interpret=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y2),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(s2))


def test_fused_decimator_matches_reference_path():
    h1, h2 = fd.decimation_prototypes()
    dec = FusedDecimator(h1, h2, interpret=True)
    x = (RNG.standard_normal((128, C.BLOCK_SIZE))
         + 1j * RNG.standard_normal((128, C.BLOCK_SIZE))
         ).astype(np.complex64)
    st = dec.init_state((128,))
    ys = []
    for _ in range(2):
        st, y = dec.block(st, jnp.asarray(x))
        ys.append(np.asarray(y))
    s1 = fir.fir_state(len(h1), (128,), np.complex64)
    s2 = fir.fir_state(len(h2), (128,), np.complex64)
    yr = []
    for _ in range(2):
        s1, m = fir.fir_decimate(s1, jnp.asarray(x),
                                 jnp.asarray(h1.astype(np.float32)), 4)
        s2, yy = fir.fir_decimate(s2, m,
                                  jnp.asarray(h2.astype(np.float32)), 2)
        yr.append(np.asarray(yy))
    np.testing.assert_allclose(np.concatenate(ys, 1),
                               np.concatenate(yr, 1), rtol=1e-3, atol=1e-4)
