"""Noise blanker and locator tests."""

import jax.numpy as jnp
import numpy as np

from t41x.decode import locator
from t41x.dsp import nb


def test_noise_blanker_removes_impulses_keeps_signal():
    rng = np.random.default_rng(0)
    n = 256
    t = np.arange(n) / 24000
    clean = np.sin(2 * np.pi * 700 * t).astype(np.float32)
    x = clean.copy()
    x[60] += 8.0
    x[61] -= 4.0
    x[180] += 6.0
    y = np.asarray(nb.noise_blanker(jnp.asarray(x)))
    # impulses removed
    assert abs(y[60] - clean[60]) < 0.5, y[60]
    assert abs(y[180] - clean[180]) < 0.5
    # clean samples untouched
    np.testing.assert_allclose(y[100:150], x[100:150], atol=1e-5)
    # error vs clean much smaller than before
    err_in = np.abs(x - clean).max()
    err_out = np.abs(y - clean).max()
    assert err_out < err_in / 10, (err_in, err_out)


def test_noise_blanker_clean_passthrough():
    rng = np.random.default_rng(1)
    x = (0.3 * rng.standard_normal((2, 256))).astype(np.float32)
    y = np.asarray(nb.noise_blanker(jnp.asarray(x), thresh=6.0))
    # high threshold: nothing blanked
    frac_changed = np.mean(np.abs(y - x) > 1e-6)
    assert frac_changed < 0.1


def test_locator_roundtrip_and_distance():
    lat, lon = locator.grid_to_latlon("FN30as")
    assert 40 < lat < 41 and -75 < lon < -73  # New York
    assert locator.latlon_to_grid(lat, lon)[:4] == "FN30"
    # NYC to Helsinki-ish
    d = locator.distance_km("FN30as", "KP20eh")
    assert 6000 < d < 7200, d
    b = locator.bearing_deg("FN30as", "KP20eh")
    assert 30 < b < 60, b  # northeast-ish great circle
    assert locator.distance_km("FN30as", "FN30as") < 30
