"""Pallas kernel parity tests (interpreter mode; compiled-mode runs on
the real chip via bench --pallas)."""

import jax.numpy as jnp
import numpy as np

from t41x.dsp import firdesign as fd, osfilter
from t41x.kernels import os_filter_matmul_pallas

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


def test_agc_block_pallas_matches_scan_path():
    """The whole-block AGC kernel (prework + recurrence + gain fused) —
    the production path agc_apply takes when N >= attack_buffsize."""
    import jax

    from t41x.dsp import agc as A
    from t41x.kernels.agc_pallas import agc_block_pallas

    p = A.agc_params(2)
    rng = np.random.default_rng(7)
    ch, n = 5, 256   # deliberately not a whole (8, 128) tile
    st = jax.tree.map(jnp.asarray, A.agc_state(p, (ch,)))
    x = (rng.standard_normal((ch, n))
         + 1j * rng.standard_normal((ch, n))).astype(np.complex64)

    st_s = st_p = st
    for _ in range(3):  # stream several blocks to exercise the carry
        st_s, y_s = A.agc_apply(p, st_s, jnp.asarray(x))
        st_p, y_p = agc_block_pallas(p, st_p, jnp.asarray(x),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=1e-6, atol=1e-7)
    for f in st_s._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, f)), np.asarray(getattr(st_s, f)),
            rtol=1e-6, atol=1e-7, err_msg=f)


def test_agc_block_pallas_rejects_short_blocks():
    import jax
    import pytest

    from t41x.dsp import agc as A
    from t41x.kernels.agc_pallas import agc_block_pallas

    p = A.agc_params(2)
    st = jax.tree.map(jnp.asarray, A.agc_state(p, (2,)))
    x = jnp.zeros((2, p.attack_buffsize // 2), jnp.complex64)
    with pytest.raises(ValueError, match="attack_buffsize"):
        agc_block_pallas(p, st, x, interpret=True)


def test_agc_scan_pallas_short_block_path():
    """N < attack_buffsize routes agc_apply(use_pallas=True) through the
    recurrence-only kernel (agc_scan_pallas) — keep it covered."""
    import jax

    from t41x.dsp import agc as A

    p = A.agc_params(2)
    assert p.attack_buffsize > 64
    rng = np.random.default_rng(11)
    ch, n = 5, 64    # n < attack_buffsize=96 -> scan-pallas branch
    st = jax.tree.map(jnp.asarray, A.agc_state(p, (ch,)))
    x = (rng.standard_normal((ch, n))
         + 1j * rng.standard_normal((ch, n))).astype(np.complex64)

    st_s = st_p = st
    for _ in range(4):
        st_s, y_s = A.agc_apply(p, st_s, jnp.asarray(x))
        st_p, y_p = A.agc_apply(p, st_p, jnp.asarray(x), use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=1e-6, atol=1e-7)
    for f in st_s._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, f)), np.asarray(getattr(st_s, f)),
            rtol=1e-6, atol=1e-7, err_msg=f)


def test_xanr_pallas_matches_scan_path():
    import jax

    from t41x.dsp import nr as NR
    from t41x.kernels.xanr_pallas import xanr_block_pallas

    rng = np.random.default_rng(9)
    ch, n = 7, 256   # not a whole (8, 128) tile
    x = rng.standard_normal((ch, n)).astype(np.float32) * 0.2
    for notch in (False, True):
        p = NR.XanrParams(notch=notch)
        st_s = jax.tree.map(jnp.asarray, NR.xanr_state(p, (ch,)))
        st_p = st_s
        for _ in range(3):  # carry crosses block boundaries
            st_s, y_s = NR.xanr(p, st_s, jnp.asarray(x))
            st_p, y_p = xanr_block_pallas(p, st_p, jnp.asarray(x),
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"notch={notch}")
        for f in st_s._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(st_p, f)), np.asarray(getattr(st_s, f)),
                rtol=1e-5, atol=1e-6, err_msg=f"{f} notch={notch}")


def test_sam_pallas_matches_scan_path():
    import jax

    from t41x.demod import sam as S
    from t41x.kernels.sam_pallas import sam_block_pallas

    rng = np.random.default_rng(13)
    ch, n = 9, 256
    p = S.sam_params()
    t = np.arange(3 * n) / 24000.0
    carrier = np.exp(2j * np.pi * 120.0 * t) * (1.0 + 0.4 * np.cos(
        2 * np.pi * 400.0 * t))
    y = (carrier[None] * (0.5 + 0.5 * rng.random((ch, 1)))
         + 0.01 * (rng.standard_normal((ch, 3 * n))
                   + 1j * rng.standard_normal((ch, 3 * n)))
         ).astype(np.complex64)
    st_s = jax.tree.map(jnp.asarray, S.sam_state((ch,)))
    st_p = st_s
    for b in range(3):
        blk = jnp.asarray(y[:, b * n:(b + 1) * n])
        st_s, a_s, c_s = S.sam_demod(p, st_s, blk)
        st_p, a_p, c_p = S.sam_demod(p, st_p, blk, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s),
                               rtol=1e-5, atol=1e-4)
    for f in st_s._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, f)), np.asarray(getattr(st_s, f)),
            rtol=1e-5, atol=1e-5, err_msg=f)


def test_kim_gains_pallas_matches_xla_path():
    """Both hops' Kim gain recursions in one Pallas program (ring
    rewrites in VMEM) — matches the chained _kim_gain XLA path over
    streamed blocks, across the 15-slot ring wraparound."""
    import jax

    from t41x.dsp import nr as NR

    p = NR.kim_params(200.0, 3000.0)
    rng = np.random.default_rng(23)
    ch, blocks = 5, 9   # 18 hops > 15-slot ring
    st_s = jax.tree.map(jnp.asarray, NR.kim_state((ch,)))
    st_p = st_s
    for bi in range(blocks):
        x = rng.standard_normal((ch, 256)).astype(np.float32) * 0.3
        st_s, y_s = NR.kim_nr(p, st_s, jnp.asarray(x))
        st_p, y_p = NR.kim_nr(p, st_p, jnp.asarray(x), use_pallas=True)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"block {bi}")
    for f in st_s._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, f)), np.asarray(getattr(st_s, f)),
            rtol=1e-5, atol=1e-6, err_msg=f)


def test_fused_interp_matches_fir_interpolate():
    """FusedInterp (x2+x4+volume in one program) vs the streaming
    fir.fir_interpolate pair, multi-block with carried histories."""
    import jax

    from t41x import constants as C
    from t41x.dsp import fir, firdesign as fd
    from t41x.kernels.interp_pallas import FusedInterp

    h1, h2 = fd.interpolation_prototypes(3000.0)
    ch, blocks, n = 5, 4, 256
    fi = FusedInterp(h1, h2)
    rng = np.random.default_rng(3)
    xs = rng.standard_normal((blocks, ch, n)).astype(np.float32) * 0.4
    vol = np.linspace(0.5, 2.0, ch).astype(np.float32)

    i1 = np.zeros((ch, fi.sub1 - 1), np.float32)
    i2 = np.zeros((ch, fi.sub2 - 1), np.float32)
    i1f, i2f = jnp.asarray(i1), jnp.asarray(i2)
    ap = jax.jit(fi.apply)
    for b in range(blocks):
        x = jnp.asarray(xs[b])
        # reference: two streaming convs then the scale
        i1, a = fir.fir_interpolate(i1, x, jnp.asarray(
            h1.astype(np.float32)), C.DF2)
        i2, a = fir.fir_interpolate(i2, a, jnp.asarray(
            h2.astype(np.float32)), C.DF1)
        ref = np.asarray(a) * vol[:, None]
        i1f, i2f, y = ap(x, i1f, i2f, jnp.asarray(vol))
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5,
                                   atol=2e-6, err_msg=f"block {b}")
        np.testing.assert_allclose(np.asarray(i1f), np.asarray(i1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(i2f), np.asarray(i2),
                                   rtol=2e-5, atol=2e-6)
