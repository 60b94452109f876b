"""MXU-native FFT: four-step (Cooley-Tukey) DFT as two dense matmuls.

Some TPU runtimes do not lower `jnp.fft.*` (the experimental platforms
expose no FFT HLO).  Every transform in this framework is small and
fixed-size (256/512/2048 points) and batched over thousands of channels
-- exactly the regime where a dense-matmul DFT *is* the right TPU
program: the work lands on the MXU as (batch, N1) x (N1, N1) and
(batch, N2) x (N2, N2) complex matmuls instead of a memory-bound
butterfly network.  Matmul precision inherits the library default
(t41x pins jax_default_matmul_precision="high", 3-pass — measured
full-chain audio parity 89-93 dB vs the 55 dB budget with every DFT on
this path; bench.py --check re-verifies on each benched chip).

Factorization N = N1*N2 (four-step / Bailey):

    X[N1*k2 + k1] = sum_{n2} W_N^(n2 k1) * DFT_N2[k2,n2]
                    * sum_{n1} x[N2*n1 + n2] * DFT_N1[k1,n1]

i.e. reshape to (N1, N2), DFT columns, twiddle, DFT rows, transpose.
FLOPs: O(N*(N1+N2)) vs O(N^2) for a single-matmul DFT -- for N=2048
(64x32) that is ~21x fewer.  Results match `np.fft` to ~1e-6
relative at 3-pass precision (the library default).

The public `fft/ifft/rfft` wrappers dispatch: `jnp.fft` on CPU (exact,
and faster for unit tests), matmul DFT on any accelerator backend.

Used by: dsp/osfilter.py, dsp/spectrum.py, dsp/nr.py,
mesh/channelizer.py, decode/ft8/waterfall.py (reference FFT call sites
`Process.cpp:535,595`, `FFT.cpp:105`, `Noise.cpp:151`, `ft8.cpp:241`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PREC = None  # inherit jax_default_matmul_precision


def _factor(n: int) -> tuple[int, int]:
    """Pick N1*N2 = n with N1 as close to sqrt(n) as possible."""
    best = (1, n)
    for n1 in range(2, int(np.sqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@functools.lru_cache(maxsize=32)
def _plan(n: int):
    """Host-side constants for an n-point DFT: (N1, N2, D1, D2, twiddle).

    D1[k1,n1] = W_N1^(k1 n1), D2[k2,n2] = W_N2^(k2 n2),
    tw[k1,n2] = W_N^(k1 n2).  complex64, built in float64.
    """
    n1, n2 = _factor(n)
    w = lambda m: np.exp(-2j * np.pi / m)
    d1 = w(n1) ** np.outer(np.arange(n1), np.arange(n1))
    d2 = w(n2) ** np.outer(np.arange(n2), np.arange(n2))
    tw = w(n) ** np.outer(np.arange(n1), np.arange(n2))
    return n1, n2, (d1.astype(np.complex64), d2.astype(np.complex64),
                    tw.astype(np.complex64))


def fft_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """n-point DFT along the last axis via two MXU matmuls."""
    n = x.shape[-1]
    n1, n2, (d1, d2, tw) = _plan(n)
    if n1 == 1:  # prime length: single dense DFT matmul
        return jnp.einsum("...n,kn->...k", x.astype(jnp.complex64),
                          jnp.asarray(d2), precision=_PREC)
    a = x.astype(jnp.complex64).reshape(x.shape[:-1] + (n1, n2))
    # columns: B[k1,n2] = sum_n1 A[n1,n2] D1[k1,n1]
    b = jnp.einsum("...ab,ka->...kb", a, jnp.asarray(d1), precision=_PREC)
    b = b * jnp.asarray(tw)
    # rows: C[k1,k2] = sum_n2 B[k1,n2] D2[k2,n2]
    c = jnp.einsum("...kb,cb->...kc", b, jnp.asarray(d2), precision=_PREC)
    # X[N1*k2 + k1] -> transpose to (k2, k1)
    return jnp.swapaxes(c, -1, -2).reshape(x.shape[:-1] + (n,))


def ifft_matmul(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    return jnp.conj(fft_matmul(jnp.conj(x))) / n


def _use_matmul() -> bool:
    return jax.default_backend() != "cpu"


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Complex DFT along `axis`: jnp.fft on CPU, matmul DFT on TPU."""
    assert axis in (-1, x.ndim - 1), "mxu_fft supports last-axis only"
    if _use_matmul():
        return fft_matmul(x)
    return jnp.fft.fft(x, axis=-1)


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    assert axis in (-1, x.ndim - 1), "mxu_fft supports last-axis only"
    if _use_matmul():
        return ifft_matmul(x)
    return jnp.fft.ifft(x, axis=-1)


@functools.lru_cache(maxsize=8)
def _rdft_mats(n: int):
    """Dense real DFT matrices: COS[t,k] = cos(2 pi t k / n), SIN
    likewise (both symmetric, so forward and inverse share them)."""
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def rdft_pair(x: jnp.ndarray):
    """Full-length DFT of REAL input as two dense real matmuls.

    For small fixed n batched over many channels this is the
    MXU-shaped formulation: one (batch, n) x (n, n) matmul per
    component, vs the four-step path whose 16x16 factor matmuls
    utilize ~2% of the systolic array and, composed inside a larger
    graph, dominate the NR stages' cost.  Returns (Xr, Xi) with
    np.fft.fft semantics (all n bins)."""
    n = x.shape[-1]
    cos_m, sin_m = _rdft_mats(n)
    xr = jnp.matmul(x, jnp.asarray(cos_m), precision=_PREC)
    xi = -jnp.matmul(x, jnp.asarray(sin_m), precision=_PREC)
    return xr, xi


def irdft_real(xr: jnp.ndarray, xi: jnp.ndarray):
    """Real part of the inverse DFT of (Xr, Xi) — exact when the
    spectrum is conjugate-symmetric (real filter gains)."""
    n = xr.shape[-1]
    cos_m, sin_m = _rdft_mats(n)
    return (jnp.matmul(xr, jnp.asarray(cos_m), precision=_PREC)
            - jnp.matmul(xi, jnp.asarray(sin_m), precision=_PREC)) / n


def rdft_half(x: jnp.ndarray):
    """Real-input DFT, bins 0..n/2 only ((..., n/2+1) each) — half the
    matmul flops of `rdft_pair`; the upper bins are redundant for real
    input (Xr symmetric, Xi anti-symmetric)."""
    n = x.shape[-1]
    h = n // 2 + 1
    cos_m, sin_m = _rdft_mats(n)
    xr = jnp.matmul(x, jnp.asarray(cos_m[:, :h]), precision=_PREC)
    xi = -jnp.matmul(x, jnp.asarray(sin_m[:, :h]), precision=_PREC)
    return xr, xi


def irdft_half_real(xr: jnp.ndarray, xi: jnp.ndarray):
    """Real inverse DFT from the HALF spectrum (bins 0..n/2), assuming
    the implied conjugate-symmetric extension (exact when the half
    spectrum came from a real signal scaled by real gains):
    y[t] = (1/n) * sum_k w_k (Xr_k cos - Xi_k sin), w = [1, 2...2, 1]."""
    h = xr.shape[-1]
    n = 2 * (h - 1)
    cos_m, sin_m = _rdft_mats(n)
    w = np.ones((h, 1), np.float32)
    w[1:-1] = 2.0
    Cw = (w * cos_m[:h]).astype(np.float32)    # (h, n)
    Sw = (w * sin_m[:h]).astype(np.float32)
    return (jnp.matmul(xr, jnp.asarray(Cw), precision=_PREC)
            - jnp.matmul(xi, jnp.asarray(Sw), precision=_PREC)) / n


def rfft(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """Real-input DFT, first n//2+1 bins (np.fft.rfft semantics)."""
    assert axis in (-1, x.ndim - 1), "mxu_fft supports last-axis only"
    if not _use_matmul():
        return jnp.fft.rfft(x, n=n, axis=-1)
    m = x.shape[-1] if n is None else n
    if m != x.shape[-1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, m - x.shape[-1])]
        x = jnp.pad(x, pad)
    return fft_matmul(x.astype(jnp.complex64))[..., : m // 2 + 1]
