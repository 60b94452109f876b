"""Complex-safe jit boundaries for backends without complex buffers.

TPUs have no native complex arithmetic — XLA decomposes complex ops into
real pairs — and some TPU runtimes (the remote `axon` backend this
machine benches on) go further: executables whose *argument or result
buffers* are complex64 fail at execution with UNIMPLEMENTED, while the
same math with real-valued buffers and in-graph `r + 1j*i` construction
runs fine.

This module makes that robust framework-wide: `csplit`/`cjoin` convert a
pytree's complex leaves to/from `CPair(re, im)` float pairs, and
`cjit(fn)` wraps a function so its jit boundary carries only real
buffers while the body still uses ordinary complex jnp code:

    enc_state = creal.csplit(chain.init_state(ch))   # host, numpy
    step = creal.cjit(chain.block)                    # complex inside
    enc_state, out = step(params, enc_state, creal.csplit(iq))
    audio = out["audio_24k"]                          # real leaves pass
    spectrum = creal.cjoin(out)                       # decode any CPairs

State pytrees can stay encoded across calls — only decode what you read.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import numpy as np


class CPair(NamedTuple):
    """A complex array split into float re/im leaves (a pytree node)."""
    re: Any
    im: Any


def _is_cpair(x) -> bool:
    return isinstance(x, CPair)


def csplit(tree):
    """Replace complex leaves with CPair(re, im).  Host-side: numpy in,
    numpy out (no device transfer)."""
    def enc(x):
        if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.complexfloating):
            x = np.asarray(x)
            return CPair(np.ascontiguousarray(x.real),
                         np.ascontiguousarray(x.imag))
        return x
    return jax.tree.map(enc, tree)


def cjoin(tree):
    """Inverse of csplit.  Fetches device leaves to host (numpy)."""
    def dec(n):
        if _is_cpair(n):
            return np.asarray(n.re) + 1j * np.asarray(n.im)
        return np.asarray(n) if hasattr(n, "dtype") else n
    return jax.tree.map(dec, tree, is_leaf=_is_cpair)


def join_ingraph(tree):
    """CPair leaves -> complex jnp arrays (inside a traced function)."""
    import jax.numpy as jnp

    def dec(n):
        if _is_cpair(n):
            return (n.re + 1j * n.im).astype(jnp.complex64)
        return n
    return jax.tree.map(dec, tree, is_leaf=_is_cpair)


def split_ingraph(tree):
    """Complex jnp leaves -> CPair (inside a traced function)."""
    import jax.numpy as jnp

    def enc(x):
        if hasattr(x, "dtype") and jnp.iscomplexobj(x):
            return CPair(jnp.real(x), jnp.imag(x))
        return x
    return jax.tree.map(enc, tree)


def cjit(fn, **jit_kwargs):
    """jit with a complex-free buffer boundary.

    The returned callable takes/returns pytrees whose complex content is
    CPair-encoded (use `csplit` on initial inputs, `cjoin` on outputs you
    want as complex numpy).  Inside, `fn` sees ordinary complex arrays.
    """
    @functools.wraps(fn)
    def wrapper(*args):
        out = fn(*join_ingraph(args))
        return split_ingraph(out)

    return jax.jit(wrapper, **jit_kwargs)
