"""FT8 LDPC(174,91) belief-propagation decoder (JAX, device side).

Re-expression of the reference's `bp_decode` (tmr4/T41_SDR
`ft8.cpp:518-596`) as fixed-iteration, candidate-batched message passing:
where the reference runs up to 10 sequential iterations per candidate
with early exit, t41x runs all candidates' decoders in parallel as one
vectorized min-sum/tanh BP over the (83-check, 174-var) graph, tracking
the best (fewest parity errors) hard decision across iterations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from t41x.decode.ft8.tables import H, M, N, NM, NRW

MAX_CHECK_DEGREE = 7

# check -> variable adjacency, 0-padded, with validity mask
_nm = np.zeros((M, MAX_CHECK_DEGREE), np.int32)
_nm_mask = np.zeros((M, MAX_CHECK_DEGREE), bool)
for _m in range(M):
    for _i in range(NRW[_m]):
        _nm[_m, _i] = NM[_m][_i] - 1
        _nm_mask[_m, _i] = True

NM0 = jnp.asarray(_nm)
NM_MASK = jnp.asarray(_nm_mask)
H_DENSE = jnp.asarray(H.astype(np.float32))


class BPResult(NamedTuple):
    bits: jnp.ndarray    # (..., 174) best hard decision
    errors: jnp.ndarray  # (...,) parity errors of that decision


def _parity_errors(bits: jnp.ndarray) -> jnp.ndarray:
    syn = jnp.mod(bits.astype(jnp.float32) @ H_DENSE.T, 2.0)
    return jnp.sum(syn, axis=-1).astype(jnp.int32)


def bp_decode(llr: jnp.ndarray, iters: int = 25) -> BPResult:
    """llr: (..., 174) log(p(1)/p(0)) per codeword bit.

    Sum-product BP with per-iteration best-decision tracking; batched
    over leading dims.
    """
    llr = jnp.asarray(llr, jnp.float32)
    batch = llr.shape[:-1]

    # messages check->variable, stored per (check, slot)
    tov = jnp.zeros(batch + (M, MAX_CHECK_DEGREE), jnp.float32)

    def var_llr(tov):
        """Total LLR per variable = channel + sum of incoming check msgs."""
        upd = jnp.zeros(batch + (N,), jnp.float32)
        contrib = jnp.where(NM_MASK, tov, 0.0)
        upd = upd.at[..., NM0].add(contrib)
        return llr + upd

    def step(carry, _):
        tov, best_bits, best_err = carry
        total = var_llr(tov)
        # variable->check messages: total minus this check's contribution
        v2c = total[..., NM0] - jnp.where(NM_MASK, tov, 0.0)
        # check->variable: tanh rule over the other edges
        t = jnp.tanh(-0.5 * jnp.clip(v2c, -20.0, 20.0))
        t = jnp.where(NM_MASK, t, 1.0)
        prod = jnp.prod(t, axis=-1, keepdims=True)
        t_safe = jnp.where(jnp.abs(t) < 1e-7, jnp.sign(t) * 1e-7 + 1e-12, t)
        others = prod / t_safe
        others = jnp.clip(others, -0.999999, 0.999999)
        new_tov = jnp.where(NM_MASK, -2.0 * jnp.arctanh(others), 0.0)

        total = var_llr(new_tov)
        bits = (total > 0).astype(jnp.float32)
        err = _parity_errors(bits)
        better = err < best_err
        best_bits = jnp.where(better[..., None], bits, best_bits)
        best_err = jnp.minimum(err, best_err)
        return (new_tov, best_bits, best_err), None

    bits0 = (llr > 0).astype(jnp.float32)
    err0 = _parity_errors(bits0)
    (tov, bits, err), _ = jax.lax.scan(
        step, (tov, bits0, err0), None, length=iters)
    return BPResult(bits.astype(jnp.uint8), err)
