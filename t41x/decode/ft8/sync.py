"""FT8 Costas sync search (JAX, device side).

Re-expression of the reference's `find_sync` (tmr4/T41_SDR
`ft8.cpp:337-422`) as a fully vectorized score tensor: instead of the
reference's triple loop + min-heap of 20 candidates, the sync score
  score(dt, ts, fs, df) = mean over the 21 sync symbols of
                          (8*P[tone] - sum_j P[j])
is computed for ALL (time offset, time_sub, freq_sub, freq offset)
at once, and candidates come from one `jax.lax.top_k` — better than the
reference's heap because no minimum-score pre-filter is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from t41x.decode.ft8.tables import COSTAS, NN


class Candidates(NamedTuple):
    score: jnp.ndarray       # (K,)
    time_offset: jnp.ndarray  # (K,) symbol slots (may be negative)
    time_sub: jnp.ndarray
    freq_sub: jnp.ndarray
    freq_offset: jnp.ndarray  # (K,) 6.25 Hz bins


def sync_scores(wf: jnp.ndarray, max_time_pad: int = 7):
    """wf: (n_slots, 2, 2, n_bins) waterfall in dB.
    Returns scores (n_dt, 2, 2, n_df) where dt index 0 corresponds to
    time_offset = -max_time_pad and df spans bins 0..n_bins-8."""
    n_slots, _, _, n_bins = wf.shape
    pad = max_time_pad
    # pad time with very low power so out-of-range sync symbols score 0
    wfp = jnp.pad(wf, ((pad, pad + NN), (0, 0), (0, 0), (0, 0)),
                  constant_values=jnp.nan)

    n_dt = n_slots - NN + 2 * pad + 1
    n_df = n_bins - 8

    sym_offsets = np.asarray([m + k for m in (0, 36, 72) for k in range(7)])
    tone_of_sym = np.asarray([COSTAS[k] for _ in (0, 36, 72)
                              for k in range(7)])

    dts = jnp.arange(n_dt)
    # gather P for all sync symbols: (n_dt, 21, 2, 2, n_bins)
    slot_idx = dts[:, None] + jnp.asarray(sym_offsets)[None, :]
    P = wfp[slot_idx]                     # (n_dt, 21, 2, 2, n_bins)

    dfs = jnp.arange(n_df)
    # power at the expected Costas tone bin, for every df at once
    p_tone = jnp.take_along_axis(
        P[..., None, :],                                  # (dt,21,2,2,1,B)
        (dfs[None, None, None, None, :, None]
         + jnp.asarray(tone_of_sym)[None, :, None, None, None, None]),
        axis=-1)[..., 0]                                  # (dt,21,2,2,n_df)

    # sum of the 8 bins starting at df
    csum = jnp.cumsum(
        jnp.pad(P, ((0, 0), (0, 0), (0, 0), (0, 0), (1, 0))), axis=-1)
    p_sum8 = (csum[..., 8:] - csum[..., :-8])[..., :n_df]  # (dt,21,2,2,n_df)

    per_sym = 8.0 * p_tone - p_sum8
    valid = ~jnp.isnan(per_sym)
    per_sym = jnp.where(valid, per_sym, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return jnp.sum(per_sym, axis=1) / n_valid  # (n_dt, 2, 2, n_df)


def top_candidates(scores: jnp.ndarray, k: int = 20,
                   max_time_pad: int = 7) -> Candidates:
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    n_dt, nts, nfs, n_df = scores.shape
    dt = idx // (nts * nfs * n_df) - max_time_pad
    rem = idx % (nts * nfs * n_df)
    ts = rem // (nfs * n_df)
    rem = rem % (nfs * n_df)
    fs = rem // n_df
    df = rem % n_df
    return Candidates(vals, dt, ts, fs, df)


def find_candidates(wf: jnp.ndarray, k: int = 20) -> Candidates:
    """Waterfall -> top-k sync candidates (jit-friendly end to end)."""
    return top_candidates(sync_scores(wf), k)
