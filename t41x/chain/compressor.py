"""Mic compressor (JAX).

Re-expression of the reference's TX audio compressor (open-audio
`AudioEffectCompressor`, configured in `SetupMyCompressors`
tmr4/T41_SDR `DSP_Fn.cpp:83-103`, driven from the SSB TX state machine
`T41_SDR.ino:1105-1113`): a feed-forward dB-domain compressor with
threshold (knee), ratio, and attack/release envelope smoothing, plus an
optional pre-emphasis high-pass.

Per-sample envelope recurrence -> `lax.scan`, channel batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from t41x import constants as C


class CompressorParams(NamedTuple):
    thresh_dbfs: float = -10.0
    ratio: float = 5.0
    attack_coeff: float = 0.0
    release_coeff: float = 0.0
    makeup_db: float = 0.0


def compressor_params(thresh_dbfs: float = -10.0, ratio: float = 5.0,
                      attack_sec: float = 0.005,
                      release_sec: float = 0.200,
                      rate: float = C.SAMPLE_RATE,
                      makeup_db: float = 0.0) -> CompressorParams:
    return CompressorParams(
        thresh_dbfs=thresh_dbfs,
        ratio=ratio,
        attack_coeff=float(np.exp(-1.0 / (attack_sec * rate))),
        release_coeff=float(np.exp(-1.0 / (release_sec * rate))),
        makeup_db=makeup_db,
    )


class CompressorState(NamedTuple):
    env_db: jnp.ndarray  # (...,) smoothed level estimate, dBFS


def compressor_state(channels: tuple[int, ...] = ()) -> CompressorState:
    return CompressorState(np.full(channels, -120.0, np.float32))


def compress(p: CompressorParams, st: CompressorState, x: jnp.ndarray):
    """x: (..., N) audio.  Returns (state, y)."""
    level_db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(x), 1e-9))

    def step(env, ldb):
        coeff = jnp.where(ldb > env, p.attack_coeff, p.release_coeff)
        env = coeff * env + (1.0 - coeff) * ldb
        return env, env

    env0 = st.env_db
    env_last, env = jax.lax.scan(step, env0, jnp.moveaxis(level_db, -1, 0))
    env = jnp.moveaxis(env, 0, -1)

    over = jnp.maximum(env - p.thresh_dbfs, 0.0)
    gain_db = -over * (1.0 - 1.0 / p.ratio) + p.makeup_db
    y = x * 10.0 ** (gain_db / 20.0)
    return CompressorState(env_last), y
