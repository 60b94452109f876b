"""t41x — TPU-native software-defined-radio framework.

A from-scratch JAX/XLA/Pallas re-expression of the signal-processing
capabilities of the T41-EP software-defined transceiver (reference:
tmr4/T41_SDR, a Teensy 4.1 C++ firmware).  Where the reference runs one
receiver on one 600 MHz core, t41x runs thousands of channelized
receivers as a pure, jitted, shardable streaming dataflow:

    (params, state, iq_block) -> (state', audio_block, taps)

scanned over time and vmapped/shard_mapped over channels on a TPU mesh.

Top-level API (lazy imports keep `import t41x` light):
    t41x.Radio, t41x.RadioConfig — the user-facing radio
    t41x.RxChain, t41x.ChainSpec — the compiled receive chain
"""

from t41x import constants
from t41x.version import __version__

# Audio-accurate matmuls by default: XLA:TPU's DEFAULT precision rounds
# f32 matmul operands to bf16 (8-bit mantissa), which silently costs
# the audio chain ~60 dB of SNR — measured round 5 at 1024 ch, fused
# chain audio parity vs the CPU chain: 48.9 dB with the XLA default,
# 92.3 dB with "high" (3-pass), 125.6 dB with "highest" (6-pass), vs
# the 55 dB audio budget every parity test enforces.  "high" buys 37 dB
# of margin at ~1% of the block budget, "highest" another 33 dB at
# ~25% — so the library default is "high"; users needing bit-level
# reproducibility can set "highest" themselves (an explicit user
# setting is respected).  The Pallas kernels pin their own dot
# precision (frontend_pallas.DOT_PRECISION) and ignore this config;
# `bench.py --check` re-verifies the whole stack on every benched chip.
import jax as _jax

if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "high")

__all__ = ["constants", "__version__", "Radio", "RadioConfig",
           "RxChain", "ChainSpec"]


def __getattr__(name):
    if name == "Radio":
        from t41x.radio import Radio
        return Radio
    if name == "RadioConfig":
        from t41x.config import RadioConfig
        return RadioConfig
    if name in ("RxChain", "ChainSpec"):
        from t41x import chain
        return getattr(chain, name)
    raise AttributeError(name)
