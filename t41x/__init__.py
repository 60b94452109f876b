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
