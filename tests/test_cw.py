"""CW detection + Morse text decode, end to end through the RX chain."""

import numpy as np

from t41x import constants as C
from t41x.chain import ChainSpec, RxChain
from t41x.decode import cw_text
from t41x.demod import cw as cw_mod
from t41x.io import signals


def test_cw_detector_finds_keying():
    det = cw_mod.CWDetector()
    st = det.init_state()
    rate = C.AUDIO_RATE
    n = 256 * 40
    t = np.arange(n) / rate
    env = (np.sin(2 * np.pi * 5.0 * t) > 0).astype(np.float32)
    audio = 0.5 * env * np.sin(2 * np.pi * 750.0 * t).astype(np.float32)
    keyed = []
    for i in range(n // 256):
        st, k, c = det.block(st, audio[i * 256:(i + 1) * 256])
        keyed.append(bool(k))
    keyed = np.asarray(keyed)
    # keying should toggle roughly with the 5 Hz envelope
    assert keyed.any() and (~keyed).any()
    # majority agreement with the envelope at block resolution
    env_blocks = env.reshape(-1, 256).mean(1) > 0.5
    agreement = (keyed == env_blocks).mean()
    assert agreement > 0.8, agreement


def test_morse_decoder_clean_envelope():
    text = "CQ CQ DE T41"
    env = signals.cw_keying_envelope(
        signals.text_to_morse_pattern(text), 18.0,
        int(15 * C.AUDIO_RATE), fs=C.AUDIO_RATE) > 0.5
    blocks = env[: len(env) // 256 * 256].reshape(-1, 256).mean(1) > 0.5
    got = cw_text.decode_envelope(blocks)
    assert got.replace(" ", "") == text.replace(" ", ""), got


def test_cw_end_to_end_chain_decode():
    text = "CQ TEST"
    wpm = 18.0
    n_blocks = 440  # ~4.7 s: the full message at 18 wpm
    n = n_blocks * C.BLOCK_SIZE
    iq = signals.cw_signal(text, wpm, n, tone_offset=750.0) * 0.5
    chain = RxChain(ChainSpec(mode="cw", f_lo=200.0, f_hi=3000.0,
                              interpolate_out=False, agc_mode=0))
    out = chain.run(np.asarray(iq))
    keyed = np.asarray(out["cw_keyed"]).astype(bool)
    got = cw_text.decode_envelope(keyed)
    assert got.replace(" ", "") == text.replace(" ", ""), (got, keyed.sum())
