"""Golden decode tests for CW and PSK31 against INDEPENDENT generators
(VERDICT r2 item 7).

The other CW/PSK31 tests synthesize with t41x's own encoders
(`signals.cw_signal`, `psk31.synth_psk31`), so shared encode/decode
drift would cancel.  These signals come from `tests/fixtures/cw_gen.py`
and `tests/fixtures/psk31_gen.py` — separate Morse/varicode
representations, separate timing/shaping engines — the analog of the
reference decoding a recorded WAV with known content
(`Process.cpp:278-374`)."""

import numpy as np

from t41x import constants as C
from t41x.chain import ChainSpec, RxChain
from t41x.decode import cw_text, psk31
from tests.fixtures import cw_gen, psk31_gen


def _cw_decode(iq: np.ndarray) -> str:
    chain = RxChain(ChainSpec(mode="cw", f_lo=200.0, f_hi=3000.0,
                              interpolate_out=False, agc_mode=0))
    n = (len(iq) // C.BLOCK_SIZE) * C.BLOCK_SIZE
    out = chain.run(np.asarray(iq[:n]))
    return cw_text.decode_envelope(np.asarray(out["cw_keyed"]).astype(bool))


def test_cw_decodes_independent_clean_keying():
    text = "CQ TEST W1AW"
    iq = cw_gen.synth_iq(text, wpm=18.0) * 1.0
    got = _cw_decode(iq)
    assert got.replace(" ", "") == text.replace(" ", ""), got


def test_cw_decodes_independent_jittered_fist():
    """8% per-element timing jitter — a human fist; the decoder's
    adaptive histograms (reference `DoSignalHistogram`,
    `CWProcessing.cpp:759`) must absorb it."""
    # classic VVV training prefix gives the histograms time to settle
    text = "VVV VVV CQ DE N0T41"
    iq = cw_gen.synth_iq(text, wpm=15.0, jitter=0.08, seed=5)
    got = _cw_decode(iq).replace(" ", "")
    assert got.endswith("CQDEN0T41"), got


def test_psk31_decodes_independent_signal():
    text = "CQ DE T41X"
    iq = psk31_gen.synth_iq(text, tone_hz=1000.0)
    n = (len(iq) // C.BLOCK_SIZE) * C.BLOCK_SIZE
    chain = RxChain(ChainSpec(mode="psk31", interpolate_out=False))
    out = chain.run(np.asarray(iq[:n]))
    got = psk31.decode_capture(np.asarray(out["iq_baseband"]),
                               tone_hz=1000.0)
    assert text in got, got


def test_psk31_independent_bitstreams_match_t41x():
    """Same text through both varicode transcriptions must produce the
    same bit stream (catches a drift in either table)."""
    text = "Hello, PSK31? 73!"
    mine = psk31_gen.bitstream(text, idle=32)
    t41x_bits = psk31.encode_psk31(text)
    np.testing.assert_array_equal(np.asarray(mine),
                                  np.asarray(t41x_bits))
