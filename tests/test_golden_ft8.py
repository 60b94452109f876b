"""Golden FT8 decode test against an INDEPENDENT signal generator.

Every other FT8 test synthesizes its input with t41x's own encoder, so
a protocol bug shared by encoder and decoder would cancel out.  Here
the signal comes from `tests/fixtures/ft8_gen.py` — a from-scratch
second implementation (own 77-bit packer, polynomial-long-division CRC,
LDPC parity via GF(2) elimination on the parity-check system, plain
continuous-phase FSK synth) that shares nothing with `t41x.decode.ft8`
except the public protocol constants.  This is the analog of the
reference decoding a recorded WAV with known content
(`Process.cpp:278-374`, README.md:86).
"""

import numpy as np

from t41x import constants as C
from t41x.decode.ft8 import decode as ft8_decode
from t41x.decode.ft8 import crc as t41x_crc, encode as t41x_encode
from tests.fixtures import ft8_gen


def test_independent_codeword_matches_t41x_encoder():
    # same message through both encoders must yield identical tones —
    # catches a drift in either packer/CRC/LDPC/Gray stage
    for msg in ("CQ K1ABC FN42", "K1ABC W9XYZ EM77", "W9XYZ K1ABC R-08"):
        np.testing.assert_array_equal(
            ft8_gen.tones(msg), np.asarray(t41x_encode.encode(msg)),
            err_msg=msg)


def test_independent_crc_against_t41x():
    rng = np.random.default_rng(3)
    for _ in range(10):
        bits = rng.integers(0, 2, 77).astype(np.uint8)
        padded = np.concatenate([bits, np.zeros(5, np.uint8)])
        mine = ft8_gen.crc14(padded)       # 14-bit array, MSB first
        val = int("".join(map(str, mine)), 2)
        assert val == t41x_crc.crc14(padded)


def test_decode_independent_clean_signal():
    msg = "CQ K1ABC FN42"
    audio = ft8_gen.synth(msg, base_freq=1100.0, rate=C.AUDIO_RATE)
    slot = np.zeros(int(14 * C.AUDIO_RATE), np.float32)
    start = int(0.8 * C.AUDIO_RATE)
    slot[start: start + len(audio)] = audio
    decoded = ft8_decode.decode_audio(slot)
    assert any(d.text == msg for d in decoded), [d.text for d in decoded]
    hit = next(d for d in decoded if d.text == msg)
    assert abs(hit.freq_hz - 1100.0) < 7.0


def test_decode_independent_noisy_signal():
    msg = "K1ABC W9XYZ EM77"
    audio = ft8_gen.synth(msg, base_freq=900.0, rate=C.AUDIO_RATE, amp=0.1)
    rng = np.random.default_rng(11)
    slot = (0.18 * rng.standard_normal(int(14 * C.AUDIO_RATE))
            ).astype(np.float32)
    start = int(1.1 * C.AUDIO_RATE)
    slot[start: start + len(audio)] += audio
    decoded = ft8_decode.decode_audio(slot)
    assert any(d.text == msg for d in decoded), [d.text for d in decoded]
