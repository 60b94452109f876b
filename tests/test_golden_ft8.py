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


def test_independent_type4_and_telemetry_match_t41x_encoder():
    # nonstandard/hashed calls (i3=4) and telemetry (0.5): independent
    # payload packers (big-int field assembly, own multiplier hash)
    # must reach the exact tone stream t41x encodes
    for msg in ("CQ PJ4/K1ABC", "<W9XYZ> PJ4/K1ABC RR73",
                "PJ4/K1ABC <W9XYZ> 73", "123456789ABCDEF012"):
        np.testing.assert_array_equal(
            ft8_gen.tones(msg), np.asarray(t41x_encode.encode(msg)),
            err_msg=msg)


def test_decode_independent_type4_cq():
    msg = "CQ PJ4/K1ABC"
    audio = ft8_gen.synth(msg, base_freq=1400.0, rate=C.AUDIO_RATE)
    slot = np.zeros(int(14 * C.AUDIO_RATE), np.float32)
    start = int(0.7 * C.AUDIO_RATE)
    slot[start: start + len(audio)] = audio
    decoded = ft8_decode.decode_audio(slot)
    assert any(d.text == msg for d in decoded), [d.text for d in decoded]


def test_decode_independent_telemetry():
    msg = "0DEADBEEF012345678"
    audio = ft8_gen.synth(msg, base_freq=800.0, rate=C.AUDIO_RATE)
    slot = np.zeros(int(14 * C.AUDIO_RATE), np.float32)
    slot[: len(audio)] = audio
    decoded = ft8_decode.decode_audio(slot)
    assert any(d.text == msg for d in decoded), [d.text for d in decoded]


def test_decode_independent_type4_hash_resolution_across_slots():
    """A standard message primes the session hash table; a later type-4
    message referencing <W9XYZ> then renders the real call (the WSJT-X
    save_hash_call flow the reference stubs out, `ft8.cpp:1218`)."""
    from t41x.decode.ft8 import message as msg_mod

    hashes = msg_mod.CallHashTable()
    slot_len = int(14 * C.AUDIO_RATE)

    a1 = ft8_gen.synth("CQ W9XYZ EM77", base_freq=1000.0,
                       rate=C.AUDIO_RATE)
    slot1 = np.zeros(slot_len, np.float32)
    slot1[: len(a1)] = a1
    d1 = ft8_decode.decode_audio(slot1, hashes=hashes)
    assert any(d.text == "CQ W9XYZ EM77" for d in d1)

    a2 = ft8_gen.synth("<W9XYZ> PJ4/K1ABC RR73", base_freq=1700.0,
                       rate=C.AUDIO_RATE)
    slot2 = np.zeros(slot_len, np.float32)
    slot2[: len(a2)] = a2
    d2 = ft8_decode.decode_audio(slot2, hashes=hashes)
    assert any(d.text == "<W9XYZ> PJ4/K1ABC RR73" for d in d2), \
        [d.text for d in d2]


def test_decode_independent_low_snr_multi_signal_slot():
    """Three independently-generated signals in one slot, two of them
    weak in noise — the candidate search + LDPC must pull all three."""
    msgs = [("CQ K1ABC FN42", 700.0, 0.35),
            ("K1ABC W9XYZ EM77", 1250.0, 0.10),
            ("W9XYZ K1ABC R-08", 1900.0, 0.10)]
    rng = np.random.default_rng(21)
    slot = (0.16 * rng.standard_normal(int(14 * C.AUDIO_RATE))
            ).astype(np.float32)
    for msg, freq, amp in msgs:
        a = ft8_gen.synth(msg, base_freq=freq, rate=C.AUDIO_RATE, amp=amp)
        start = int(0.5 * C.AUDIO_RATE)
        slot[start: start + len(a)] += a
    decoded = [d.text for d in ft8_decode.decode_audio(slot)]
    for msg, _, _ in msgs:
        assert msg in decoded, (msg, decoded)
