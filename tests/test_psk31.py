"""PSK31 encode -> RX chain -> decode round trip."""

import numpy as np

from t41x import constants as C
from t41x.chain import ChainSpec, RxChain
from t41x.decode import psk31


def test_varicode_roundtrip_bits():
    text = "HELLO, WORLD! 123"
    bits = psk31.encode_psk31(text)
    dec = psk31.Psk31Decoder()
    for b in bits:
        dec._push_bit(int(b))
    assert "".join(dec.text) == text


def test_psk31_baseband_decode():
    text = "CQ DE T41"
    iq = psk31.synth_psk31(text, tone_hz=0.0, rate=C.AUDIO_RATE,
                           nco=C.AUDIO_RATE / 4.0)
    # synth at audio rate directly: carrier lands at DC
    got = psk31.decode_capture(iq, tone_hz=0.0)
    assert got == text, got


def test_psk31_end_to_end_chain():
    text = "CQ CQ DE T41"
    iq = psk31.synth_psk31(text, tone_hz=1000.0)
    n_blocks = len(iq) // C.BLOCK_SIZE
    iq = iq[: n_blocks * C.BLOCK_SIZE]
    chain = RxChain(ChainSpec(mode="psk31", interpolate_out=False))
    out = chain.run(np.asarray(iq))
    got = psk31.decode_capture(np.asarray(out["iq_baseband"]),
                               tone_hz=1000.0)
    assert text in got or got == text, got
