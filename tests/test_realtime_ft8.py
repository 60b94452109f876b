"""Real-time pacing proof for the 15 s FT8 cadence (VERDICT r2 item 4).

Drives StreamRunner from CaptureStreamer(rate_factor=1.0) — blocks
arrive on the wall clock every 10.67 ms, exactly like the reference's
I2S DMA cadence — through a full FT8 slot with the wall-clock
SlotManager, and asserts:

  * the decode lands IN-SLOT: the reference must finish decoding inside
    the 15 s − 13.5 s capture margin before the next slot's audio needs
    the buffers (`ft8.cpp:126-167`);
  * the DSP keeps up with real time: load_percent < 100 (the
    reference's one true perf metric, `InfoBox.cpp:341-371`);
  * the ring never overran (no blocks dropped while decoding).

This test intentionally takes ~16 s of wall clock.
"""

import time

import numpy as np

from t41x import constants as C
from t41x.decode.ft8 import decode as ft8_decode, encode as ft8_encode
from t41x.io.runtime import BlockRing, CaptureStreamer
from t41x.radio import Radio
from t41x.runner import StreamRunner

MESSAGE = "CQ K1ABC FN42"


def test_ft8_slot_decodes_in_real_time():
    # ~15.4 s of 192 kHz I/Q: 0.5 s pad + 12.64 s FT8 burst + tail pad
    iq = ft8_encode.synth_iq(MESSAGE, base_freq=1000.0, amp=0.4,
                             pad_start_s=0.5, pad_end_s=2.3)
    n_blocks = len(iq) // C.BLOCK_SIZE
    iq = iq[: n_blocks * C.BLOCK_SIZE]
    assert n_blocks * C.BLOCK_SECONDS > 15.0

    radio = Radio()
    radio.set_mode("ft8")

    t_start = None

    def wall_clock():
        # UTC-like wall clock whose next 15 s boundary falls 0.2 s after
        # stream start (a live runner passes real UTC; the transmitting
        # station aligns to it) — the slot capture then starts 0.2 s in,
        # inside the 0.5 s leading pad
        if t_start is None:
            return 0.0
        return (time.monotonic() - t_start) + (15.0 - 0.2)

    runner = StreamRunner(radio, ring=BlockRing(capacity=256),
                          slot_clock=wall_clock)

    # compile everything OUTSIDE the timed stream (the reference compiles
    # at build time; jit compiles at first trace): chain graph + the
    # slot-decode graph
    runner.prime()
    ft8_decode.decode_audio(np.zeros(int(13.5 * C.AUDIO_RATE), np.float32))

    t_start = time.monotonic()
    streamer = CaptureStreamer(runner.ring, iq, rate_factor=1.0)
    decoded, t_decode = None, None
    loads = []
    deadline = t_start + 25.0
    while time.monotonic() < deadline:
        r = runner.step()
        if r is None:
            if not streamer.running and runner.ring.available() == 0:
                break
            time.sleep(0.001)
            continue
        loads.append(r["load_percent"])
        if r.get("ft8"):
            decoded = r["ft8"]
            t_decode = time.monotonic() - t_start
            break
    streamer.stop()

    assert decoded is not None, "no FT8 decode within the slot window"
    texts = [m.text for m in decoded]
    assert MESSAGE in texts, texts

    # in-slot: the slot's 15 s of audio ends 15.2 s into the stream; the
    # decode must land inside the capture margin before the next slot's
    # processing
    assert t_decode < 15.2 + (15.0 - 13.5), t_decode

    # real-time: the per-block DSP stayed within the 10.67 ms budget
    load = float(np.median(loads))
    assert load < 100.0, load

    # nothing was dropped while streaming + decoding
    assert runner.ring.overruns == 0
