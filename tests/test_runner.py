"""Live streaming runner: ring -> chain -> decoders/servers end-to-end."""

import time

import numpy as np

from t41x import constants as C
from t41x.io import signals
from t41x.io.runtime import BlockRing, CaptureStreamer
from t41x.radio import Radio
from t41x.runner import StreamRunner


def test_runner_processes_stream_and_meters_load():
    radio = Radio()
    runner = StreamRunner(radio)
    runner.keep_audio = True
    iq = signals.usb_signal([1000.0], 24 * C.BLOCK_SIZE) * 0.25
    streamer = CaptureStreamer(runner.ring, iq, rate_factor=0.0)
    t0 = time.monotonic()
    done = 0
    while done < 24 and time.monotonic() - t0 < 60:
        done += runner.drain()
        time.sleep(0.002)
    streamer.stop()
    assert runner.blocks_processed == 24
    audio = runner.audio
    snr = signals.tone_fit_snr(audio[2048:], [1000.0], C.AUDIO_RATE)
    assert snr > 25.0, snr
    assert runner.load.percent > 0


def test_runner_live_cw_decode():
    radio = Radio()
    radio.set_mode("cw")
    radio.config.agc_mode = 0
    runner = StreamRunner(radio)
    text = "TEST"
    n_blocks = 260
    iq = signals.cw_signal(text, 18.0, n_blocks * C.BLOCK_SIZE) * 0.5
    for b in range(n_blocks):
        runner.ring.push(np.ascontiguousarray(
            iq[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]).view(np.float32))
        runner.drain()
    # flush trailing silence so the last char is emitted
    for _ in range(40):
        runner.ring.push(np.zeros(2 * C.BLOCK_SIZE, np.float32))
        runner.drain()
    got = "".join(runner._morse.text).strip()
    assert got.replace(" ", "") == text, got


def test_runner_band_change_mid_stream():
    radio = Radio()
    runner = StreamRunner(radio)
    runner.keep_audio = True
    iq_usb = signals.usb_signal([900.0], 8 * C.BLOCK_SIZE) * 0.25
    for b in range(8):
        runner.ring.push(np.ascontiguousarray(
            iq_usb[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]
        ).view(np.float32))
    runner.drain()
    # control change between blocks: swap to 40M/LSB
    radio.set_band("40M")
    iq_lsb = signals.lsb_signal([700.0], 8 * C.BLOCK_SIZE) * 0.25
    for b in range(8):
        runner.ring.push(np.ascontiguousarray(
            iq_lsb[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]
        ).view(np.float32))
    runner.drain()
    assert runner.blocks_processed == 16
    audio = runner.audio
    # second half demodulates the LSB tone
    snr = signals.tone_fit_snr(audio[-1500:], [700.0], C.AUDIO_RATE)
    assert snr > 15.0, snr


def test_runner_step_batch_default_batch_size():
    """step_batch() is public and must work at batch_blocks == 1 (the
    default) — regression for the r4 advisor finding (runner.py)."""
    radio = Radio()
    runner = StreamRunner(radio)           # batch_blocks defaults to 1
    runner.keep_audio = True
    iq = signals.usb_signal([1000.0], 4 * C.BLOCK_SIZE) * 0.25
    for b in range(4):
        runner.ring.push(np.ascontiguousarray(
            iq[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]).view(np.float32))
    for _ in range(4):
        res = runner.step_batch()
        assert res is not None and "load_percent" in res
    assert runner.step_batch() is None     # ring drained
    assert runner.blocks_processed == 4
