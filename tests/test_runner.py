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


def test_codec_gain_state_machine():
    """The Codec_gain timer/step semantics (Process.cpp:979-1027):
    decrease after >=20 blocks when half-clipping, increase after 50
    quiet blocks, clamp [0, 15], no decrease below zero."""
    from t41x.chain.codec_gain import CodecGain

    cg = CodecGain()
    g = 5
    # quiet stream: first increase lands exactly at block 50
    for i in range(49):
        g = cg.step(False, False, g)
        assert g == 5, i
    g = cg.step(False, False, g)
    assert g == 6
    # quarter-level signal (no clip, but occupied): gain holds
    for _ in range(120):
        g = cg.step(False, True, g)
    assert g == 6
    # clipping: the timer counts blocks since the last CHANGE (not
    # since clipping began), so after the long hold the first clipped
    # block steps down immediately...
    g = cg.step(True, True, g)
    assert g == 5
    # ...and the NEXT decrease needs the 20-block holdoff
    for i in range(19):
        g = cg.step(True, True, g)
        assert g == 5, i
    g = cg.step(True, True, g)
    assert g == 4
    # hard clipping drives to the floor and stays there
    for _ in range(500):
        g = cg.step(True, True, g)
    assert g == 0
    # then a long quiet period climbs back, capped at 15
    for _ in range(50 * 40):
        g = cg.step(False, False, g)
    assert g == 15


def test_runner_auto_rf_gain_steps_down_on_clipping():
    """Live auto-gain loop: a near-full-scale input drives the chain's
    adc clip taps and the runner steps band.rf_gain down (the
    reference's Codec_gain hardware loop, Process.cpp:939)."""
    radio = Radio()
    radio.set_auto_rf_gain(True)
    radio.config.band.rf_gain = 4
    runner = StreamRunner(radio)
    t = np.arange(40 * C.BLOCK_SIZE) / C.SAMPLE_RATE
    loud = (0.9 * np.exp(2j * np.pi * (C.SAMPLE_RATE / 4 + 1000.0) * t)
            ).astype(np.complex64)
    for b in range(40):
        runner.ring.push(np.ascontiguousarray(
            loud[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]).view(np.float32))
        runner.drain()
    assert radio.config.band.rf_gain < 4, radio.config.band.rf_gain

    # quiet input climbs back up (50-block holdoff per step)
    g0 = radio.config.band.rf_gain
    quiet = (0.01 * loud).astype(np.complex64)
    for b in range(110):
        bb = b % 40
        runner.ring.push(np.ascontiguousarray(
            quiet[bb * C.BLOCK_SIZE:(bb + 1) * C.BLOCK_SIZE]
            ).view(np.float32))
        runner.drain()
    assert radio.config.band.rf_gain > g0, radio.config.band.rf_gain
