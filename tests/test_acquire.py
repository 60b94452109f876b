"""Acquisition-device ingest: network I/Q stream -> ring -> runner."""

import time

import numpy as np

from t41x import constants as C
from t41x.io import acquire, signals
from t41x.io.runtime import BlockRing
from t41x.radio import Radio
from t41x.runner import StreamRunner


def test_net_iq_source_end_to_end():
    """A TCP 'digitizer' streams a USB capture; NetIQSource frames it
    into the ring; the runner demodulates the tone."""
    n_blocks = 16
    iq = signals.usb_signal([1000.0], n_blocks * C.BLOCK_SIZE) * 0.25

    port, _srv = acquire.serve_capture(iq)
    radio = Radio()
    runner = StreamRunner(radio)
    runner.keep_audio = True
    src = acquire.NetIQSource(runner.ring, "127.0.0.1", port)

    t0 = time.monotonic()
    while runner.blocks_processed < n_blocks \
            and time.monotonic() - t0 < 120:
        if runner.step() is None:
            time.sleep(0.002)
    src.stop()

    assert runner.blocks_processed == n_blocks
    assert src.blocks_received == n_blocks
    audio = runner.audio
    snr = signals.tone_fit_snr(audio[2048:], [1000.0], C.AUDIO_RATE)
    assert snr > 25.0, snr


def test_net_iq_source_paced_stream_overruns_accounted():
    """Paced (real-time) streaming: no overruns when the consumer keeps
    up, and blocks arrive at roughly the wall-clock cadence."""
    n_blocks = 12
    iq = signals.usb_signal([800.0], n_blocks * C.BLOCK_SIZE) * 0.25
    port, _srv = acquire.serve_capture(iq, rate_factor=1.0, chunk_blocks=2)
    radio = Radio()
    runner = StreamRunner(radio)
    runner.prime()
    src = acquire.NetIQSource(runner.ring, "127.0.0.1", port)
    t0 = time.monotonic()
    while runner.blocks_processed < n_blocks \
            and time.monotonic() - t0 < 60:
        if runner.step() is None:
            time.sleep(0.002)
    wall = time.monotonic() - t0
    src.stop()
    assert runner.blocks_processed == n_blocks
    assert runner.ring.overruns == 0
    # 12 blocks at real time = 128 ms minimum
    assert wall > 0.8 * (n_blocks - 2) * C.BLOCK_SECONDS, wall
