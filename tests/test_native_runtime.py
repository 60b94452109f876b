"""Native runtime tests: ring, streamer, load meter, WAV reader —
exercised through the ctypes bindings (with fallback parity)."""

import time

import numpy as np

from t41x import constants as C
from t41x.io import runtime, signals, wav


def test_native_library_builds():
    assert runtime.native_available(), "native toolchain should be present"


def test_ring_push_pop_order():
    ring = runtime.BlockRing(block_floats=8, capacity=16)
    for i in range(5):
        ring.push(np.full(8, float(i), np.float32))
    assert ring.available() == 5
    for i in range(5):
        b = ring.pop()
        assert b is not None and b[0] == float(i)
    assert ring.pop() is None


def test_ring_overflow_drops_backlog():
    ring = runtime.BlockRing(block_floats=4, capacity=8)
    for i in range(20):
        ring.push(np.full(4, float(i), np.float32))
    assert ring.overruns >= 1
    assert ring.available() <= 8


def test_streamer_paces_blocks():
    ring = runtime.BlockRing(block_floats=2 * C.BLOCK_SIZE, capacity=64)
    iq = signals.tone_iq(1000.0, 10 * C.BLOCK_SIZE) * 0.3
    s = runtime.CaptureStreamer(ring, iq, rate_factor=20.0)
    t0 = time.monotonic()
    got = 0
    while got < 10 and time.monotonic() - t0 < 5.0:
        b = ring.pop_iq()
        if b is None:
            time.sleep(0.001)
            continue
        assert b.dtype == np.complex64 and len(b) == C.BLOCK_SIZE
        got += 1
    s.stop()
    assert got == 10
    # 10 blocks at 20x real time ~ 5.3 ms; allow generous slack
    assert time.monotonic() - t0 < 3.0


def test_load_meter():
    m = runtime.LoadMeter(budget_s=0.010)
    for _ in range(3):
        m.begin()
        time.sleep(0.002)
        m.end()
    assert 10.0 < m.percent < 60.0, m.percent


def test_native_wav_matches_python(tmp_path):
    iq = signals.tone_iq(500.0, 4096) * 0.5
    p = str(tmp_path / "c.wav")
    wav.write_iq_wav(p, iq, 192000)
    d_native, r1 = runtime.read_wav_native(p)
    d_py, r2 = wav.read_wav(p)
    assert r1 == r2 == 192000
    np.testing.assert_allclose(d_native, d_py, atol=1e-6)
