"""FT8 weak-signal sensitivity + impairment envelope (VERDICT r4 item 4).

The full probability curves live in FT8_SENS.json / PARITY.md
(tools/ft8_sensitivity.py); these tests pin deterministic points of that
envelope so a sensitivity regression cannot pass CI:

  * clean decodes at -18 dB SNR (2.5 kHz convention) — the WSJT-X
    BP-only threshold;
  * decodes survive +-2 Hz/slot transmitter drift, +-20 ppm sample-rate
    offset, and Rayleigh-ish fading at moderate SNR;
  * per-decode calibrated SNR and grid distance are reported
    (reference `ft8.cpp:798-874`, `locator.cpp:37`).
"""

import numpy as np

from t41x import constants as C
from t41x.decode import locator
from t41x.decode.ft8 import decode as ft8_decode
from t41x.decode.ft8 import encode as ft8_enc

RATE = C.AUDIO_RATE
NOISE_STD = 0.1
CALLS = ["K1ABC", "W9XYZ", "N0DEF", "G4GHI", "VK3JKL", "JA1MNO",
         "PY2PQR", "ZL4STU"]
GRIDS = ["FN42", "EM77", "DM79", "IO91", "QF22", "PM95", "GG66", "RE78"]


def amp_for_snr(snr_db: float) -> float:
    """Sine amplitude for a target SNR in WSJT-X's 2.5 kHz convention
    (noise power counted in 2500 Hz of the 12 kHz Nyquist band)."""
    noise_in_bw = NOISE_STD ** 2 * 2500.0 / (RATE / 2.0)
    return float(np.sqrt(2.0 * noise_in_bw * 10.0 ** (snr_db / 10.0)))


def make_slot(snr_db: float, cond: str, trial: int):
    """Deterministic synthetic slot — same construction as
    tools/ft8_sensitivity.py (seed=0), so the trial indices below are
    known decoding points of the measured envelope."""
    rng = np.random.default_rng(1000 * trial)
    msg = (f"CQ {CALLS[trial % len(CALLS)]} "
           f"{GRIDS[(trial // 2) % len(GRIDS)]}")
    base = float(rng.uniform(600.0, 2400.0))
    dt = float(rng.uniform(0.1, 1.0))
    drift = float(rng.choice([-2.0, 2.0])) if cond == "drift" else 0.0
    a = ft8_enc.synth_audio(ft8_enc.encode(msg), base_freq=base,
                            rate=RATE, amp=amp_for_snr(snr_db),
                            drift_hz=drift)
    if cond == "sro":
        a = ft8_enc.apply_sample_rate_offset(
            a, float(rng.choice([-20.0, 20.0])), RATE)
    elif cond == "fading":
        a = ft8_enc.apply_fading(a, doppler_hz=0.2, rate=RATE, seed=trial)
    slot = (NOISE_STD * rng.standard_normal(int(14.0 * RATE))
            ).astype(np.float32)
    start = int(dt * RATE)
    slot[start:start + len(a)] += a
    return slot, msg


def test_clean_decodes_at_minus_18_db():
    """-18 dB is the 50% point of the measured curve (FT8_SENS.json);
    these three trials are deterministic decoding points of it."""
    for trial in (0, 1, 8):
        slot, msg = make_slot(-18.0, "clean", trial)
        got = ft8_decode.decode_audio(slot)
        match = [d for d in got if d.text == msg]
        assert match, (trial, [d.text for d in got])
        # calibrated SNR estimate lands near the true -18 dB
        assert -22.0 <= match[0].snr_db <= -14.0, match[0].snr_db


def test_impairment_envelope_points():
    """One deterministic decode under each off-air impairment:
    +-2 Hz/slot drift and +-20 ppm SRO at -16 dB (0.9-1.0 measured
    probability), 0.2 Hz-Doppler fading at -10 dB (1.0 measured)."""
    for cond, snr in (("drift", -16.0), ("sro", -16.0),
                      ("fading", -10.0)):
        slot, msg = make_slot(snr, cond, 0)
        got = ft8_decode.decode_audio(slot)
        assert any(d.text == msg for d in got), \
            (cond, snr, [d.text for d in got])


def test_decode_reports_snr_and_distance():
    """Per-decode SNR + great-circle distance to the message grid
    (reference SNR=(score-160)/6 + Target_Distance display,
    ft8.cpp:798-905, locator.cpp:37)."""
    slot, msg = make_slot(-10.0, "clean", 0)   # "CQ K1ABC FN42"
    got = ft8_decode.decode_audio(slot, my_grid="EM77tr")
    match = [d for d in got if d.text == msg]
    assert match
    d = match[0]
    grid = ft8_decode.grid_of_message(msg)
    assert grid == "FN42"
    expect = locator.distance_km("EM77tr", grid)
    assert d.distance_km is not None
    assert abs(d.distance_km - expect) <= 1.0, (d.distance_km, expect)
    assert -13.0 <= d.snr_db <= -7.0, d.snr_db

    # no grid in the message -> no distance
    assert ft8_decode.grid_of_message("W9XYZ K1ABC R-08") is None
    assert ft8_decode.grid_of_message("K1ABC W9XYZ RR73") is None
