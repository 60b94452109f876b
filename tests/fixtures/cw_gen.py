"""Independent CW signal generator — golden test fixture.

Deliberately shares nothing with `t41x.io.signals.cw_signal` (t41x's own
keying generator): different Morse representation (binary-coded — a
leading 1 sentinel followed by 0=dit/1=dah bits), different timing
engine (integer sample interval scheduling with optional human-like
jitter on every element), and different envelope shaping (analytic
raised-cosine attack/release per edge instead of a boxcar convolution).
A shared encode/decode drift in t41x's CW path cannot cancel against
this generator.
"""

from __future__ import annotations

import numpy as np

# binary-coded morse: 1 sentinel, then 0 = dit, 1 = dah (MSB first)
#   E "." -> 0b10;  A ".-" -> 0b101;  Q "--.-" -> 0b11101
BCM = {
    "A": 0b101, "B": 0b11000, "C": 0b11010, "D": 0b1100, "E": 0b10,
    "F": 0b10010, "G": 0b1110, "H": 0b10000, "I": 0b100, "J": 0b10111,
    "K": 0b1101, "L": 0b10100, "M": 0b111, "N": 0b110, "O": 0b1111,
    "P": 0b10110, "Q": 0b11101, "R": 0b1010, "S": 0b1000, "T": 0b11,
    "U": 0b1001, "V": 0b10001, "W": 0b1011, "X": 0b11001, "Y": 0b11011,
    "Z": 0b11100,
    "0": 0b111111, "1": 0b101111, "2": 0b100111, "3": 0b100011,
    "4": 0b100001, "5": 0b100000, "6": 0b110000, "7": 0b111000,
    "8": 0b111100, "9": 0b111110,
    "?": 0b1001100, "/": 0b110010, ",": 0b1110011, ".": 0b1010101,
    "=": 0b110001,
}


def elements(char: str) -> list[int]:
    """Character -> list of element lengths in dit units (1=dit, 3=dah)."""
    code = BCM[char.upper()]
    bits = bin(code)[3:]  # strip '0b' and the sentinel 1
    return [3 if b == "1" else 1 for b in bits]


def keying_intervals(text: str, wpm: float, rate: float,
                     jitter: float = 0.0, seed: int = 0
                     ) -> tuple[list[tuple[int, int]], int]:
    """Text -> [(on_start, on_end)] key-down sample intervals.

    PARIS timing: dit = 1.2/wpm s; element gap 1 dit, letter gap 3,
    word gap 7.  `jitter` scales every duration by U(1-j, 1+j) — the
    human-fist variation the decoder's adaptive histograms must absorb.
    """
    rng = np.random.default_rng(seed)
    unit = 1.2 / wpm * rate

    def dur(units: float) -> int:
        scale = 1.0 + jitter * rng.uniform(-1.0, 1.0) if jitter else 1.0
        return max(int(round(units * unit * scale)), 1)

    pos = int(0.25 * rate)  # leading silence
    spans: list[tuple[int, int]] = []
    for wi, word in enumerate(text.upper().split()):
        if wi:
            pos += dur(7)
        for ci, ch in enumerate(word):
            if ch not in BCM:
                continue
            if ci:
                pos += dur(3)
            for ei, el in enumerate(elements(ch)):
                if ei:
                    pos += dur(1)
                end = pos + dur(el)
                spans.append((pos, end))
                pos = end
    return spans, pos + int(0.35 * rate)


def envelope(spans: list[tuple[int, int]], n: int, rate: float,
             edge_ms: float = 5.0) -> np.ndarray:
    """Key-down spans -> amplitude envelope with analytic raised-cosine
    attack/release edges."""
    env = np.zeros(n, np.float64)
    k = max(int(edge_ms * 1e-3 * rate), 2)
    rise = 0.5 * (1.0 - np.cos(np.pi * (np.arange(k) + 0.5) / k))
    for a, b in spans:
        a, b = max(a, 0), min(b, n)
        if b <= a:
            continue
        env[a:b] = 1.0
        env[a: min(a + k, b)] = rise[: min(k, b - a)]
        fall_n = min(k, b - a)
        env[b - fall_n: b] = np.minimum(env[b - fall_n: b],
                                        rise[::-1][:fall_n])
    return env


def synth_iq(text: str, wpm: float, rate: float = 192_000.0,
             tone_offset: float = 750.0, nco: float = 0.0,
             amp: float = 0.5, jitter: float = 0.0,
             seed: int = 0) -> np.ndarray:
    """Keyed CW carrier `tone_offset` Hz above the (Fs/4-shifted) tuning
    point — the placement a CW-USB receiver with a 750 Hz sidetone
    expects."""
    spans, n = keying_intervals(text, wpm, rate, jitter, seed)
    env = envelope(spans, n, rate)
    t = np.arange(n) / rate
    carrier = 2.0 * np.pi * (nco - rate / 4.0 + tone_offset) * t
    return (amp * env * np.exp(1j * carrier)).astype(np.complex64)
