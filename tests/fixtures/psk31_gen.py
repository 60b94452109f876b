"""Independent PSK31 signal generator — golden test fixture.

Shares nothing with `t41x.decode.psk31`'s encoder: the varicode table
below is transcribed from the reference firmware's protocol-constant
table (`psk31.cpp:25-160`, itself the published G3PLX alphabet) rather
than t41x's copy, and the modulator follows the PSK31 spec's polarity
formulation — a ±1 polarity sequence (cumulative product of reversals)
with raised-cosine transitions spanning each symbol boundary — instead
of t41x's phase-accumulator + half-symbol amplitude dip.  The waveforms
are spectrally equivalent PSK31 produced by disjoint code paths, so a
shared encoder/decoder drift in t41x cannot cancel against this
generator.
"""

from __future__ import annotations

import numpy as np

BAUD = 31.25

# G3PLX varicode (every code starts and ends with 1; no "00" inside),
# printable subset; char -> code value (bin length == bit count)
VARICODE = {
    " ": 0b1,
    "!": 0b111111111, '"': 0b101011111, "#": 0b111110101,
    "$": 0b111011011, "%": 0b1011010101, "&": 0b1010111011,
    "'": 0b101111111, "(": 0b11111011, ")": 0b11110111,
    "*": 0b101101111, "+": 0b111011111, ",": 0b1110101,
    "-": 0b110101, ".": 0b1010111, "/": 0b110101111,
    "0": 0b10110111, "1": 0b10111101, "2": 0b11101101,
    "3": 0b11111111, "4": 0b101110111, "5": 0b101011011,
    "6": 0b101101011, "7": 0b110101101, "8": 0b110101011,
    "9": 0b110110111, ":": 0b11110101, ";": 0b110111101,
    "<": 0b111101101, "=": 0b1010101, ">": 0b111010111,
    "?": 0b1010101111, "@": 0b1010111101,
    "A": 0b1111101, "B": 0b11101011, "C": 0b10101101, "D": 0b10110101,
    "E": 0b1110111, "F": 0b11011011, "G": 0b11111101, "H": 0b101010101,
    "I": 0b1111111, "J": 0b111111101, "K": 0b101111101, "L": 0b11010111,
    "M": 0b10111011, "N": 0b11011101, "O": 0b10101011, "P": 0b11010101,
    "Q": 0b111011101, "R": 0b10101111, "S": 0b1101111, "T": 0b1101101,
    "U": 0b101010111, "V": 0b110110101, "W": 0b101011101,
    "X": 0b101110101, "Y": 0b101111011, "Z": 0b1010101101,
    "a": 0b1011, "b": 0b1011111, "c": 0b101111, "d": 0b101101,
    "e": 0b11, "f": 0b111101, "g": 0b1011011, "h": 0b101011,
    "i": 0b1101, "j": 0b111101011, "k": 0b10111111, "l": 0b11011,
    "m": 0b111011, "n": 0b1111, "o": 0b111, "p": 0b111111,
    "q": 0b110111111, "r": 0b10101, "s": 0b10111, "t": 0b101,
    "u": 0b110111, "v": 0b1111011, "w": 0b1101011, "x": 0b11011111,
    "y": 0b1011101, "z": 0b111010101,
}


def bits_for(ch: str) -> list[int]:
    return [int(b) for b in bin(VARICODE[ch])[2:]]


def bitstream(text: str, idle: int = 32) -> np.ndarray:
    """Text -> PSK31 bit stream: 0 = phase reversal, 1 = steady, "00"
    inter-character gaps, idle reversals fore and aft."""
    bits = [0] * idle
    for ch in text:
        if ch not in VARICODE:
            continue
        bits.extend(bits_for(ch))
        bits.extend([0, 0])
    bits.extend([0] * idle)
    return np.asarray(bits, np.int8)


def synth_iq(text: str, tone_hz: float = 1000.0, rate: float = 192_000.0,
             nco: float = 0.0, amp: float = 0.5) -> np.ndarray:
    """PSK31 I/Q capture: polarity-sequence BPSK with raised-cosine
    transitions spanning each reversal boundary, carrier placed
    `tone_hz` above the (Fs/4-shifted) tuning point."""
    bits = bitstream(text)
    sps = int(round(rate / BAUD))
    # polarity per symbol: flip on every 0 bit (pol[k] = polarity DURING
    # symbol k); m(t) holds pol[k] at symbol centers and swings a -> b
    # with a one-symbol-wide raised cosine CENTERED on each boundary
    pol = np.cumprod(np.where(bits == 0, -1.0, 1.0))
    n = len(bits) * sps
    half = sps // 2
    m = np.empty(n, np.float64)
    m[:half] = pol[0]
    swing = 0.5 * (1.0 + np.cos(np.pi * np.arange(sps) / sps))  # 1 -> 0
    for k in range(len(bits) - 1):
        s = k * sps + half
        a, b = pol[k], pol[k + 1]
        m[s: s + sps] = a if a == b else b + (a - b) * swing
    m[(len(bits) - 1) * sps + half:] = pol[-1]
    t = np.arange(n) / rate
    carrier = 2.0 * np.pi * (nco - rate / 4.0 + tone_hz) * t
    return (amp * m * np.exp(1j * carrier)).astype(np.complex64)
