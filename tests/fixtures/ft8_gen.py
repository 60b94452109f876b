"""Independent FT8 signal generator — a second, separate implementation
of the FT8 encode path used ONLY as a golden test fixture.

Deliberately does NOT import anything from `t41x.decode.ft8`: the
message packing, CRC, LDPC parity, tone mapping, and waveform synthesis
below are all written independently (different algorithms where
possible), so a bug shared between t41x's encoder and decoder cannot
cancel out — this is the "decode an independently-produced signal" test
the reference gets from its recorded-WAV modes (`Process.cpp:278-374`,
README.md:86).

Protocol constants are transcribed from the public FT8 protocol
(WSJT-X 77-bit message spec / LDPC(174,91)); the sparse parity table
KNM/KNRW matches the reference's `ft8_constants.cpp:161-433` (protocol
data, unavoidable).  The LDPC parity here is computed by GF(2)
Gaussian elimination on the parity-check system directly — NOT with
t41x's precomputed generator — so a generator-derivation bug in t41x
would be caught.
"""

from __future__ import annotations

import numpy as np

COSTAS = (3, 1, 4, 0, 6, 5, 2)
GRAY = (0, 1, 3, 2, 5, 6, 4, 7)
CRC_POLY = 0x2757
NTOKENS = 2_063_592
MAX22 = 4_194_304
MAXGRID4 = 32_400

# ---------------------------------------------------------------------
# message packing (type 1 standard + CQ), written from the 77-bit spec
# ---------------------------------------------------------------------

_A1 = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_A2 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_A3 = "0123456789"
_A4 = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _align_call(call: str) -> str:
    """Right-pad to 6 with the area digit in position 3."""
    call = call.upper()
    if len(call) >= 3 and not call[2].isdigit() and call[1].isdigit():
        call = " " + call
    return call.ljust(6)[:6]


def pack_call28(call: str) -> int:
    call = call.strip().upper()
    if call == "DE":
        return 0
    if call == "QRZ":
        return 1
    if call == "CQ":
        return 2
    c = _align_call(call)
    n = _A1.index(c[0])
    n = n * 36 + _A2.index(c[1])
    n = n * 10 + _A3.index(c[2])
    n = n * 27 + _A4.index(c[3])
    n = n * 27 + _A4.index(c[4])
    n = n * 27 + _A4.index(c[5])
    return NTOKENS + MAX22 + n


def pack_extra(extra: str) -> tuple[int, int]:
    """Grid/report field -> (ir, g15)."""
    extra = extra.strip().upper()
    if extra == "":
        return 0, MAXGRID4 + 1
    if extra == "RRR":
        return 0, MAXGRID4 + 2
    if extra == "RR73":
        return 0, MAXGRID4 + 3
    if extra == "73":
        return 0, MAXGRID4 + 4
    ir = 0
    if extra.startswith("R-") or extra.startswith("R+"):
        ir, extra = 1, extra[1:]
    if extra[0] in "+-":
        return ir, MAXGRID4 + 35 + int(extra)
    # 4-char Maidenhead grid
    g = ((ord(extra[0]) - ord("A")) * 18 + (ord(extra[1]) - ord("A"))) * 100 \
        + int(extra[2]) * 10 + int(extra[3])
    return ir, g


def pack77(msg: str) -> np.ndarray:
    """Standard type-1 message text -> 77 bits (MSB-first per field)."""
    parts = msg.strip().upper().split()
    assert len(parts) in (2, 3), msg
    call_a, call_b = parts[0], parts[1]
    extra = parts[2] if len(parts) == 3 else ""
    n28a = pack_call28(call_a)
    n28b = pack_call28(call_b)
    ir, g15 = pack_extra(extra)
    i3 = 1
    val = 0
    for v, w in ((n28a, 28), (0, 1), (n28b, 28), (0, 1), (ir, 1),
                 (g15, 15), (i3, 3)):
        val = (val << w) | int(v)
    return np.array([(val >> (76 - i)) & 1 for i in range(77)], np.uint8)


# ---------------------------------------------------------------------
# CRC-14: polynomial long division over GF(2) (different algorithm from
# t41x's shift register)
# ---------------------------------------------------------------------

def crc14(bits: np.ndarray) -> np.ndarray:
    """CRC of a bit vector: remainder of m(x) * x^14 mod g(x).
    The FT8 CRC is computed over the 77 payload bits zero-padded to 82
    (full bytes of the byte-fed reference implementation)."""
    g = np.array([(CRC_POLY >> (13 - i)) & 1 for i in range(14)], np.uint8)
    g = np.concatenate([np.ones(1, np.uint8), g])  # degree-14, MSB first
    work = np.concatenate([np.asarray(bits, np.uint8),
                           np.zeros(14, np.uint8)])
    for i in range(len(work) - 14):
        if work[i]:
            work[i: i + 15] ^= g
    return work[-14:]


def add_crc(payload77: np.ndarray) -> np.ndarray:
    padded = np.concatenate([np.asarray(payload77, np.uint8),
                             np.zeros(5, np.uint8)])
    return np.concatenate([np.asarray(payload77, np.uint8), crc14(padded)])


# ---------------------------------------------------------------------
# LDPC(174,91) parity by GF(2) elimination on the parity-check system
# ---------------------------------------------------------------------

def _load_knm():
    from tests.fixtures.ft8_knm import KNM
    return KNM


def build_h() -> np.ndarray:
    """Dense (83, 174) parity-check matrix from the sparse check->bit
    table (1-based bit indices; 0 entries are padding)."""
    H = np.zeros((83, 174), np.uint8)
    for r, row in enumerate(_load_knm()):
        for v in row:
            if v:
                H[r, v - 1] = 1
    return H


def ldpc_parity(a91: np.ndarray) -> np.ndarray:
    """Solve H @ [a91 | p83] == 0 (mod 2) for the 83 parity bits."""
    H = build_h()
    A = H[:, 91:].copy()            # (83, 83) coefficients of parity bits
    b = (H[:, :91] @ np.asarray(a91, np.uint8)) % 2  # rhs
    # Gaussian elimination over GF(2)
    A = A.astype(np.uint8)
    b = b.astype(np.uint8)
    n = 83
    perm = list(range(n))
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r, col])
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
            b[[col, piv]] = b[[piv, col]]
        for r in range(n):
            if r != col and A[r, col]:
                A[r] ^= A[col]
                b[r] ^= b[col]
    return b


# ---------------------------------------------------------------------
# type 4 (nonstandard/hashed calls) and type 0.5 (telemetry) payloads,
# written independently from the 77-bit spec (field layouts:
# 12|58|1|2|1|i3=4 and 71|n3=5|i3=0)
# ---------------------------------------------------------------------

_A38G = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ/"
_HASH_MULT = 47055833459


def hash_call(call: str, m: int) -> int:
    """WSJT-X multiplier hash: base-38 value of the 11-char left-
    justified call, times the magic multiplier, top m bits."""
    digits = [_A38G.index(ch) for ch in call.strip().upper().ljust(11)]
    n = 0
    for d in digits:
        n = 38 * n + d
    prod = (_HASH_MULT * n) % (1 << 64)
    return prod >> (64 - m)


def pack77_type4(msg: str) -> np.ndarray:
    """`CQ PJ4/KA1ABC`, `<W9XYZ> PJ4/KA1ABC RR73`, `PJ4/KA1ABC <W9XYZ> 73`."""
    parts = msg.strip().upper().split()
    nrpt = 0
    if parts[-1] in ("RRR", "RR73", "73"):
        nrpt = ("RRR", "RR73", "73").index(parts[-1]) + 1
        parts = parts[:-1]
    a, b = parts
    if a == "CQ":
        icq, iflip, hashed, full = 1, 0, b, b
    elif a.startswith("<"):
        icq, iflip, hashed, full = 0, 0, a[1:-1], b
    else:
        icq, iflip, hashed, full = 0, 1, b[1:-1], a
    n58 = 0
    for ch in full.rjust(11):
        n58 = 38 * n58 + _A38G.index(ch)
    val = hash_call(hashed, 12)
    for v, w in ((n58, 58), (iflip, 1), (nrpt, 2), (icq, 1), (4, 3)):
        val = (val << w) | int(v)
    return np.array([(val >> (76 - i)) & 1 for i in range(77)], np.uint8)


def pack77_telemetry(hexstr: str) -> np.ndarray:
    """Type 0.5: up to 71 bits of raw telemetry as 18 hex digits."""
    val = int(hexstr, 16)
    assert val < (1 << 71)
    val = (val << 3) | 5      # n3 = 5
    val = (val << 3) | 0      # i3 = 0
    return np.array([(val >> (76 - i)) & 1 for i in range(77)], np.uint8)


def payload_for(msg: str) -> np.ndarray:
    m = msg.strip().upper()
    parts = m.split()
    if len(parts) == 1 and len(parts[0]) == 18:
        return pack77_telemetry(parts[0])
    if any("/" in p and len(p.split("/")[0]) > 2 for p in parts) \
            or any(p.startswith("<") for p in parts):
        return pack77_type4(m)
    return pack77(m)


def codeword_for_payload(p77: np.ndarray) -> np.ndarray:
    a91 = add_crc(p77)
    p83 = ldpc_parity(a91)
    cw = np.concatenate([a91, p83])
    H = build_h()
    assert ((H @ cw) % 2 == 0).all(), "parity solve failed"
    return cw


def encode_codeword(msg: str) -> np.ndarray:
    return codeword_for_payload(payload_for(msg))


def tones(msg: str) -> np.ndarray:
    cw = encode_codeword(msg)
    syms = []
    for k in range(58):
        v = int(cw[3 * k]) * 4 + int(cw[3 * k + 1]) * 2 + int(cw[3 * k + 2])
        syms.append(GRAY[v])
    t = np.zeros(79, np.int8)
    t[0:7] = COSTAS
    t[36:43] = COSTAS
    t[72:79] = COSTAS
    t[7:36] = syms[:29]
    t[43:72] = syms[29:]
    return t


# ---------------------------------------------------------------------
# waveform: plain continuous-phase 8-FSK (rectangular pulses — no GFSK,
# unlike t41x's synth), 6.25 Hz spacing, 0.16 s symbols
# ---------------------------------------------------------------------

def synth(msg: str, base_freq: float = 1000.0, rate: float = 24_000.0,
          amp: float = 0.5) -> np.ndarray:
    t = tones(msg)
    sps = int(round(0.16 * rate))
    freqs = base_freq + t.astype(np.float64) * 6.25
    inst = np.repeat(freqs, sps)
    phase = 2.0 * np.pi * np.cumsum(inst) / rate
    return (amp * np.sin(phase)).astype(np.float32)
