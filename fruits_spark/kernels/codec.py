"""Time-series compression codecs for rolled-up signature streams.

Two classic codecs from the Gorilla paper (Pelkonen et al., VLDB 2015),
re-implemented from the published algorithm descriptions:

  * ``gorilla_encode``/``gorilla_decode`` — XOR float compression: each
    double is XORed with its predecessor; zero XOR -> 1 bit; reusable
    leading/trailing-zero window -> '10' + meaningful bits; otherwise
    '11' + 5-bit leading-zero count + 6-bit length + bits.
  * ``dod_encode``/``dod_decode`` — delta-of-delta integer timestamp
    compression with a {0, 7, 9, 12, 64}-bit ladder (64-bit escape
    instead of the paper's 32 so arbitrary int64 bucket ids round-trip).

Field extraction (XOR, leading/trailing zeros, bit widths) is vectorized
with NumPy; the final variable-width bit emission is a per-value loop,
which is fine because codecs run on *rolled-up* tier outputs (thousands of
points), never on the raw token scan path.  Round-trips are exact.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nbits)) & 0xFF]
            )
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 values (vectorized)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # log2 via float conversion is unsafe >2^53; use bit-shifting ladder
    v = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = nz & (v >> np.uint64(64 - shift) == 0)
        v[mask] = v[mask] << np.uint64(shift)
        n[mask] += shift
    out[nz] = n[nz]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 values (vectorized)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    v = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = nz & ((v & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0)
        v[mask] = v[mask] >> np.uint64(shift)
        n[mask] += shift
    out[nz] = n[nz]
    return out


def gorilla_encode(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 array."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    bits = v.view(np.uint64)
    if len(bits) == 0:
        return b""
    xors = np.concatenate([bits[:1], bits[1:] ^ bits[:-1]])
    lead = np.minimum(_clz64(xors), 31)
    trail = _ctz64(xors)
    w = _BitWriter()
    w.write(int(bits[0]), 64)
    prev_lead, prev_trail = -1, -1
    for i in range(1, len(bits)):
        x = int(xors[i])
        if x == 0:
            w.write(0, 1)
            continue
        ld, tr = int(lead[i]), int(trail[i])
        if prev_lead >= 0 and ld >= prev_lead and tr >= prev_trail:
            w.write(0b10, 2)
            w.write(x >> prev_trail, 64 - prev_lead - prev_trail)
        else:
            w.write(0b11, 2)
            w.write(ld, 5)
            nbits = 64 - ld - tr
            w.write(nbits - 1, 6)  # nbits in [1, 64]; stored as nbits-1
            w.write(x >> tr, nbits)
            prev_lead, prev_trail = ld, tr
    return w.getvalue()


def gorilla_decode(data: bytes, count: int) -> np.ndarray:
    """Decode ``count`` float64 values from a Gorilla stream."""
    out = np.empty(count, dtype=np.uint64)
    if count == 0:
        return out.view(np.float64)
    r = _BitReader(data)
    out[0] = r.read(64)
    prev = int(out[0])
    lead = trail = 0
    for i in range(1, count):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10': reuse window
            nbits = 64 - lead - trail
            x = r.read(nbits) << trail
        else:  # '11': new window
            lead = r.read(5)
            nbits = r.read(6) + 1
            trail = 64 - lead - nbits
            x = r.read(nbits) << trail
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


_DOD_LADDER = (
    (63, 7, 0b10, 2),       # |dod| < 64   -> '10' + 7 bits
    (255, 9, 0b110, 3),     # |dod| < 256  -> '110' + 9 bits
    (2047, 12, 0b1110, 4),  # |dod| < 2048 -> '1110' + 12 bits
)


def dod_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 (timestamp / bucket-id) array."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    if len(t) == 0:
        return b""
    w = _BitWriter()
    w.write(int(t[0]) & ((1 << 64) - 1), 64)
    if len(t) == 1:
        return w.getvalue()
    py = [int(v) for v in t]
    delta0 = py[1] - py[0]
    w.write(delta0 & ((1 << 64) - 1), 64)
    deltas = [b - a for a, b in zip(py, py[1:])]
    for d in (b - a for a, b in zip(deltas, deltas[1:])):
        if d == 0:
            w.write(0, 1)
            continue
        for bound, bits, ctrl, ctrl_bits in _DOD_LADDER:
            if -bound <= d <= bound:
                w.write(ctrl, ctrl_bits)
                w.write(d & ((1 << bits) - 1), bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.getvalue()


def dod_decode(data: bytes, count: int) -> np.ndarray:
    """Decode ``count`` int64 values from a delta-of-delta stream."""
    out = np.empty(count, dtype=np.int64)
    if count == 0:
        return out
    mask = (1 << 64) - 1

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    r = _BitReader(data)
    val = r.read(64)
    out[0] = signed(val)
    if count == 1:
        return out
    delta = r.read(64)
    val = (val + delta) & mask
    out[1] = signed(val)
    for i in range(2, count):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            raw = r.read(7)
            dod = raw - (1 << 7) if raw >= (1 << 6) else raw
        elif r.read(1) == 0:
            raw = r.read(9)
            dod = raw - (1 << 9) if raw >= (1 << 8) else raw
        elif r.read(1) == 0:
            raw = r.read(12)
            dod = raw - (1 << 12) if raw >= (1 << 11) else raw
        else:
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta = (delta + dod) & mask
        val = (val + delta) & mask
        out[i] = signed(val)
    return out
