"""Time-series compression codecs: delta-of-delta timestamps + Gorilla
XOR values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015).

Net-new vs the reference (its only analog is HDF5 gzip/lzf chunk
compression, /root/reference/src/miaplpy/defaults/miaplpyApp.cfg:14-17);
required by the north rule. Applied per partition inside encode/decode
pandas UDFs writing ``binary`` columns (see operators/compress.py).

Pure Python/NumPy bit packing; blocks are per-(group, window) so a few
dozen to a few thousand points each.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(bits):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out


# --------------------------------------------------------------------------
# delta-of-delta timestamps
# --------------------------------------------------------------------------

_DOD_RANGES = (
    (7, 63, 0b10, 2),       # [-63, 64]        -> '10' + 7 bits
    (9, 255, 0b110, 3),     # [-255, 256]      -> '110' + 9 bits
    (12, 2047, 0b1110, 4),  # [-2047, 2048]    -> '1110' + 12 bits
)


def encode_dod(ts: np.ndarray) -> bytes:
    """Encode int64 timestamps (any unit) with delta-of-delta.

    Header: n (uint32) + t0 (int64) + delta0 (int64), then per-point
    variable-length dod codes ('0' when the cadence is steady — the
    common case for slotted series).
    """
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.shape[0]
    if n == 0:
        return struct.pack("<I", 0)
    if n == 1:
        return struct.pack("<Iq", 1, int(ts[0]))
    # Python-int deltas: no silent int64 wraparound. Contract: |delta|
    # and |dod| fit in int64 (always true for real epoch timestamps).
    py = [int(v) for v in ts]
    deltas = [b - a for a, b in zip(py, py[1:])]
    dods = [b - a for a, b in zip(deltas, deltas[1:])]
    w = _BitWriter()
    for dod in dods:
        dod = int(dod)
        if dod == 0:
            w.write(0, 1)
            continue
        for bits, lo, prefix, plen in _DOD_RANGES:
            if -lo <= dod <= lo + 1:
                w.write(prefix, plen)
                w.write(dod + lo, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return struct.pack("<Iqq", n, int(ts[0]), int(deltas[0])) + w.getvalue()


def decode_dod(blob: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", blob, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([struct.unpack_from("<q", blob, 4)[0]], dtype=np.int64)
    t0, d0 = struct.unpack_from("<qq", blob, 4)
    r = _BitReader(blob[20:])
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1] = t0 + d0
    delta = d0
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# --------------------------------------------------------------------------
# Gorilla XOR float values
# --------------------------------------------------------------------------


def encode_gorilla(values: np.ndarray) -> bytes:
    """Encode float64 values with Gorilla XOR. NaN gap markers are
    bit-stable and round-trip exactly."""
    vals = np.asarray(values, dtype=np.float64)
    bits = vals.view(np.uint64)
    n = vals.shape[0]
    if n == 0:
        return struct.pack("<I", 0)
    w = _BitWriter()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, sig = 65, 0  # sig = meaningful-bit window length; 65 = unset
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        l = 64 - xor.bit_length()          # leading zeros
        if l > 31:
            l = 31                         # 5-bit field cap (per paper)
        t = (xor & -xor).bit_length() - 1  # trailing zeros
        if lead != 65 and l >= lead and t >= 64 - lead - sig:
            w.write(0, 1)
            w.write(xor >> (64 - lead - sig), sig)
        else:
            lead = l
            sig = 64 - l - t
            w.write(1, 1)
            w.write(lead, 5)
            w.write(sig & 0x3F, 6)         # 64 encoded as 0
            w.write(xor >> t, sig)
    return struct.pack("<I", n) + w.getvalue()


def decode_gorilla(blob: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", blob, 0)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(blob[4:])
    out = np.empty(n, dtype=np.uint64)
    prev = r.read(64)
    out[0] = prev
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            sig = r.read(6)
            if sig == 0:
                sig = 64
        xor = r.read(sig) << (64 - lead - sig)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)
