"""Rollup-store compression codecs.

- ``gorilla_encode/decode``: Gorilla-style XOR compression of float64
  streams (Facebook's in-memory TSDB scheme): per value, XOR with the
  previous value; zero XOR -> 1 control bit; otherwise control bits +
  (leading-zero count, significant-bit length) window + payload. The
  analysis passes (XOR, leading/trailing-zero counts, control decisions)
  are numpy-vectorized; only the final bit-packing walks the values.

- ``dod_encode/decode``: delta-of-delta encoding for monotone integer
  offset/timestamp streams with the classic bucket sizes
  (0 | 7 | 9 | 12 | 64 bits). Regular window grids (delta constant)
  cost ~1 bit per offset.

Both carry a header with count + xxhash-style checksum so the store can
verify blocks on read. Pure numpy/Python — usable inside Arrow UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_G = b"GOR1"
_MAGIC_D = b"DOD1"


def _stream_checksum(bits_u64: np.ndarray) -> int:
    """Position-weighted wrapping checksum (XOR-reduce cancels on
    even-count flips, which chained-XOR corruption produces)."""
    n = len(bits_u64)
    if n == 0:
        return 0
    w = np.arange(1, 2 * n, 2, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return int((bits_u64 * w).sum(dtype=np.uint64))


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
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
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        p = self.pos
        for _ in range(bits):
            byte = self.data[p >> 3]
            out = (out << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0)."""
    # float64 exponent trick is unsafe for >53-bit mantissas; use bit_length
    # via log2 on split halves
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_hi = np.where(hi > 0, np.floor(np.log2(hi.astype(np.float64) + 0.5)) + 1, 0)
    bl_lo = np.where(lo > 0, np.floor(np.log2(lo.astype(np.float64) + 0.5)) + 1, 0)
    bits = np.where(hi > 0, 32 + bl_hi, bl_lo)
    return (64 - bits).astype(np.int64)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x > 0)."""
    low = (x & (~x + np.uint64(1))).astype(np.uint64)  # isolate lowest set bit
    return 63 - _clz64(low)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array. Header: magic | count(u32) | checksum(u64)."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    bits = v.view(np.uint64)
    n = len(bits)
    cksum = _stream_checksum(bits)
    w = _BitWriter()
    if n:
        w.write(int(bits[0]), 64)
        x = bits[1:] ^ bits[:-1]
        nz = x != 0
        lz = np.zeros(len(x), dtype=np.int64)
        tz = np.zeros(len(x), dtype=np.int64)
        if nz.any():
            lz[nz] = np.minimum(_clz64(x[nz]), 31)
            tz[nz] = _ctz64(x[nz])
        xl = x.tolist()
        lzl = lz.tolist()
        tzl = tz.tolist()
        prev_lz, prev_tz = -1, -1
        for i in range(len(xl)):
            xi = xl[i]
            if xi == 0:
                w.write(0, 1)
                continue
            li, ti = lzl[i], tzl[i]
            if prev_lz >= 0 and li >= prev_lz and ti >= prev_tz:
                # reuse previous window
                w.write(0b10, 2)
                mlen = 64 - prev_lz - prev_tz
                w.write(xi >> prev_tz, mlen)
            else:
                w.write(0b11, 2)
                mlen = 64 - li - ti
                w.write(li, 5)
                w.write(mlen - 1, 6)
                w.write(xi >> ti, mlen)
                prev_lz, prev_tz = li, ti
    return _MAGIC_G + struct.pack("<IQ", n, cksum & (2**64 - 1)) + w.getvalue()


def gorilla_decode(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC_G:
        raise ValueError("bad gorilla block magic")
    n, cksum = struct.unpack_from("<IQ", blob, 4)
    out = np.empty(n, dtype=np.uint64)
    if n:
        r = _BitReader(blob[16:])
        cur = r.read(64)
        out[0] = cur
        prev_lz = prev_tz = -1
        for i in range(1, n):
            c = r.read(1)
            if c == 0:
                out[i] = cur
                continue
            c2 = r.read(1)
            if c2 == 0:
                mlen = 64 - prev_lz - prev_tz
                xi = r.read(mlen) << prev_tz
            else:
                prev_lz = r.read(5)
                mlen = r.read(6) + 1
                prev_tz = 64 - prev_lz - mlen
                xi = r.read(mlen) << prev_tz
            cur ^= xi
            out[i] = cur
    if n and _stream_checksum(out) != cksum:
        raise ValueError("gorilla block checksum mismatch")
    return out.view(np.float64)


def dod_encode(offsets: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (monotone not required)."""
    o = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(o)
    cksum = _stream_checksum(o.view(np.uint64))
    w = _BitWriter()
    if n:
        w.write(int(o[0]) & (2**64 - 1), 64)
    if n > 1:
        w.write(int(o[1] - o[0]) & (2**64 - 1), 64)
        dod = np.diff(np.diff(o))
        for d in dod.tolist():
            if d == 0:
                w.write(0, 1)
            elif -63 <= d <= 64:
                w.write(0b10, 2)
                w.write(d + 63, 7)
            elif -255 <= d <= 256:
                w.write(0b110, 3)
                w.write(d + 255, 9)
            elif -2047 <= d <= 2048:
                w.write(0b1110, 4)
                w.write(d + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(d & (2**64 - 1), 64)
    return _MAGIC_D + struct.pack("<IQ", n, cksum & (2**64 - 1)) + w.getvalue()


def dod_decode(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC_D:
        raise ValueError("bad dod block magic")
    n, cksum = struct.unpack_from("<IQ", blob, 4)
    out = np.empty(n, dtype=np.int64)
    if n:
        r = _BitReader(blob[16:])

        def _signed64(u: int) -> int:
            return u - 2**64 if u >= 2**63 else u

        out[0] = _signed64(r.read(64))
        if n > 1:
            delta = _signed64(r.read(64))
            out[1] = out[0] + delta
            for i in range(2, n):
                if r.read(1) == 0:
                    d = 0
                elif r.read(1) == 0:
                    d = r.read(7) - 63
                elif r.read(1) == 0:
                    d = r.read(9) - 255
                elif r.read(1) == 0:
                    d = r.read(12) - 2047
                else:
                    d = _signed64(r.read(64))
                delta += d
                out[i] = out[i - 1] + delta
    if n and _stream_checksum(out.view(np.uint64)) != cksum:
        raise ValueError("dod block checksum mismatch")
    return out
