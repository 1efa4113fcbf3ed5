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


def _pack_fields(fields: np.ndarray, widths: np.ndarray) -> bytes:
    """MSB-first concatenation of variable-width bitfields, vectorized.

    ``fields`` uint64 values, ``widths`` their bit widths (1..64). Each
    field is exploded to its bits (np.repeat + per-position shifts) and
    the whole stream packed with np.packbits — no per-value Python loop.
    """
    widths = np.asarray(widths, dtype=np.int64)
    fields = np.asarray(fields, dtype=np.uint64)
    if len(widths) == 0:
        return b""
    # MSB-align every field in its own 64-bit lane, explode to a fixed
    # (n, 64) bit matrix, then boolean-select each lane's live bits —
    # fixed-shape ops only, no per-bit index arrays
    top = fields << (64 - widths).astype(np.uint64)
    lanes = top.astype(">u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(lanes, axis=1)
    mask = np.arange(64, dtype=np.int64)[None, :] < widths[:, None]
    return np.packbits(bits[mask]).tobytes()


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
    payload = b""
    if n:
        x = bits[1:] ^ bits[:-1]
        m = len(x)
        nz = x != 0
        lz = np.zeros(m, dtype=np.int64)
        tz = np.zeros(m, dtype=np.int64)
        if nz.any():
            lz[nz] = np.minimum(_clz64(x[nz]), 31)
            tz[nz] = _ctz64(x[nz])
        # sequential pass ONLY for the window-reuse decision (the live
        # (prev_lz, prev_tz) state is a true serial dependency); all bit
        # math and packing below is vectorized
        reuse = np.zeros(m, dtype=bool)
        gov_lz = lz.copy()
        gov_tz = tz.copy()
        nz_idx = np.flatnonzero(nz)
        lzl, tzl = lz.tolist(), tz.tolist()
        prev_lz, prev_tz = -1, -1
        reuse_l, glz_l, gtz_l = [], [], []
        for i in nz_idx.tolist():
            li, ti = lzl[i], tzl[i]
            if prev_lz >= 0 and li >= prev_lz and ti >= prev_tz:
                reuse_l.append(True)
                glz_l.append(prev_lz)
                gtz_l.append(prev_tz)
            else:
                reuse_l.append(False)
                glz_l.append(li)
                gtz_l.append(ti)
                prev_lz, prev_tz = li, ti
        if len(nz_idx):
            reuse[nz_idx] = reuse_l
            gov_lz[nz_idx] = glz_l
            gov_tz[nz_idx] = gtz_l
        # field 1: control (1 bit '0' | 2 bits '10' | 13 bits '11'+lz+len)
        mlen = 64 - gov_lz - gov_tz
        new = nz & ~reuse
        f1 = np.zeros(m, dtype=np.uint64)
        w1 = np.ones(m, dtype=np.int64)
        f1[reuse] = np.uint64(0b10)
        w1[reuse] = 2
        f1[new] = (
            np.uint64(0b11 << 11)
            | (lz[new].astype(np.uint64) << np.uint64(6))
            | (mlen[new] - 1).astype(np.uint64)
        )
        w1[new] = 13
        # field 2: significant payload bits (absent for zero-XOR)
        f2 = x >> gov_tz.astype(np.uint64)
        w2 = np.zeros(m, dtype=np.int64)
        w2[nz] = mlen[nz]
        fields = np.empty(1 + 2 * m, dtype=np.uint64)
        widths = np.empty(1 + 2 * m, dtype=np.int64)
        fields[0], widths[0] = bits[0], 64
        fields[1::2], widths[1::2] = f1, w1
        fields[2::2], widths[2::2] = f2, w2
        keep = widths > 0
        payload = _pack_fields(fields[keep], widths[keep])
    return _MAGIC_G + struct.pack("<IQ", n, cksum & (2**64 - 1)) + payload


def gorilla_decode(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC_G:
        raise ValueError("bad gorilla block magic")
    n, cksum = struct.unpack_from("<IQ", blob, 4)
    out = np.empty(n, dtype=np.uint64)
    if n:
        # Fused token reads: the longest token is 13 + 64 = 77 bits, so a
        # single 12-byte (96-bit) big-endian chunk anchored at the token's
        # byte always covers it (offset <= 7 leaves >= 89 bits). One
        # int.from_bytes per token instead of 2-3 BitReader calls —
        # measured ~2.5x on the 1M-value decode path.
        buf = blob[16:] + b"\x00" * 16
        from_bytes = int.from_bytes
        cur = from_bytes(buf[:8], "big")
        out[0] = cur
        pos = 64
        prev_lz = prev_tz = -1
        for i in range(1, n):
            p8 = pos >> 3
            off = pos - (p8 << 3)
            chunk = from_bytes(buf[p8:p8 + 12], "big")
            if not (chunk >> (95 - off)) & 1:
                out[i] = cur
                pos += 1
                continue
            if not (chunk >> (94 - off)) & 1:
                mlen = 64 - prev_lz - prev_tz
                xi = ((chunk >> (94 - off - mlen)) & ((1 << mlen) - 1)) << prev_tz
                pos += 2 + mlen
            else:
                prev_lz = (chunk >> (89 - off)) & 31
                mlen = ((chunk >> (83 - off)) & 63) + 1
                prev_tz = 64 - prev_lz - mlen
                xi = ((chunk >> (83 - off - mlen)) & ((1 << mlen) - 1)) << prev_tz
                pos += 13 + mlen
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
    parts = []
    if n:
        parts.append((np.uint64(int(o[0]) & (2**64 - 1)), 64))
    if n > 1:
        parts.append((np.uint64(int(o[1] - o[0]) & (2**64 - 1)), 64))
        d = np.diff(np.diff(o))
        m = len(d)
        du = d.view(np.uint64)
        # bucket classification + control|payload fused into one field
        # (fully vectorized — no serial state in delta-of-delta)
        b0 = d == 0
        b7 = ~b0 & (d >= -63) & (d <= 64)
        b9 = ~b0 & ~b7 & (d >= -255) & (d <= 256)
        b12 = ~b0 & ~b7 & ~b9 & (d >= -2047) & (d <= 2048)
        b64 = ~(b0 | b7 | b9 | b12)
        f1 = np.zeros(m, dtype=np.uint64)
        w1 = np.ones(m, dtype=np.int64)
        f1[b7] = np.uint64(0b10 << 7) | (d[b7] + 63).astype(np.uint64)
        w1[b7] = 9
        f1[b9] = np.uint64(0b110 << 9) | (d[b9] + 255).astype(np.uint64)
        w1[b9] = 12
        f1[b12] = np.uint64(0b1110 << 12) | (d[b12] + 2047).astype(np.uint64)
        w1[b12] = 16
        f1[b64] = np.uint64(0b1111)
        w1[b64] = 4
        f2 = np.zeros(m, dtype=np.uint64)
        w2 = np.zeros(m, dtype=np.int64)
        f2[b64] = du[b64]
        w2[b64] = 64
        fields = np.empty(len(parts) + 2 * m, dtype=np.uint64)
        widths = np.empty(len(parts) + 2 * m, dtype=np.int64)
        for i, (fv, fw) in enumerate(parts):
            fields[i], widths[i] = fv, fw
        k = len(parts)
        fields[k::2], widths[k::2] = f1, w1
        fields[k + 1 :: 2], widths[k + 1 :: 2] = f2, w2
        keep = widths > 0
        return _MAGIC_D + struct.pack("<IQ", n, cksum & (2**64 - 1)) + _pack_fields(
            fields[keep], widths[keep]
        )
    payload = (
        _pack_fields(
            np.array([p[0] for p in parts], dtype=np.uint64),
            np.array([p[1] for p in parts], dtype=np.int64),
        )
        if parts
        else b""
    )
    return _MAGIC_D + struct.pack("<IQ", n, cksum & (2**64 - 1)) + payload


def dod_decode(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC_D:
        raise ValueError("bad dod block magic")
    n, cksum = struct.unpack_from("<IQ", blob, 4)
    out = np.empty(n, dtype=np.int64)
    if n:
        buf = blob[16:] + b"\x00" * 16
        from_bytes = int.from_bytes

        def _signed64(u: int) -> int:
            return u - 2**64 if u >= 2**63 else u

        out[0] = _signed64(from_bytes(buf[:8], "big"))
        if n > 1:
            delta = _signed64(from_bytes(buf[8:16], "big"))
            # int64 wraparound semantics, matching the encoder's masking
            out[1] = _signed64((int(out[0]) + delta) & (2**64 - 1))
            pos = 128
            prev = int(out[1])
            for i in range(2, n):
                p8 = pos >> 3
                off = pos - (p8 << 3)
                chunk = from_bytes(buf[p8:p8 + 12], "big")
                # fused control prefix + payload (longest token 68 bits)
                if not (chunk >> (95 - off)) & 1:
                    d = 0
                    pos += 1
                elif not (chunk >> (94 - off)) & 1:
                    d = ((chunk >> (87 - off)) & 127) - 63
                    pos += 9
                elif not (chunk >> (93 - off)) & 1:
                    d = ((chunk >> (84 - off)) & 511) - 255
                    pos += 12
                elif not (chunk >> (92 - off)) & 1:
                    d = ((chunk >> (80 - off)) & 4095) - 2047
                    pos += 16
                else:
                    d = _signed64((chunk >> (28 - off)) & ((1 << 64) - 1))
                    pos += 68
                delta = _signed64((delta + d) & (2**64 - 1))
                prev = _signed64((prev + delta) & (2**64 - 1))
                out[i] = prev
    if n and _stream_checksum(out.view(np.uint64)) != cksum:
        raise ValueError("dod block checksum mismatch")
    return out
