"""FLAC (Free Lossless Audio Codec, RFC 9639 / xiph spec) decoder +
fixture encoder in pure numpy/stdlib.

Decoder scope — the full subset real encoders emit:
- STREAMINFO + skipped metadata blocks,
- frame headers (blocksize/rate/bps codes, UTF-8-coded frame number,
  CRC-8 verified) and frame CRC-16 verified,
- subframe types CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC
  (orders 1-32, signed quantized coefficients + shift), wasted bits,
- partitioned Rice residuals (4- and 5-bit parameters, raw-bits
  escape),
- stereo decorrelation: left/side, right/side, mid/side.

FLAC is LOSSLESS: decode(encode(x)) == x exactly, which makes the
media-pipeline oracle content-derived like PNG/GIF (the golden script
recomputes features from the raw samples with no codec in the loop).

The fixture encoder emits independent-channel frames with VERBATIM,
CONSTANT or FIXED(0-2) subframes and partition-order-0 Rice residuals
— enough to exercise every decoder path except LPC/decorrelation,
which the tests drive with hand-built streams.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

_BLOCKSIZE_CODE = {192: 0b0001}
for _n in range(2, 6):
    _BLOCKSIZE_CODE[576 * 2 ** (_n - 2)] = _n
for _n in range(8, 16):
    _BLOCKSIZE_CODE[256 * 2 ** (_n - 8)] = _n

_SAMPLE_SIZE_BITS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                     0b110: 24, 0b111: 32}
_SAMPLE_SIZE_CODE = {v: k for k, v in _SAMPLE_SIZE_BITS.items()}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes (no unstuffing — FLAC frames are
    raw), tracking the byte span for CRC verification."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # next unread byte
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


class _BitsW:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, v: int, bits: int) -> None:
        self.write(v & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style frame/sample number (1-7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: "_BitsW", v: int) -> None:
    """UTF-8-style coded number, 1-7 bytes (inverse of
    _read_coded_number) — covers every legal frame number."""
    if v < 0x80:
        bw.write(v, 8)
        return
    if v >= (1 << 36):
        raise ValueError(f"FLAC coded number {v} exceeds 36 bits")
    for nbytes in range(2, 8):
        # payload bits: (7 - nbytes) in the lead byte (0 for 7 bytes),
        # plus 6 per continuation byte
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        if v < (1 << payload_bits):
            break
    lead_bits = 7 - nbytes if nbytes < 7 else 0
    lead = (0xFF << (8 - nbytes)) & 0xFF
    bw.write(lead | ((v >> (6 * (nbytes - 1))) & ((1 << lead_bits) - 1)), 8)
    for k in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        n = blocksize >> porder
        if p == 0:
            n -= order
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out[k] = br.read_signed(raw) if raw else 0
                k += 1
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[k] = (u >> 1) ^ -(u & 1)  # zigzag -> signed
                k += 1
    return out


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        s = np.full(blocksize, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        s = np.array([br.read_signed(bps) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = np.array([br.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        res = _decode_residual(br, blocksize, order)
        # order-k fixed prediction inverts as k successive cumsums:
        # res = D^k(s), and each cumsum integrates one difference level
        # seeded by the warmup's (level)-th difference
        cur = res
        for j in range(order - 1, -1, -1):
            seed = int(np.diff(warm, n=j)[0])
            cur = np.cumsum(np.concatenate([[seed], cur]))
        s = cur if order else res.copy()
    elif t >= 32:  # LPC
        order = t - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coef = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        s = np.empty(blocksize, dtype=np.int64)
        s[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coef[j] * int(s[i - 1 - j])
            s[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        s <<= wasted
    return s


def decode_flac_int(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode FLAC -> (int32 samples, shape (n,) mono or (n, ch),
    sample_rate, bits_per_sample). CRC-8/16 verified per frame."""
    if payload[:4] != MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            rate = (int.from_bytes(body[10:13], "big") >> 4) & 0xFFFFF
            n_ch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = int.from_bytes(body[13:18], "big") & ((1 << 36) - 1)
            streaminfo = (rate, n_ch, bps, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, n_ch, bps, total = streaminfo

    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        br = _Bits(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad FLAC frame sync at {frame_start}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        elif bs_code == 0b0001:
            blocksize = 192
        elif 2 <= bs_code <= 5:
            blocksize = 576 * 2 ** (bs_code - 2)
        elif bs_code >= 8:
            blocksize = 256 * 2 ** (bs_code - 8)
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        if size_code == 0:
            frame_bps = bps
        elif size_code in _SAMPLE_SIZE_BITS:
            frame_bps = _SAMPLE_SIZE_BITS[size_code]
        else:
            raise ValueError(f"reserved FLAC sample size code {size_code}")
        # all header fields are byte-aligned, so br.pos now points at
        # the CRC-8 byte itself
        if _crc8(payload[frame_start : br.pos]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if chan_code < 8:
            if chan_code + 1 != n_ch:
                raise ValueError("frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, blocksize, frame_bps)
                    for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):  # L/S, R/S, M/S
            if n_ch != 2:
                raise ValueError("decorrelated frame in non-stereo stream")
            extra0 = 1 if chan_code == 9 else 0
            extra1 = 1 if chan_code in (8, 10) else 0
            a = _decode_subframe(br, blocksize, frame_bps + extra0)
            b = _decode_subframe(br, blocksize, frame_bps + extra1)
            if chan_code == 8:  # left/side
                subs = [a, a - b]
            elif chan_code == 9:  # side/right
                subs = [b + a, b]
            else:  # mid/side
                side = b
                left = a + ((side + (side & 1)) >> 1)
                subs = [left, left - side]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        br.align()
        crc_pos = br.pos
        if _crc16(payload[frame_start:crc_pos]) != \
                int.from_bytes(payload[crc_pos : crc_pos + 2], "big"):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = crc_pos + 2
        for c in range(n_ch):
            chans[c].append(subs[c])
        got += blocksize

    if total and got < total:
        raise ValueError(
            f"FLAC stream truncated: decoded {got} of {total} samples")
    cols = [
        np.concatenate(ch).astype(np.int32) if ch
        else np.empty(0, np.int32)
        for ch in chans
    ]
    if total:
        cols = [c[:total] for c in cols]
    x = cols[0] if n_ch == 1 else np.stack(cols, axis=1)
    return x, rate, bps


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Registry-facing decode: float32 samples normalized to [-1, 1)
    (the decode_wav convention), plus sample rate."""
    x, rate, bps = decode_flac_int(payload)
    return x.astype(np.float32) / float(1 << (bps - 1)), rate


# ---------------------------------------------------------------------------
# fixture encoder (independent channels; VERBATIM / CONSTANT / FIXED 0-2)
# ---------------------------------------------------------------------------


def _best_rice_param(res: np.ndarray, pbits: int = 4) -> int:
    best, best_cost = 0, None
    u = np.abs(res * 2) - (res < 0)
    for param in range(min(15, (1 << pbits) - 1)):
        cost = int(np.sum((u >> param) + 1 + param))
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    return best


def _encode_residual(bw: _BitsW, res: np.ndarray) -> None:
    bw.write(0, 2)   # rice, 4-bit params
    bw.write(0, 4)   # partition order 0
    param = _best_rice_param(res)
    bw.write(param, 4)
    for v in res:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag map
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitsW, s: np.ndarray, bps: int,
                     mode: str) -> None:
    bw.write(0, 1)
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(int(s[0]), bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write_signed(int(v), bps)
        return
    order = int(mode[-1])  # "fixed0".."fixed2"
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    coef = _FIXED_COEF[order]
    res = s[order:].astype(np.int64).copy()
    for j, c in enumerate(coef):
        res -= c * s[order - 1 - j : len(s) - 1 - j].astype(np.int64)
    _encode_residual(bw, res)


def encode_flac(samples: np.ndarray, sample_rate: int = 8000,
                bps: int = 16, block_size: int = 4096,
                mode: str = "fixed2") -> bytes:
    """Encode int samples ((n,) mono or (n, ch) multichannel, each in
    [-2^(bps-1), 2^(bps-1))) as a FLAC stream with independent-channel
    subframes of the given ``mode`` (constant requires genuinely
    constant input). Bit-exact round trip by construction."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    info = bytearray()
    info += struct.pack(">HH", min(block_size, max(n, 16)), block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16  # md5 unset
    out = bytearray(MAGIC)
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        blocksize = blk.shape[0]
        hdr = _BitsW()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        bs_code = _BLOCKSIZE_CODE.get(blocksize)
        hdr.write(bs_code if bs_code else (0b0110 if blocksize <= 256
                                           else 0b0111), 4)
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(n_ch - 1, 4)
        hdr.write(_SAMPLE_SIZE_CODE[bps], 3)
        hdr.write(0, 1)
        _write_coded_number(hdr, frame_no)
        if bs_code is None:
            if blocksize <= 256:
                hdr.write(blocksize - 1, 8)
            else:
                hdr.write(blocksize - 1, 16)
        hdr.align()
        frame = bytearray(hdr.buf)
        frame.append(_crc8(bytes(frame)))
        body = _BitsW()
        for c in range(n_ch):
            s = blk[:, c]
            m = mode
            if m.startswith("fixed") and blocksize <= int(m[-1]):
                m = "verbatim"
            _encode_subframe(body, s, bps, m)
        body.align()
        frame += body.buf
        frame += _crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
