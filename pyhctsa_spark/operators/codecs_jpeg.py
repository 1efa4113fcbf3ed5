"""Baseline JPEG (ITU-T T.81) decoder + fixture encoder in pure numpy.

Decoder scope — baseline sequential DCT, 8-bit samples (SOF0):
- marker parse (APPn/COM skipped, DQT 8/16-bit, DHT, DRI, SOS),
- Huffman entropy decode with 0xFF00 byte-unstuffing and RSTn restart
  markers,
- DC prediction + EXTEND, AC run-length (ZRL/EOB) per spec §F.2,
- dequantize, de-zigzag, exact floating IDCT (orthonormal 8x8 DCT-II
  matrix product — the spec's Annex A reference formula in matrix
  form), level shift +128, clamp,
- chroma upsampling by sample replication, JFIF YCbCr -> RGB.

Progressive (SOF2) dispatches to codecs_jpeg_progressive, lossless
(SOF3) to codecs_jpeg_lossless; arithmetic coding, 12-bit DCT and
hierarchical modes raise NotImplementedError — the registry falls
through to the Pillow adapter for those when present.

The encoder is fixture-grade: 4:4:4 or 4:2:0, Annex K example quant
tables scaled by libjpeg's quality formula, Annex K typical Huffman
tables, optional restart intervals.

Performance note: the entropy decode is a per-symbol Python bit loop —
fine for thumbnails/fixtures and correctness gates, ~O(seconds) for
megapixel images. On a real cluster the registry prefers this codec
only when Pillow is absent; ship Pillow via --py-files for bulk
decoding of large photographic corpora (SURVEY §7.3). JPEG is lossy, so tests validate
decode(encode(x)) within quantization tolerance plus spec-arithmetic
micro-goldens (hand-built streams with known coefficients, expected
pixels computed by the Annex A double-loop IDCT independently in the
test).

Reference: public ITU-T T.81 spec; table data from its Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of zigzag sequence -> (row, col) flat position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 example quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: C[k, n] = a_k cos((2n+1)k pi / 16)
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16)
_DCT_C[0] *= 1 / np.sqrt(2)
_DCT_C *= 0.5  # so block_dct = C @ block @ C.T is the spec's scaled DCT


def idct2(coef: np.ndarray) -> np.ndarray:
    """Spec Annex A inverse DCT of one or more 8x8 blocks
    (..., 8, 8) -> same shape float64."""
    return _DCT_C.T @ coef @ _DCT_C


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward DCT (..., 8, 8) with the spec's normalization."""
    return _DCT_C @ block @ _DCT_C.T


def build_huffman_decoder(bits: list[int], vals: list[int]):
    """Spec §C.2 code assignment -> dict {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def build_huffman_encoder(bits: list[int], vals: list[int]):
    """symbol -> (code, length)."""
    enc: dict[int, tuple[int, int]] = {}
    for (length, code), sym in build_huffman_decoder(bits, vals).items():
        enc[sym] = (code, length)
    return enc


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and restart-marker awareness."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past EOI
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: stop at byte boundary
                else:
                    return  # EOI or next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Discard buffered bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """Spec §F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> uint8 (H, W, 3) RGB (grayscale JPEGs
    return (H, W))."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, o).astype(np.int32)
                    o += 128
                dq = np.zeros(64, np.int32)
                dq[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                tbl = build_huffman_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # progressive: multi-scan decoder
            from pyhctsa_spark.operators.codecs_jpeg_progressive import (
                decode_jpeg_progressive,
            )

            return decode_jpeg_progressive(payload)
        elif marker == 0xC3:  # lossless (Annex H): predictive decoder
            from pyhctsa_spark.operators.codecs_jpeg_lossless import (
                decode_jpeg_lossless,
            )

            return decode_jpeg_lossless(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) — "
                "arithmetic/hierarchical modes need the Pillow "
                "adapter")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cs, "td": tdta >> 4,
                                   "ta": tdta & 0x0F})
            scan_start = pos + seglen
            break  # baseline: single scan
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]]["td"] = sc["td"]
        by_id[sc["id"]]["ta"] = sc["ta"]
    # per-component sample planes at full MCU-padded resolution
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    ]
    reader = _BitReader(payload, scan_start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, np.int32)
                        t = reader.decode_symbol(huff_dc[c["td"]])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = idct2(
                            coef.reshape(8, 8) * qt[c["tq"]]) + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full res by sample replication, crop to (h, w)
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# fixture-grade encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality -> scaling formula."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (tbl * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32).reshape(8, 8)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    zz = coef.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _mag_cat(diff)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def prepare_jpeg_planes(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder prep (baseline AND progressive — one copy, so a
    subsampling/quantization fix can never drift between them): color
    convert, sampling factors, quantization tables, and MCU-grid-padded
    (box-averaged where subsampled) planes. Returns
    (gray, h, w, prepped, samp, qts, dq, hmax, vmax, mcux, mcuy)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        planes = [img - 128.0]
        samp = [(1, 1)]
        qts = [0]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else \
               [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its own MCU grid (edge replication), and box
    # average subsampled chroma
    prepped = []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):  # subsampled plane
            fy, fx = vmax // sv, hmax // sh
            ph = ((h + fy - 1) // fy) * fy
            pw = ((w + fx - 1) // fx) * fx
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        prepped.append(p)
    dq = [qy, qc] if not gray else [qy]
    return gray, h, w, prepped, samp, qts, dq, hmax, vmax, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 RGB (H, W, 3) or grayscale (H, W) as baseline JPEG.
    ``subsample=True`` uses 4:2:0 chroma (2x2 box average); otherwise
    4:4:4."""
    (gray, h, w, prepped, samp, qts, dq, hmax, vmax, mcux, mcuy) = \
        prepare_jpeg_planes(img, quality, subsample)
    dc_tabs = [build_huffman_encoder(DC_LUMA_BITS, DC_LUMA_VALS),
               build_huffman_encoder(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [build_huffman_encoder(AC_LUMA_BITS, AC_LUMA_VALS),
               build_huffman_encoder(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    tab_of = [0] if gray else [0, 1, 1]

    bw = _BitWriter()
    pred = [0] * len(prepped)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * len(prepped)
            for ci, p in enumerate(prepped):
                sh, sv = samp[ci]
                q = dq[qts[ci]]
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        coef = np.round(fdct2(block) / q).astype(np.int32)
                        pred[ci] = _encode_block(
                            bw, coef, pred[ci],
                            dc_tabs[tab_of[ci]], ac_tabs[tab_of[ci]])
            mcu_count += 1
    bw.flush()

    # assemble the stream
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(dq):
        out += seg(0xDB, bytes([ti]) + bytes(
            int(x) for x in q.reshape(-1)[ZIGZAG]))
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qts[ci]])
    out += seg(0xC0, sof)
    huf_specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                 (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huf_specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                      (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tid, bits, vals in huf_specs:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
