"""ITU-T T.81 Annex H lossless JPEG (SOF3) — pure-numpy decoder plus a
fixture encoder, closing the "jpeg-lossless" entry of the compressed-
codec boundary (the predictive mode medical/scientific archives use;
no DCT, bit-exact round trip by construction).

Decoder scope:
- single scan, 1..4 components, all sampling factors 1x1
  (the only layout lossless encoders emit in practice),
- sample precision 2..16 bits, predictors 1..7, point transform Al,
- byte stuffing handled by the shared ``_BitReader``.
Restart intervals raise a typed ``NotImplementedError`` (the prediction
reset rules add states the fixture corpus never exercises); arithmetic
coding and hierarchical mode stay behind the Pillow-adapter boundary
documented in operators/codecs.py.

The encoder is the test-fixture side: one fixed 5-bit Huffman table
over the 17 SSSS categories (canonical codes 0..16 — the all-ones
codeword is never assigned), any predictor, any precision. Losslessness
makes the oracle the strongest kind: decode(encode(img)) must equal img
exactly, so goldens derive from raw content with no codec in the loop
(same pattern as FLAC, scripts/gen_media_flac_golden.py).

Entropy decode is a sequential per-sample Huffman walk (inherent to the
format — each prediction depends on the previous reconstructed
neighbours), so this path is for fixture-scale payloads; production
pipelines register the Pillow adapter for bulk lossless JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

from pyhctsa_spark.operators.codecs_jpeg import (
    _BitReader,
    _BitWriter,
    _extend,
    _mag_cat,
    build_huffman_decoder,
    build_huffman_encoder,
)

# one Huffman table for all 17 SSSS categories: 17 codes of length 5
_FIX_BITS = [0, 0, 0, 0, 17] + [0] * 11
_FIX_VALS = list(range(17))


def _predict(pred: int, ra: int, rb: int, rc: int) -> int:
    if pred == 1:
        return ra
    if pred == 2:
        return rb
    if pred == 3:
        return rc
    if pred == 4:
        return ra + rb - rc
    if pred == 5:
        return ra + ((rb - rc) >> 1)
    if pred == 6:
        return rb + ((ra - rc) >> 1)
    if pred == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {pred}")


def decode_jpeg_lossless(payload: bytes) -> np.ndarray:
    """Decode an SOF3 lossless JPEG. Returns uint8 when the effective
    precision fits 8 bits, else uint16; shape (H, W) for one component,
    (H, W, C) otherwise. Samples are left-shifted by the point
    transform per H.2.3 (low bits are zero when Al > 0)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    huff: dict[int, dict] = {}
    frame = None
    scan = None
    scan_start = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT (lossless uses DC-class tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                if tc == 0:
                    huff[th] = build_huffman_decoder(bits, vals)
                o += 17 + nv
        elif marker == 0xC3:  # SOF3
            prec = body[0]
            if not 2 <= prec <= 16:
                raise ValueError(f"invalid lossless precision {prec}")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, _tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG (sampling != 1x1) "
                        "needs the Pillow adapter"
                    )
                comps.append(cid)
            frame = {"prec": prec, "h": h, "w": w, "comps": comps}
        elif marker == 0xDD:
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise NotImplementedError(
                    "restart intervals in lossless JPEG are unsupported"
                )
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sc = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                sc.append({"id": cs, "td": tdta >> 4})
            ss = body[1 + 2 * ns]  # predictor selector
            al = body[3 + 2 * ns] & 0x0F  # point transform
            if not 1 <= ss <= 7:
                raise ValueError(f"invalid lossless predictor Ss={ss}")
            scan = {"comps": sc, "pred": ss, "pt": al}
            scan_start = pos + seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("lossless JPEG missing SOF3/SOS")
    if [s["id"] for s in scan["comps"]] != frame["comps"]:
        raise NotImplementedError(
            "lossless JPEG with partial/reordered scans is unsupported"
        )

    prec, h, w = frame["prec"], frame["h"], frame["w"]
    nc = len(frame["comps"])
    pred_sel, pt = scan["pred"], scan["pt"]
    default = 1 << (prec - pt - 1)
    tables = [huff[s["td"]] for s in scan["comps"]]
    planes = np.zeros((nc, h, w), np.int32)
    br = _BitReader(payload, scan_start)
    # interleaved MCU = one sample per component; the first line uses
    # predictor 1 after the top-left default, the first column uses Rb
    # (T.81 H.1.2.1), everything mod 2^16 (H.1.2.3)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                s = br.decode_symbol(tables[ci])
                if s == 16:
                    diff = 32768
                elif s == 0:
                    diff = 0
                else:
                    diff = _extend(br.read_bits(s), s)
                p = planes[ci]
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    px = _predict(
                        pred_sel,
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                planes[ci, y, x] = (px + diff) & 0xFFFF
    # P is the ORIGINAL sample precision (the encoder divides by 2^Al
    # before coding), so re-shifted output fits prec bits exactly
    out = (planes.astype(np.int64) << pt).astype(
        np.uint8 if prec <= 8 else np.uint16
    )
    return out[0] if nc == 1 else np.moveaxis(out, 0, 2)


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 4,
    precision: int | None = None,
    point_transform: int = 0,
) -> bytes:
    """Fixture encoder: SOF3 lossless JPEG of a (H, W) or (H, W, C)
    integer image. ``precision`` defaults to 8 for uint8 input, 16 for
    uint16. With ``point_transform`` = Al > 0 the encoder divides
    samples by 2^Al first (the spec's only lossy knob); the decoder
    returns them re-shifted, so decode(encode(img)) == (img >> Al) << Al
    and equals img exactly at Al = 0."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] > 4:
        raise ValueError(f"expected (H, W[, C<=4]) image, got {img.shape}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    if precision is None:
        precision = 8 if img.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"invalid precision {precision}")
    pt = int(point_transform)
    if not 0 <= pt < precision:
        raise ValueError(f"invalid point transform {point_transform}")
    h, w, nc = img.shape
    samples = (img.astype(np.int64) >> pt).astype(np.int32)
    if samples.max(initial=0) >= (1 << (precision - pt)):
        raise ValueError("sample exceeds declared precision")
    default = 1 << (precision - pt - 1)
    enc = build_huffman_encoder(_FIX_BITS, _FIX_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                p = samples[:, :, ci]
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    px = _predict(
                        predictor,
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                ssss = _mag_cat(diff)
                code, ln = enc[ssss]
                bw.write(code, ln)
                if ssss == 16:
                    continue  # diff == -32768: no appended bits
                if ssss:
                    v = diff if diff >= 0 else diff + (1 << ssss) - 1
                    bw.write(v, ssss)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    dht = bytes([0x00]) + bytes(_FIX_BITS) + bytes(_FIX_VALS)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    return (
        b"\xff\xd8"
        + seg(0xC4, dht)
        + seg(0xC3, sof)
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )
