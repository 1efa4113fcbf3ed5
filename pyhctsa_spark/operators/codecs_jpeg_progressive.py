"""Progressive JPEG (ITU-T T.81 §G, SOF2): spectral-selection +
successive-approximation Huffman decoding, pure numpy — the variant
~⅓ of web JPEGs use, previously behind the Pillow boundary.

A progressive stream carries the SAME quantized DCT coefficients as a
baseline stream, split across multiple scans: DC first/refinement
passes (interleaved across components) and per-component AC band scans
(Ss..Se) at successively finer bit precision (Al). Decoding therefore
accumulates coefficients across scans into per-component arrays and
runs dequantize + IDCT once at the end — which also yields the
strongest possible test: a progressive encoding of an image must
decode EXACTLY equal to the baseline encoding at the same quality
(tests/test_codecs_jpeg_progressive.py asserts bit-equality).

The in-repo fixture encoder emits a 5-phase scan script (DC first at
Al=1, AC bands 1-5 and 6-63 at Al=1 per component, DC refinement, AC
refinement per component) with single-block EOB runs so the standard
Huffman tables suffice. Refinement-pass semantics (correction bits for
history-nonzero coefficients, buffered through ZRL/new-nonzero
emissions) follow §G.1.2.3; successive approximation uses arithmetic
shifts for DC (two's complement, matching the spec's
point-transform-of-signed-value) and magnitude shifts for AC.

Reference behavior: pyhctsa has no media stack (SURVEY §2.0); this
closes the progressive-JPEG item from the codec-boundary list.
"""

from __future__ import annotations

import struct

import numpy as np

from pyhctsa_spark.operators.codecs_jpeg import (
    AC_CHROMA_BITS, AC_CHROMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS,
    DC_CHROMA_BITS, DC_CHROMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
    QUANT_CHROMA, QUANT_LUMA, ZIGZAG, _BitReader, _BitWriter, _extend,
    _mag_cat, build_huffman_decoder,
    build_huffman_encoder, fdct2, idct2, prepare_jpeg_planes,
)

# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _next_marker(payload: bytes, pos: int) -> int:
    """First offset >= pos of a real marker (0xFF + non-stuffing,
    non-RST, non-fill byte; T.81 B.1.1.2 allows any number of 0xFF
    fill bytes before a marker — return the LAST 0xFF of the run)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00, 0xFF) \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def _table(tabs: dict, idx: int, kind: str) -> dict:
    if idx not in tabs:
        raise ValueError(
            f"progressive JPEG missing {kind} Huffman table {idx}")
    return tabs[idx]


def _dc_first(reader, block, pred, ci, dctab, al):
    t = reader.decode_symbol(dctab)
    pred[ci] += _extend(reader.read_bits(t), t)
    block[0] = pred[ci] << al


def _dc_refine(reader, block, al):
    if reader.read_bit():
        block[0] = int(block[0]) | (1 << al)


def _ac_first(reader, block, actab, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("progressive AC run past band end")
            block[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return eobrun


def _ac_refine(reader, block, actab, ss, se, al, eobrun):
    """§G.1.2.3: correction bits for history-nonzero coefficients are
    interleaved with run-length codes for newly-nonzero ones. Bitwise
    ops run on two's-complement Python ints, matching the spec's signed
    representation exactly."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: r stays 15 -> skip 16 zero-history coefficients
            else:
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(block[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG -> uint8 (H, W, 3) RGB, or
    (H, W) for grayscale."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] = []
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
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
                dq[ZIGZAG] = tbl
                qt[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    build_huffman_decoder(bits, vals)
                o += 17 + nv
        elif marker == 0xC2:
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # MCU-padded grid (interleaved DC scans touch it all);
                # non-interleaved scans cover only the ceil() prefix
                c["nbx_full"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
                c["nby_full"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
                coefs.append(np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), np.int32))
            frame = {"h": h, "w": w, "comps": comps, "hmax": hmax,
                     "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                ci = next((i for i, cc in enumerate(frame["comps"])
                           if cc["id"] == cs), None)
                if ci is None:
                    raise ValueError(
                        f"SOS references unknown component id {cs}")
                scan.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            reader = _BitReader(payload, pos + seglen)
            pred = [0] * len(frame["comps"])
            eobrun = 0
            if ns == 1:
                ci, td, ta = scan[0]
                c = frame["comps"][ci]
                nbx, nby = c["nbx_full"], c["nby_full"]
                for i in range(nbx * nby):
                    if restart_interval and i and i % restart_interval == 0:
                        reader.align_to_restart()
                        pred = [0] * len(frame["comps"])
                        eobrun = 0
                    by, bx = divmod(i, nbx)
                    block = coefs[ci][by, bx]
                    if ss == 0:
                        if ah == 0:
                            _dc_first(reader, block, pred, ci,
                                      _table(huff_dc, td, "DC"), al)
                        else:
                            _dc_refine(reader, block, al)
                    elif ah == 0:
                        eobrun = _ac_first(
                            reader, block, _table(huff_ac, ta, "AC"),
                            ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(
                            reader, block, _table(huff_ac, ta, "AC"),
                            ss, se, al, eobrun)
            else:
                if ss != 0:
                    raise ValueError("interleaved progressive AC scan")
                mcu = 0
                for my in range(frame["mcuy"]):
                    for mx in range(frame["mcux"]):
                        if restart_interval and mcu and \
                                mcu % restart_interval == 0:
                            reader.align_to_restart()
                            pred = [0] * len(frame["comps"])
                        for ci, td, _ta in scan:
                            c = frame["comps"][ci]
                            for v in range(c["v"]):
                                for hh in range(c["h"]):
                                    block = coefs[ci][my * c["v"] + v,
                                                      mx * c["h"] + hh]
                                    if ah == 0:
                                        _dc_first(
                                            reader, block, pred, ci,
                                            _table(huff_dc, td, "DC"), al)
                                    else:
                                        _dc_refine(reader, block, al)
                        mcu += 1
            pos = _next_marker(payload, reader.pos)
            continue
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_jpeg_progressive got a non-SOF2 frame — route "
                "through decode_jpeg")
        pos += seglen
    if frame is None:
        raise ValueError("JPEG missing SOF2")

    # dequantize + IDCT every (padded) block, then upsample/crop
    h, w = frame["h"], frame["w"]
    comps, hmax, vmax = frame["comps"], frame["hmax"], frame["vmax"]
    nat_idx = ZIGZAG  # zigzag position k lives at flat natural index
    out_planes = []
    for ci, c in enumerate(comps):
        nby, nbx, _ = coefs[ci].shape
        if c["tq"] not in qt:
            raise ValueError(
                f"progressive JPEG missing quantization table {c['tq']}"
            )
        q = qt[c["tq"]]
        # vectorized: de-zigzag the whole (nby, nbx, 64) stack at once,
        # batch-IDCT (idct2 accepts (..., 8, 8)), stitch block grid
        natural = np.zeros((nby, nbx, 64), np.int32)
        natural[..., nat_idx] = coefs[ci]
        blocks = idct2(natural.reshape(nby, nbx, 8, 8) * q) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# fixture-grade progressive encoder (4:4:4 / grayscale)
# ---------------------------------------------------------------------------


def _enc_dc_first(bw, order, pred, dc_encs, al):
    for ci, zz in order:
        dc = int(zz[0]) >> al  # arithmetic shift of the signed value
        diff = dc - pred[ci]
        pred[ci] = dc
        t = _mag_cat(diff)
        code, ln = dc_encs[ci][t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _enc_ac_first(bw, zz, ss, se, al, ac_enc):
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = (v if v >= 0 else -v) >> al  # magnitude shift
        vals.append(mag if v >= 0 else -mag)
    run = 0
    emitted_any = False
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        emitted_any = True
    if last_nz < len(vals) - 1 or not emitted_any:
        code, ln = ac_enc[0x00]  # EOB (single-block run)
        bw.write(code, ln)


def _enc_ac_refine(bw, zz, ss, se, al, ac_enc):
    absval = {}
    for k in range(ss, se + 1):
        v = int(zz[k])
        absval[k] = (v if v >= 0 else -v) >> al
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absval[k]
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if t > 1:
            # history-nonzero: buffer its correction bit; emitted after
            # the next symbol, in the order the decoder reads them
            br.append(t & 1)
            continue
        code, ln = ac_enc[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
        for bit in br:
            bw.write(bit, 1)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """Encode uint8 RGB (H, W, 3) or grayscale (H, W) as a progressive
    JPEG (5-phase scan script exercising spectral selection AND
    successive approximation in both DC and AC; ``subsample=True`` uses
    4:2:0 chroma, which also exercises the decoder's padded-MCU-grid
    vs full-grid distinction between interleaved DC and non-interleaved
    AC scans). Coefficients are quantized identically to
    ``encode_jpeg`` at the same quality, so both decode to the same
    (cropped) pixels."""
    (gray, h, w, prepped, samp, qts, dq, hmax, vmax, mcux, mcuy) = \
        prepare_jpeg_planes(img, quality, subsample)

    # quantized zigzag coefficients per component, on the PADDED (MCU)
    # grid — interleaved DC scans cover it all; AC scans only the
    # ceil() prefix (full grid), matching the decoder
    zzs = []
    full_dims = []
    for ci, p in enumerate(prepped):
        sh, sv = samp[ci]
        cby, cbx = mcuy * sv, mcux * sh
        full_dims.append((
            ((h * sv + vmax - 1) // vmax + 7) // 8,
            ((w * sh + hmax - 1) // hmax + 7) // 8,
        ))
        q = dq[qts[ci]]
        arr = np.zeros((cby, cbx, 64), np.int32)
        for by in range(cby):
            for bx in range(cbx):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round(fdct2(block) / q).astype(np.int32)
                arr[by, bx] = coef.reshape(-1)[ZIGZAG]
        zzs.append(arr)

    dc_enc = [build_huffman_encoder(DC_LUMA_BITS, DC_LUMA_VALS),
              build_huffman_encoder(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_enc = [build_huffman_encoder(AC_LUMA_BITS, AC_LUMA_VALS),
              build_huffman_encoder(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    tab_of = [0] if gray else [0, 1, 1]
    nc = len(prepped)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(dq):
        out += seg(0xDB, bytes([ti]) + bytes(
            int(x) for x in q.reshape(-1)[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qts[ci]])
    out += seg(0xC2, sof)
    huf_specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                 (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huf_specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                      (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tid, bits, vals in huf_specs:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int, bw: _BitWriter) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            body += bytes([cid, tdta])
        body += bytes([ss, se, (ah << 4) | al])
        bw.flush()
        return seg(0xDA, body) + bytes(bw.out)

    def mcu_blocks():
        """Interleaved (DC) data-unit order: MCU raster, per component
        in sampling-factor order, over the PADDED grid."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    sh, sv = samp[ci]
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, zzs[ci][my * sv + v, mx * sh + hh]

    # scan 1: DC first, Al=1, interleaved
    bw = _BitWriter()
    pred = [0] * nc
    dc_encs = [dc_enc[tab_of[ci]] for ci in range(nc)]
    for ci, zz in mcu_blocks():
        _enc_dc_first(bw, [(ci, zz)], pred, dc_encs, 1)
    out += sos([(ci + 1, tab_of[ci] << 4) for ci in range(nc)],
               0, 0, 0, 1, bw)
    # scans 2-3: AC first per component, bands 1-5 then 6-63, Al=1 —
    # non-interleaved, FULL (non-padded) grid only
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            nby_f, nbx_f = full_dims[ci]
            bw = _BitWriter()
            for by in range(nby_f):
                for bx in range(nbx_f):
                    _enc_ac_first(bw, zzs[ci][by, bx], ss, se, 1,
                                  ac_enc[tab_of[ci]])
            out += sos([(ci + 1, tab_of[ci])], ss, se, 0, 1, bw)
    # scan 4: DC refinement (Ah=1, Al=0), interleaved — raw bits
    bw = _BitWriter()
    for ci, zz in mcu_blocks():
        bw.write(int(zz[0]) & 1, 1)
    out += sos([(ci + 1, 0) for ci in range(nc)], 0, 0, 1, 0, bw)
    # scan 5: AC refinement per component, full band, Ah=1 -> Al=0
    for ci in range(nc):
        nby_f, nbx_f = full_dims[ci]
        bw = _BitWriter()
        for by in range(nby_f):
            for bx in range(nbx_f):
                _enc_ac_refine(bw, zzs[ci][by, bx], 1, 63, 0,
                               ac_enc[tab_of[ci]])
        out += sos([(ci + 1, tab_of[ci])], 1, 63, 1, 0, bw)
    out += b"\xff\xd9"
    return bytes(out)
