"""Pure-numpy + stdlib-zlib codecs for COMPRESSED image containers.

Spec-derived decoders (no Pillow / libpng / giflib) so the multimodal
pipeline decodes the two dominant lossless web formats in-repo:

- PNG (RFC 2083 / W3C PNG spec): zlib-deflated scanlines with per-row
  filters 0-4 (None/Sub/Up/Average/Paeth), bit depths 1/2/4/8/16,
  color types 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) /
  6 (RGBA), interlace 0 (none) and 1 (Adam7). Ancillary chunks are
  skipped; tRNS on palette images promotes the output to RGBA.
- GIF (GIF87a/GIF89a): LZW-compressed indexed frames, global/local
  color tables, interlaced row order, GCE transparency. ``decode_gif``
  returns the first frame; ``decode_gif_frames`` stacks all frames
  with full-frame "restore to background = previous" compositing for
  equal-geometry frames (the synthetic-fixture case) and per-frame
  rectangle placement otherwise.

Matching encoders exist so tests can construct fixtures covering every
filter type / bit depth / interlace pass without any third-party
library — decode(encode(x)) round-trips are exact because both formats
are lossless.

Filtering reference: PNG spec §6 ("Filter Algorithms"); Paeth
predictor per Paeth (1991). LZW per GIF89a spec appendix F.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass offsets/strides: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

# samples per pixel by color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, row_bytes: int, bpp: int) -> np.ndarray:
    """Reverse PNG per-row filtering -> (h, row_bytes) uint8.

    raw is h * (1 + row_bytes) bytes: each scanline is prefixed by its
    filter-type byte. Filters operate on bytes; ``bpp`` is the number
    of bytes per complete pixel (>= 1 even for sub-byte depths).
    """
    data = np.frombuffer(raw, dtype=np.uint8)
    if len(data) != h * (1 + row_bytes):
        raise ValueError(
            f"PNG scanline data length {len(data)} != {h}x(1+{row_bytes})"
        )
    rows = data.reshape(h, 1 + row_bytes)
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prior = np.zeros(row_bytes, dtype=np.uint8)
    for r in range(h):
        ftype = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: + recon[x - bpp]; cumsum over pixel lanes
            n_pix = row_bytes // bpp
            tail = row_bytes - n_pix * bpp  # ragged tail when bpp > 1? never
            lanes = line[: n_pix * bpp].reshape(n_pix, bpp)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
            if tail:
                rec = np.concatenate([rec, line[-tail:]])
        elif ftype == 2:  # Up
            rec = (line + prior) % 256
        elif ftype == 3:  # Average
            rec = np.empty(row_bytes, dtype=np.int32)
            for x in range(row_bytes):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (left + int(prior[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.empty(row_bytes, dtype=np.int32)
            for x in range(row_bytes):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                ul = int(out[r - 1, x - bpp]) if (r > 0 and x >= bpp) else 0
                rec[x] = (line[x] + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = rec.astype(np.uint8)
        prior = out[r]
    return out


def _rows_to_samples(rows: np.ndarray, w: int, ch: int,
                     bit_depth: int) -> np.ndarray:
    """(h, row_bytes) filtered-out bytes -> (h, w, ch) integer samples."""
    h = rows.shape[0]
    if bit_depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if bit_depth == 16:
        return (
            rows[:, : w * ch * 2]
            .reshape(h, -1)
            .view(">u2")  # big-endian per spec
            .reshape(h, w, ch)
            .astype(np.uint16)
        )
    # 1/2/4-bit: only valid for ch == 1 (gray or palette); packed
    # big-endian within each byte, rows padded to a byte boundary.
    bits = np.unpackbits(rows, axis=1)
    per = bit_depth
    vals = np.zeros((h, rows.shape[1] * 8 // per), dtype=np.uint16)
    for b in range(per):
        vals = (vals << 1) | bits[:, b::per][:, : vals.shape[1]]
    return vals[:, :w].reshape(h, w, 1).astype(np.uint8)


def _row_bytes(w: int, ch: int, bit_depth: int) -> int:
    return (w * ch * bit_depth + 7) // 8


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG -> uint8/uint16 array: gray (H, W), RGB (H, W, 3),
    gray+alpha (H, W, 2), RGBA (H, W, 4). Palette images are expanded
    through PLTE (tRNS adds an alpha channel). Sub-byte gray depths
    return the raw sample values (0..2^depth-1)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG compression/filter method {comp}/{filt} unsupported"
        )
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth}")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, ch * bit_depth // 8)

    def decode_sub(sub_w: int, sub_h: int, buf: bytes) -> np.ndarray:
        rb = _row_bytes(sub_w, ch, bit_depth)
        rows = _unfilter(buf, sub_h, rb, bpp)
        return _rows_to_samples(rows, sub_w, ch, bit_depth)

    if interlace == 0:
        img = decode_sub(w, h, raw)
    elif interlace == 1:  # Adam7
        dt = np.uint16 if bit_depth == 16 else np.uint8
        img = np.zeros((h, w, ch), dtype=dt)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            nbytes = ph * (1 + _row_bytes(pw, ch, bit_depth))
            img[y0::dy, x0::dx] = decode_sub(pw, ph, raw[off : off + nbytes])
            off += nbytes
    else:
        raise NotImplementedError(f"PNG interlace method {interlace}")

    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0].astype(np.intp)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ch == 1:
        return img[:, :, 0]
    return img


def _filter_row(line: np.ndarray, prior: np.ndarray, bpp: int,
                ftype: int) -> np.ndarray:
    """Apply PNG filter ftype to one reconstructed row (encoder side)."""
    line_i = line.astype(np.int32)
    prior_i = prior.astype(np.int32)
    left = np.zeros_like(line_i)
    left[bpp:] = line_i[:-bpp]
    ul = np.zeros_like(line_i)
    ul[bpp:] = prior_i[:-bpp]
    if ftype == 0:
        out = line_i
    elif ftype == 1:
        out = line_i - left
    elif ftype == 2:
        out = line_i - prior_i
    elif ftype == 3:
        out = line_i - (left + prior_i) // 2
    elif ftype == 4:
        p = left + prior_i - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prior_i), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, prior_i, ul))
        out = line_i - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_png(img: np.ndarray, filter_type: int = 0,
               interlace: bool = False,
               palette: np.ndarray | None = None,
               bit_depth: int | None = None) -> bytes:
    """Encode an array as PNG (fixture-grade; lossless, so round trips
    with decode_png are exact).

    img: uint8 (H, W) gray / (H, W, 2) gray+alpha / (H, W, 3) RGB /
    (H, W, 4) RGBA, or uint16 for 16-bit variants. With ``palette``
    given, img must be (H, W) uint8 indices into the (n, 3) palette.
    ``filter_type`` applies one filter to every row (0-4).
    """
    img = np.asarray(img)
    if palette is not None:
        color_type, ch = 3, 1
        samples = img.reshape(img.shape[0], img.shape[1], 1)
        depth = bit_depth or 8
    else:
        if img.ndim == 2:
            color_type, ch = 0, 1
            samples = img[:, :, None]
        elif img.shape[2] == 2:
            color_type, ch = 4, 2
            samples = img
        elif img.shape[2] == 3:
            color_type, ch = 2, 3
            samples = img
        elif img.shape[2] == 4:
            color_type, ch = 6, 4
            samples = img
        else:
            raise ValueError(f"unsupported image shape {img.shape}")
        depth = bit_depth or (16 if img.dtype == np.uint16 else 8)
    h, w = samples.shape[:2]
    bpp = max(1, ch * depth // 8)

    def rows_of(sub: np.ndarray) -> np.ndarray:
        sh, sw = sub.shape[:2]
        if depth == 8:
            return sub.reshape(sh, sw * ch).astype(np.uint8)
        if depth == 16:
            return (
                sub.astype(">u2").view(np.uint8).reshape(sh, sw * ch * 2)
            )
        # pack sub-byte samples big-endian within bytes, pad rows
        per = depth
        vals = sub.reshape(sh, sw).astype(np.uint8)
        bits = np.zeros((sh, sw * per), dtype=np.uint8)
        for b in range(per):
            bits[:, b::per] = (vals >> (per - 1 - b)) & 1
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        return np.packbits(bits, axis=1)

    def filter_sub(sub: np.ndarray) -> bytes:
        rows = rows_of(sub)
        out = bytearray()
        prior = np.zeros(rows.shape[1], dtype=np.uint8)
        for r in range(rows.shape[0]):
            out.append(filter_type)
            out += _filter_row(rows[r], prior, bpp, filter_type).tobytes()
            prior = rows[r]
        return bytes(out)

    if not interlace:
        scan = filter_sub(samples)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filter_sub(sub))
        scan = b"".join(parts)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(scan, 6))
    return out + _chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW-compressed indexed frames
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW decode -> list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return list(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return list(out)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encode (fixture-grade)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    cur = b""
    for idx in indices:
        nxt = cur + bytes([idx])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        if next_code < 4096:
            table[nxt] = next_code
            # bump BEFORE increment: the decoder (which lags one table
            # entry behind) bumps after appending entry 2^cs - 1, so the
            # encoder's next emission switches width at the same code
            # index (validated against the canonical public 10x10 GIF
            # sample stream in tests).
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # table full: emit clear, reset
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        cur = bytes([idx])
    if cur:
        emit(table[cur], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_frames(payload: bytes):
    """Yield (top, left, indices (H, W), palette (n, 3), transparent_idx)
    per image block."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            return
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # GCE
                flags = payload[pos + 1]
                tidx = payload[pos + 4]
                transparent = tidx if (flags & 1) else None
            while payload[pos] != 0:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x} at {pos}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF LZW stream shorter than image")
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced row order: 8k, 8k+4, 4k+2, 2k+1
            de = np.empty_like(idx)
            order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                    np.arange(2, h, 4), np.arange(1, h, 2)])
            de[order] = idx
            idx = de
        if pal is None:
            raise ValueError("GIF frame has no color table")
        yield top, left, idx, pal, transparent
        transparent = None


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF -> uint8 (H, W, 3) RGB."""
    for _top, _left, idx, pal, _t in _gif_frames(payload):
        return pal[idx.astype(np.intp)]
    raise ValueError("GIF contains no image block")


def decode_gif_frames(payload: bytes) -> np.ndarray:
    """Decode all GIF frames -> uint8 (n, H, W, 3), compositing each
    frame's rectangle over the previous canvas (transparent pixels
    keep the prior canvas value)."""
    sw, sh = struct.unpack_from("<HH", payload, 6)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames = []
    for top, left, idx, pal, transparent in _gif_frames(payload):
        h, w = idx.shape
        rgb = pal[idx.astype(np.intp)]
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = (idx == transparent)[:, :, None]
            rgb = np.where(mask, region, rgb)
        canvas[top : top + h, left : left + w] = rgb
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF contains no image block")
    return np.stack(frames)


def encode_gif(frames: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """Encode uint8 index frames (n, H, W) or (H, W) with an (m, 3)
    palette as GIF89a (fixture-grade; one global color table)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    _n, h, w = frames.shape
    pal = np.asarray(palette, dtype=np.uint8)
    bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    pal_full = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    min_code = max(2, bits)
    for fr in frames:
        rows = fr
        iflags = 0
        if interlace:
            order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                    np.arange(2, h, 4), np.arange(1, h, 2)])
            rows = fr[order]
            iflags = 0x40
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        out.append(min_code)
        lzw = _lzw_encode(list(rows.reshape(-1)), min_code)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)
