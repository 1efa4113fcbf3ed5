"""Pure-numpy codecs for UNCOMPRESSED media containers.

These are real, spec-derived parsers — RIFF/WAVE PCM audio, binary
netpbm images (P5/P6), BI_RGB Windows bitmaps, and multi-image netpbm
streams (the netpbm spec allows concatenated images in one file, which
serves as an honest uncompressed "video" container). They make the
multimodal pipeline genuinely end-to-end for uncompressed payloads.
Compressed formats decoded in-repo: PNG, GIF (codecs_compressed.py),
baseline AND progressive JPEG (codecs_jpeg.py,
codecs_jpeg_progressive.py), G.711 mu-law/A-law and IMA ADPCM audio
(this file), FLAC (codecs_flac.py — Rice/fixed/LPC subframes, stereo
decorrelation), and MJPEG-in-AVI video (this file, frames through the
JPEG decoder). The NotImplementedError boundary now covers only
perceptual/transform codecs (MP3/AAC/Vorbis, H.264/VP9, WebP —
soundfile/pyav/Pillow territory on a real cluster).

Format references (public specs):
- WAVE: RIFF chunks 'fmt ' + 'data'; PCM int8(unsigned)/int16/int32 LE
  and IEEE float32/float64 (audio normalized to [-1, 1] float32, the
  soundfile convention).
- netpbm P5/P6: ASCII header (magic, whitespace/comments, width,
  height, maxval) then a single whitespace byte and raw samples,
  1 or 2 bytes per sample (2-byte is big-endian per spec).
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, biCompression=0 (BI_RGB),
  24/32 bpp, 4-byte-aligned rows, bottom-up (positive height) or
  top-down (negative); output rows top-down, channels RGB.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM + IEEE float)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE file -> (samples float32 in [-1, 1] with shape
    (n_frames,) mono or (n_frames, n_channels), sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    fact_samples = None
    for cid, body_pos, csize in _riff_chunks(payload, 12, len(payload)):
        body = payload[body_pos : body_pos + csize]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and csize >= 4:
            # total sample frames actually encoded (compressed formats)
            fact_samples = struct.unpack_from("<I", body, 0)[0]
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    (audio_fmt, n_ch, rate, _br, block_align, bits) = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if n_ch < 1:
        raise ValueError(f"WAVE nChannels {n_ch} invalid")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dt).astype(np.float32)
    elif audio_fmt == 6:  # G.711 A-law
        codes = np.frombuffer(data, dtype=np.uint8)
        x = ALAW_TABLE[codes].astype(np.float32) / 32768.0
    elif audio_fmt == 7:  # G.711 mu-law
        codes = np.frombuffer(data, dtype=np.uint8)
        x = ULAW_TABLE[codes].astype(np.float32) / 32768.0
    elif audio_fmt == 17:  # IMA/DVI ADPCM
        # fmt extension carries wSamplesPerBlock; a final partial block
        # is zero-padded to block_align on disk, so without it (and the
        # fact count below) padding nibbles would decode as phantom
        # trailing samples
        spb = None
        if len(fmt) >= 20:
            cb = struct.unpack_from("<H", fmt, 16)[0]
            if cb >= 2:
                spb = struct.unpack_from("<H", fmt, 18)[0]
        if n_ch == 1:
            ints = _ima_adpcm_decode_stream(data, block_align, spb)
            if fact_samples is not None:
                ints = ints[:fact_samples]
            return ints.astype(np.float32) / 32768.0, int(rate)
        blocks = []
        for pos2 in range(0, len(data), block_align):
            block = data[pos2 : pos2 + block_align]
            if len(block) < 4 * n_ch:
                break
            frames = ima_adpcm_decode_block_multi(block, n_ch)
            if spb is not None:
                frames = frames[:spb]
            blocks.append(frames)
        frames = (
            np.concatenate(blocks)
            if blocks
            else np.empty((0, n_ch), np.int16)
        )
        if fact_samples is not None:
            frames = frames[:fact_samples]
        return frames.astype(np.float32) / 32768.0, int(rate)
    else:
        raise NotImplementedError(
            f"compressed WAVE format tag {audio_fmt} needs a real codec"
        )
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch)
    return x, int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit PCM RIFF/WAVE."""
    x = np.asarray(samples, dtype=np.float64)
    n_ch = 1 if x.ndim == 1 else x.shape[1]
    ints = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = ints.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# Compressed telephony audio: G.711 mu-law / A-law and IMA/DVI ADPCM
# ---------------------------------------------------------------------------
# Spec-derived (ITU-T G.711 segmented companding; IMA ADPCM per the
# IMA Digital Audio Focus Group algorithm, WAVE format tag 0x11). The
# expansion tables are built from the companding formulas at import —
# 256 codewords each — and indexing a numpy table decodes a whole
# payload vectorized.


def _build_ulaw_table() -> np.ndarray:
    """mu-law codeword -> linear int16: invert the G.711 mu-law
    compressor (bias 0x84, 8 segments, sign-magnitude, transmitted
    complemented)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = ((mant << 3) + 0x84) << exp
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """A-law codeword -> linear int16: invert the G.711 A-law
    compressor (even bits inverted on the wire, 0x55 mask; sign bit SET
    means positive)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    base = t + 0x108
    shifted = np.left_shift(base, np.clip(seg - 1, 0, 6))
    mag = np.where(seg == 0, t + 8, np.where(seg == 1, base, shifted))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

# IMA ADPCM quantizer step sizes (89 entries) and index adaptation.
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def ima_adpcm_decode_block(
    data: bytes, predictor: int, index: int
) -> np.ndarray:
    """Decode one IMA ADPCM block body (nibble pairs, low nibble first)
    from an initial (predictor, step index) state. Emits the header
    predictor as the block's first sample, then one sample per nibble —
    the WAVE tag-0x11 convention."""
    index = max(0, min(88, int(index)))
    predictor = int(predictor)
    out = np.empty(1 + 2 * len(data), dtype=np.int16)
    out[0] = predictor
    k = 1
    for byte in data:
        for nib in (byte & 0x0F, byte >> 4):
            step = int(_IMA_STEP[index])
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            predictor = predictor - diff if nib & 8 else predictor + diff
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + int(_IMA_INDEX[nib & 7])))
            out[k] = predictor
            k += 1
    return out


def ima_adpcm_decode_block_multi(
    block: bytes, n_ch: int
) -> np.ndarray:
    """Decode one multi-channel IMA ADPCM block -> (n_frames, n_ch)
    int16. Layout per the WAVE tag-0x11 spec: one 4-byte state header
    per channel, then the nibble data in 4-byte (8-sample) units
    round-robin across channels."""
    preds = []
    idxs = []
    for c in range(n_ch):
        p, i = struct.unpack_from("<hB", block, 4 * c)
        preds.append(int(p))
        idxs.append(max(0, min(88, int(i))))
    data = block[4 * n_ch :]
    chans: list[list[int]] = [[preds[c]] for c in range(n_ch)]
    # a truncated final group decodes whatever bytes each channel has
    # (matching the mono path's partial-tail behavior); only complete
    # frames are emitted below
    for g0 in range(0, len(data), 4 * n_ch):
        for c in range(n_ch):
            predictor, index = preds[c], idxs[c]
            for byte in data[g0 + 4 * c : g0 + 4 * c + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    step = int(_IMA_STEP[index])
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    predictor = (
                        predictor - diff if nib & 8 else predictor + diff
                    )
                    predictor = max(-32768, min(32767, predictor))
                    index = max(
                        0, min(88, index + int(_IMA_INDEX[nib & 7]))
                    )
                    chans[c].append(predictor)
            preds[c], idxs[c] = predictor, index
    n_frames = min(len(ch) for ch in chans)
    return np.stack(
        [np.array(ch[:n_frames], dtype=np.int16) for ch in chans], axis=1
    )


def _ima_adpcm_decode_stream(
    data: bytes, block_align: int, samples_per_block: int | None = None
) -> np.ndarray:
    """Decode a mono IMA ADPCM 'data' chunk: independent blocks of
    ``block_align`` bytes, each starting with a 4-byte state header
    (int16 predictor, uint8 step index, reserved). When
    ``samples_per_block`` (fmt-extension wSamplesPerBlock) is given,
    each block's output is truncated to it — zero padding in a final
    partial block must not decode as audio."""
    if block_align < 5:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")
    parts = []
    for pos in range(0, len(data), block_align):
        block = data[pos : pos + block_align]
        if len(block) < 4:
            break  # trailing ragged bytes cannot hold a state header
        predictor, index = struct.unpack_from("<hB", block, 0)
        out = ima_adpcm_decode_block(block[4:], predictor, index)
        if samples_per_block is not None:
            out = out[:samples_per_block]
        parts.append(out)
    if not parts:
        return np.empty(0, dtype=np.int16)
    return np.concatenate(parts)


def _wav_container(fmt_tag: int, n_ch: int, rate: int, block_align: int,
                   bits: int, data: bytes, ext: bytes = b"",
                   fact_samples: int | None = None) -> bytes:
    byte_rate = rate * block_align
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, rate, byte_rate, block_align, bits
    ) + ext
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact_samples is not None:
        body += b"fact" + struct.pack("<II", 4, fact_samples)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def encode_wav_g711(codewords: np.ndarray, law: str = "ulaw",
                    sample_rate: int = 8000) -> bytes:
    """Wrap raw G.711 codeword bytes in a WAVE container (format tag 7
    for mu-law, 6 for A-law) — the fixture builder for compressed-audio
    tests (content is specified as codewords, so the expected linear
    samples are exactly the expansion-table entries)."""
    tag = {"ulaw": 7, "alaw": 6}[law]
    data = np.asarray(codewords, dtype=np.uint8).tobytes()
    return _wav_container(tag, 1, sample_rate, 1, 8, data)


def encode_wav_ima_adpcm(
    blocks: list[tuple[int, int, bytes]],
    block_align: int = 256,
    sample_rate: int = 8000,
    total_samples: int | None = None,
) -> bytes:
    """Wrap pre-built IMA ADPCM blocks [(predictor, step_index,
    nibble_bytes)] in a WAVE container (format tag 0x11, mono) with the
    standard fmt extension (wSamplesPerBlock) and fact chunk. Each
    block body must be exactly ``block_align`` - 4 bytes;
    ``total_samples`` (default: all blocks full) lets a fixture mark a
    zero-padded final partial block."""
    spb = 1 + 2 * (block_align - 4)
    data = bytearray()
    for predictor, index, body in blocks:
        if len(body) != block_align - 4:
            raise ValueError("ADPCM block body must fill block_align - 4")
        data += struct.pack("<hBB", int(predictor), int(index), 0)
        data += body
    if total_samples is None:
        total_samples = spb * len(blocks)
    ext = struct.pack("<HH", 2, spb)  # cbSize=2, wSamplesPerBlock
    return _wav_container(
        0x11, 1, sample_rate, block_align, 4, bytes(data),
        ext=ext, fact_samples=int(total_samples),
    )


# ---------------------------------------------------------------------------
# netpbm P5 (PGM) / P6 (PPM), single image and concatenated stream
# ---------------------------------------------------------------------------

def _pnm_header(payload: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """Parse one PNM header starting at pos: returns
    (magic, width, height, maxval, data_start)."""
    magic = payload[pos : pos + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM header at offset {pos}")
    i = pos + 2
    vals: list[int] = []
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte after maxval (spec)
    return magic, vals[0], vals[1], vals[2], i


def _pnm_decode_one(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    magic, w, h, maxval, start = _pnm_header(payload, pos)
    ch = 3 if magic == b"P6" else 1
    if maxval < 256:
        count = w * h * ch
        arr = np.frombuffer(payload, dtype=np.uint8, count=count, offset=start)
        arr = arr.reshape(h, w, ch) if ch == 3 else arr.reshape(h, w)
        return arr.copy(), start + count
    count = w * h * ch
    arr = np.frombuffer(payload, dtype=">u2", count=count, offset=start)
    arr = arr.reshape(h, w, ch) if ch == 3 else arr.reshape(h, w)
    return arr.copy(), start + 2 * count


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a single binary PPM (P6) -> uint8/uint16 (H, W, 3), or
    PGM (P5) -> (H, W)."""
    arr, _ = _pnm_decode_one(payload, 0)
    return arr


def decode_ppm_stream(payload: bytes) -> np.ndarray:
    """Decode a multi-image netpbm stream (concatenated P6 frames, the
    spec's multi-image file form) -> (n_frames, H, W, 3)."""
    frames = []
    pos = 0
    while pos < len(payload):
        arr, pos = _pnm_decode_one(payload, pos)
        frames.append(arr)
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
    if not frames:
        raise ValueError("empty netpbm stream")
    return np.stack(frames)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode uint8 (H, W, 3) as binary PPM (P6) / (H, W) as PGM (P5)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    elif img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_ppm_stream(frames: np.ndarray) -> bytes:
    """Encode uint8 (n_frames, H, W, 3) as a concatenated-P6 stream."""
    return b"".join(encode_ppm(f) for f in np.asarray(frames, dtype=np.uint8))


# ---------------------------------------------------------------------------
# BMP (BI_RGB, 24/32 bpp)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) 24/32-bpp BMP -> uint8 (H, W, 3)
    RGB, rows top-down."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs unsupported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (biCompression={compression}) needs a real codec"
        )
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP unsupported")
    h = abs(h_signed)
    bytes_pp = bpp // 8
    row_bytes = ((w * bytes_pp + 3) // 4) * 4  # 4-byte row alignment
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                        offset=data_offset)
    rows = raw.reshape(h, row_bytes)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    # BGR(A) -> RGB
    return rows[:, :, 2::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode uint8 (H, W, 3) RGB as a 24-bpp bottom-up BI_RGB BMP."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row_bytes = ((w * 3 + 3) // 4) * 4
    pad = row_bytes - w * 3
    bgr = img[:, :, ::-1]
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes()
        body += b"\0" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return hdr + info + bytes(body)


# ---------------------------------------------------------------------------
# AVI container with MJPEG frames (compressed video, in-repo)
# ---------------------------------------------------------------------------
# RIFF 'AVI ' layout: LIST hdrl (avih main header + per-stream LIST
# strl with strh/strf), LIST movi holding '##dc'/'##db' frame chunks,
# optional idx1. Motion-JPEG stores each frame as an independent
# baseline JPEG, so the in-repo T.81 decoder (codecs_jpeg.py) makes
# this a fully in-repo compressed VIDEO path. The container walk is
# exact (chunk slicing is lossless); frame pixels carry baseline-JPEG
# tolerance only.


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    payload[pos:end]; chunks are word-aligned per RIFF."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, pos + 8, csize
        pos += 8 + csize + (csize & 1)


def avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Extract the raw JPEG payload of every stream-0 video frame chunk
    ('00dc'/'00db') from an AVI container, in stream order."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        for cid, body, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                ltype = payload[body : body + 4]
                if ltype in (b"movi", b"rec "):
                    walk(body + 4, body + size)
            elif cid in (b"00dc", b"00db"):
                frames.append(payload[body : body + size])

    walk(12, len(payload))
    return frames


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """Decode an MJPEG AVI -> (n_frames, h, w[, 3]) uint8 stack via the
    in-repo baseline-JPEG decoder. Frames must agree in shape."""
    from pyhctsa_spark.operators.codecs_jpeg import decode_jpeg

    raw = avi_mjpeg_frames(payload)
    if not raw:
        raise ValueError("AVI contains no stream-0 video frames")
    frames = []
    for f in raw:
        if f[:3] != b"\xff\xd8\xff":
            raise NotImplementedError(
                "AVI video stream is not MJPEG (non-JPEG frame chunk)"
            )
        frames.append(decode_jpeg(f))
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"inconsistent MJPEG frame shapes: {shapes}")
    return np.stack(frames)


def encode_avi_mjpeg(
    frames: np.ndarray, quality: int = 90, fps: int = 10
) -> bytes:
    """Encode a (n, h, w, 3) or (n, h, w) uint8 stack as an MJPEG AVI
    (fixture encoder: minimal standards-shaped hdrl + movi + idx1)."""
    from pyhctsa_spark.operators.codecs_jpeg import encode_jpeg

    frames = np.asarray(frames)
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\0" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_len = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1000000 // fps, 0, 0, 0x10, n, 0, 1,
        max_len, w, h, 0, 0, 0, 0,
    )
    # strh: fccType fccHandler flags priority language initialFrames
    # scale rate start length suggestedBufferSize quality sampleSize
    # rcFrame(l, t, r, b) = 56 bytes
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_len, 0xFFFF, 0
        )
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", b) for b in blobs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (id, flags, offset from movi list type,
    # size) — offsets point at the chunk header per convention
    off = 4
    idx_entries = []
    for b in blobs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Pluggable codec registry
# ---------------------------------------------------------------------------
# Dispatch is an ordered (name, sniff, decode) list per modality. The
# pure-numpy parsers above are the in-repo tier, registered at import;
# compressed-codec adapters (Pillow / soundfile / pyav) self-register
# when their library is importable — on a real cluster ship them to
# executors via --py-files / conda-pack (SURVEY §7.3) and the lazy
# ensure-pass below picks them up inside each Python worker, no
# driver-side state to serialize. A payload no registered codec sniffs
# raises the typed NotImplementedError boundary.

_REGISTRY: dict[str, list[tuple[str, object, object]]] = {
    "audio": [], "image": [], "video": [],
}
_HINTS = {
    "audio": "perceptual compressed audio (mp3/ogg-vorbis/aac...) "
             "needs the soundfile adapter (pip soundfile + libsndfile) "
             "on the cluster (PCM/G.711/ADPCM WAV + FLAC decode "
             "in-repo)",
    "image": "exotic compressed images (webp/jpeg-arithmetic...) need "
             "the Pillow adapter on the cluster (png/gif/baseline+"
             "progressive+lossless-jpeg decode in-repo)",
    "video": "transform-coded video (h264/vp9...) needs the pyav/ffmpeg "
             "adapter on the cluster (mjpeg-avi/gif decode in-repo)",
}


def register_codec(modality: str, name: str, sniff, decode,
                   prepend: bool = False) -> None:
    """Add a codec: ``sniff(payload: bytes) -> bool`` cheap magic-bytes
    test, ``decode(payload: bytes) -> np.ndarray``. Re-registering a
    name replaces it (idempotent for the optional adapters)."""
    if modality not in _REGISTRY:
        raise ValueError(f"unknown modality {modality}")
    lst = [(n, s, d) for n, s, d in _REGISTRY[modality] if n != name]
    entry = (name, sniff, decode)
    _REGISTRY[modality] = [entry] + lst if prepend else lst + [entry]


def unregister_codec(modality: str, name: str) -> None:
    _REGISTRY[modality] = [
        (n, s, d) for n, s, d in _REGISTRY[modality] if n != name
    ]


def registered_codecs(modality: str) -> list[str]:
    return [n for n, _s, _d in _REGISTRY[modality]]


# in-repo tier: spec-derived pure-numpy parsers for uncompressed media
register_codec("audio", "wav",
               lambda p: p[:4] == b"RIFF" and p[8:12] == b"WAVE",
               lambda p: decode_wav(p)[0])
register_codec("image", "pnm", lambda p: p[:2] in (b"P5", b"P6"), decode_ppm)
register_codec("image", "bmp", lambda p: p[:2] == b"BM", decode_bmp)
register_codec("video", "pnm-stream", lambda p: p[:2] == b"P6",
               decode_ppm_stream)

# in-repo COMPRESSED tier: spec-derived PNG (zlib scanlines, filters
# 0-4, Adam7) and GIF (LZW) decoders — pure numpy + stdlib zlib, no
# Pillow. Variants they reject (NotImplementedError) fall through to
# the Pillow adapter when it is registered below.
from pyhctsa_spark.operators.codecs_compressed import (  # noqa: E402
    PNG_SIG, decode_gif, decode_gif_frames, decode_png,
)

register_codec("image", "png", lambda p: p[:8] == PNG_SIG, decode_png)
register_codec("image", "gif", lambda p: p[:4] == b"GIF8", decode_gif)
register_codec("video", "gif-frames", lambda p: p[:4] == b"GIF8",
               decode_gif_frames)

# in-repo baseline JPEG (ITU-T T.81 sequential DCT) — progressive /
# arithmetic variants raise NotImplementedError and fall through to
# Pillow when present.
from pyhctsa_spark.operators.codecs_jpeg import decode_jpeg  # noqa: E402

register_codec("image", "jpeg", lambda p: p[:3] == b"\xff\xd8\xff",
               decode_jpeg)

# in-repo compressed VIDEO: MJPEG frames in an AVI container (each
# frame an independent baseline JPEG through codecs_jpeg).
register_codec("video", "avi-mjpeg",
               lambda p: p[:4] == b"RIFF" and p[8:12] == b"AVI ",
               decode_avi_mjpeg)

# in-repo compressed AUDIO: FLAC (constant/verbatim/fixed/LPC
# subframes, Rice residuals, stereo decorrelation — codecs_flac.py).
from pyhctsa_spark.operators.codecs_flac import decode_flac  # noqa: E402

register_codec("audio", "flac", lambda p: p[:4] == b"fLaC",
               lambda p: decode_flac(p)[0])

# in-repo lossless WebP (VP8L: all four transforms, color cache,
# meta-prefix, LZ77 2D distance map — codecs_webp.py). Lossy VP8 /
# extended VP8X raise NotImplementedError and fall through to Pillow.
from pyhctsa_spark.operators.codecs_webp import decode_webp  # noqa: E402

register_codec("image", "webp",
               lambda p: p[:4] == b"RIFF" and p[8:12] == b"WEBP",
               decode_webp)

_OPTIONAL_DONE = False


def register_optional_codecs() -> list[str]:
    """Try-import the compressed-codec libraries and register adapters
    for whichever are present. Returns the codec names added. Safe to
    call repeatedly (names replace); called lazily by sniff_and_decode
    so each Spark Python worker self-configures from ITS environment."""
    global _OPTIONAL_DONE
    added: list[str] = []
    try:  # Pillow: JPEG/PNG/WebP/GIF/TIFF...
        import io

        from PIL import Image

        def _pil_sniff(p: bytes) -> bool:
            return (
                p[:3] == b"\xff\xd8\xff"            # JPEG
                or p[:8] == b"\x89PNG\r\n\x1a\n"    # PNG
                or (p[:4] == b"RIFF" and p[8:12] == b"WEBP")
                or p[:4] in (b"GIF8", b"II*\x00", b"MM\x00*")
            )

        def _pil_decode(p: bytes) -> np.ndarray:
            with Image.open(io.BytesIO(p)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)

        register_codec("image", "pillow", _pil_sniff, _pil_decode)
        added.append("pillow")
    except (ImportError, OSError):
        pass  # absent OR present-but-broken (missing native lib)
    try:  # soundfile: flac/ogg/... (anything libsndfile handles)
        import io

        import soundfile as sf

        def _sf_sniff(p: bytes) -> bool:
            return p[:4] in (b"fLaC", b"OggS") or p[:3] == b"ID3"

        def _sf_decode(p: bytes) -> np.ndarray:
            x, _rate = sf.read(io.BytesIO(p), dtype="float32",
                               always_2d=False)
            return x

        register_codec("audio", "soundfile", _sf_sniff, _sf_decode)
        added.append("soundfile")
    except (ImportError, OSError):
        pass  # soundfile raises OSError when libsndfile.so is missing
    try:  # pyav: mp4/mkv/h264...
        import io

        import av

        def _av_sniff(p: bytes) -> bool:
            return len(p) > 12 and p[4:8] == b"ftyp" or p[:4] == b"\x1aE\xdf\xa3"

        def _av_decode(p: bytes) -> np.ndarray:
            with av.open(io.BytesIO(p)) as c:
                frames = [f.to_ndarray(format="rgb24")
                          for f in c.decode(video=0)]
            return np.stack(frames)

        register_codec("video", "pyav", _av_sniff, _av_decode)
        added.append("pyav")
    except (ImportError, OSError):
        pass  # absent OR present-but-broken (missing native lib)
    _OPTIONAL_DONE = True
    return added


def sniff_and_decode(payload: bytes, modality: str) -> np.ndarray:
    """Registry-dispatched decode: first codec whose sniff matches wins.
    Raises the typed NotImplementedError boundary when no registered
    codec (in-repo numpy tier + any optional adapters present in this
    worker's environment) recognizes the container."""
    if modality not in _REGISTRY:
        raise ValueError(f"unknown modality {modality}")
    if not _OPTIONAL_DONE:
        register_optional_codecs()
    last_ni: NotImplementedError | None = None
    for _name, sniff, decode in _REGISTRY[modality]:
        if sniff(payload):
            try:
                return decode(payload)
            except NotImplementedError as e:
                # a codec recognized the container but not this variant
                # (e.g. an exotic PNG ancillary feature) — let a later
                # registered codec (Pillow adapter) try.
                last_ni = e
    if last_ni is not None:
        raise last_ni
    raise NotImplementedError(
        f"{_HINTS[modality]} (registered: {registered_codecs(modality)})"
    )
