"""In-repo compressed image codecs (PNG / GIF): spec goldens, exhaustive
filter/depth/interlace round trips, and registry dispatch.

Both formats are LOSSLESS, so decode(encode(x)) == x exactly; the
encoders are independent enough (vectorized filter application vs the
decoder's sequential unfiltering; dict-based LZW compressor vs the
table-reconstruction decompressor) that a round trip exercises both
directions of the spec. The LZW decoder is additionally pinned against
the canonical 10x10 sample byte stream from the public GIF-format
walkthrough — an INDEPENDENT implementation's output — so the
variable-code-width schedule matches real-world GIF encoders, not just
our own.
"""

import sys
import zlib
from os.path import abspath, dirname

import numpy as np
import pytest

sys.path.insert(0, dirname(dirname(abspath(__file__))))

from pyhctsa_spark.operators import codecs as C  # noqa: E402
from pyhctsa_spark.operators import codecs_compressed as CC  # noqa: E402

rng = np.random.default_rng(2024)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_round_trip_all_filters_and_interlace(ftype, interlace):
    cases = {
        "gray8": rng.integers(0, 256, (13, 17), dtype=np.uint8),
        "gray_alpha": rng.integers(0, 256, (9, 5, 2), dtype=np.uint8),
        "rgb8": rng.integers(0, 256, (11, 7, 3), dtype=np.uint8),
        "rgba8": rng.integers(0, 256, (8, 8, 4), dtype=np.uint8),
        "gray16": rng.integers(0, 65536, (6, 10), dtype=np.uint16),
        "rgb16": rng.integers(0, 65536, (5, 4, 3), dtype=np.uint16),
    }
    for name, img in cases.items():
        dec = CC.decode_png(
            CC.encode_png(img, filter_type=ftype, interlace=interlace)
        )
        assert np.array_equal(dec, img), (name, ftype, interlace)
        assert dec.dtype == img.dtype


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_palette_and_subbyte_depths(depth, interlace):
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, min(16, 1 << depth), (14, 9), dtype=np.uint8)
    dec = CC.decode_png(CC.encode_png(
        idx, interlace=interlace, palette=pal, bit_depth=depth))
    assert np.array_equal(dec, pal[idx])
    if depth < 8:  # sub-byte grayscale keeps raw sample values
        g = rng.integers(0, 1 << depth, (10, 11), dtype=np.uint8)
        dg = CC.decode_png(CC.encode_png(g, bit_depth=depth,
                                         interlace=interlace))
        assert np.array_equal(dg, g)


def test_png_trns_promotes_palette_to_rgba():
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = CC.encode_png(idx, palette=pal)
    # splice a tRNS chunk (alpha for palette entry 0 only) before IDAT
    pos = payload.index(b"IDAT") - 4
    trns = CC._chunk(b"tRNS", bytes([128]))
    dec = CC.decode_png(payload[:pos] + trns + payload[pos:])
    assert dec.shape == (2, 2, 4)
    assert dec[0, 0, 3] == 128 and dec[0, 1, 3] == 255
    assert np.array_equal(dec[:, :, :3], pal[idx])


def test_png_hand_built_spec_bytes():
    # hand-assembled 2x2 RGB PNG, filter 0, from the spec chunk layout
    import struct
    pixels = bytes([0,   1, 2, 3,  10, 20, 30,   # row 0: filter + 2 px
                    0, 100, 0, 0,   0, 0, 100])  # row 1
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (CC.PNG_SIG + CC._chunk(b"IHDR", ihdr)
               + CC._chunk(b"IDAT", zlib.compress(pixels))
               + CC._chunk(b"IEND", b""))
    dec = CC.decode_png(payload)
    assert np.array_equal(dec, [[[1, 2, 3], [10, 20, 30]],
                                [[100, 0, 0], [0, 0, 100]]])


def test_png_sub_filter_wraparound_and_paeth_spec_case():
    # values chosen to exercise mod-256 wraparound through Sub and the
    # three Paeth predictor branches
    img = np.array([[250, 10, 250, 10], [5, 200, 5, 200],
                    [128, 128, 0, 255]], dtype=np.uint8)
    for ftype in (1, 3, 4):
        assert np.array_equal(
            CC.decode_png(CC.encode_png(img, filter_type=ftype)), img)


def test_png_rejects_garbage_and_unknown_variant():
    with pytest.raises(ValueError):
        CC.decode_png(b"not a png")
    # unsupported interlace method -> typed boundary
    import struct
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)
    payload = (CC.PNG_SIG + CC._chunk(b"IHDR", ihdr)
               + CC._chunk(b"IDAT", zlib.compress(b"\0" * 14))
               + CC._chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        CC.decode_png(payload)


# ---------------------------------------------------------------------------
# GIF / LZW
# ---------------------------------------------------------------------------

def test_lzw_decoder_matches_canonical_public_stream():
    # 10x10 sample from the public GIF-format walkthrough (independent
    # encoder's bytes) — pins the variable code-width schedule.
    data = bytes([0x8C, 0x2D, 0x99, 0x87, 0x2A, 0x1C, 0xDC, 0x33, 0xA0,
                  0x02, 0x75, 0xEC, 0x95, 0xFA, 0xA8, 0xDE, 0x60, 0x8C,
                  0x04, 0x91, 0x4C, 0x01])
    expected = ([1] * 5 + [2] * 5) * 3 \
        + [1, 1, 1, 0, 0, 0, 0, 2, 2, 2] * 2 \
        + [2, 2, 2, 0, 0, 0, 0, 1, 1, 1] * 2 \
        + ([2] * 5 + [1] * 5) * 3
    assert CC._lzw_decode(data, 2) == expected


@pytest.mark.parametrize("mcs", [2, 3, 4, 8])
def test_lzw_round_trips(mcs):
    for s in ([0, 1, 2, 3] * 3, [1] * 5, [0, 1] * 40,
              list(rng.integers(0, 1 << mcs, 5000))):
        if max(s) >= (1 << mcs):
            continue
        assert CC._lzw_decode(CC._lzw_encode(list(s), mcs), mcs) == list(s)


def test_gif_round_trip_plain_and_interlaced():
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    for interlace in (False, True):
        dec = CC.decode_gif(CC.encode_gif(idx, pal, interlace=interlace))
        assert np.array_equal(dec, pal[idx])


def test_gif_table_full_reset_path():
    # 150x200 of 8-bit noise forces the 4096-entry LZW table to fill and
    # the encoder to emit mid-stream CLEAR codes
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (150, 200), dtype=np.uint8)
    assert np.array_equal(CC.decode_gif(CC.encode_gif(idx, pal)), pal[idx])


def test_gif_multi_frame_video():
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames = rng.integers(0, 256, (5, 16, 16), dtype=np.uint8)
    dec = CC.decode_gif_frames(CC.encode_gif(frames, pal))
    assert dec.shape == (5, 16, 16, 3)
    assert np.array_equal(dec, pal[frames])


def test_gif_two_color_min_code_clamp():
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    bits = rng.integers(0, 2, (12, 31), dtype=np.uint8)
    assert np.array_equal(CC.decode_gif(CC.encode_gif(bits, pal2)),
                          pal2[bits])


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        CC.decode_gif(b"JIF89a")


# ---------------------------------------------------------------------------
# registry dispatch
# ---------------------------------------------------------------------------

def test_registry_dispatches_png_and_gif():
    img = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    assert np.array_equal(C.sniff_and_decode(CC.encode_png(img), "image"),
                          img)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    assert np.array_equal(C.sniff_and_decode(CC.encode_gif(idx, pal),
                                             "image"), pal[idx])
    frames = rng.integers(0, 256, (3, 6, 6), dtype=np.uint8)
    dec = C.sniff_and_decode(CC.encode_gif(frames, pal), "video")
    assert dec.shape == (3, 6, 6, 3)


def test_registry_falls_through_on_not_implemented():
    # a codec that sniffs PNG but rejects the variant must not mask a
    # later codec that can decode it
    calls = []

    def picky_decode(p):
        calls.append("picky")
        raise NotImplementedError("variant unsupported")

    C.register_codec("image", "picky-png",
                     lambda p: p[:8] == CC.PNG_SIG, picky_decode,
                     prepend=True)
    try:
        img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        dec = C.sniff_and_decode(CC.encode_png(img), "image")
        assert calls == ["picky"]
        assert np.array_equal(dec, img)
    finally:
        C.unregister_codec("image", "picky-png")
    # when EVERY matching codec rejects, the last typed boundary surfaces
    import struct
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)  # interlace 7
    bad = (CC.PNG_SIG + CC._chunk(b"IHDR", ihdr)
           + CC._chunk(b"IDAT", zlib.compress(b"\0" * 14))
           + CC._chunk(b"IEND", b""))
    if "pillow" not in C.registered_codecs("image"):
        with pytest.raises(NotImplementedError):
            C.sniff_and_decode(bad, "image")
