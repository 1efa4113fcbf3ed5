"""Progressive JPEG (codecs_jpeg_progressive): the decisive check is
that a progressive encoding decodes BIT-IDENTICALLY to the baseline
encoding of the same image at the same quality — both carry the same
quantized coefficients, just ordered differently — plus a hand-built
stream exercising multi-block EOB runs the fixture encoder never emits,
and registry dispatch."""

import struct

import numpy as np
import pytest

from pyhctsa_spark.operators import codecs as C
from pyhctsa_spark.operators import codecs_jpeg as J
from pyhctsa_spark.operators.codecs_jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _images():
    rng = np.random.default_rng(7)
    grad = np.tile(np.linspace(0, 255, 24, dtype=np.uint8), (24, 1))
    return [
        np.stack([grad] * 3, axis=-1),
        rng.integers(0, 256, (17, 23, 3)).astype(np.uint8),
        rng.integers(0, 256, (16, 16)).astype(np.uint8),  # grayscale
        np.full((8, 8, 3), 77, np.uint8),
        rng.integers(0, 256, (5, 9, 3)).astype(np.uint8),  # odd partial
    ]


@pytest.mark.parametrize("quality", [50, 90, 100])
def test_progressive_equals_baseline_decode(quality):
    for img in _images():
        prog = decode_jpeg_progressive(encode_jpeg_progressive(img, quality))
        base = J.decode_jpeg(J.encode_jpeg(img, quality))
        assert np.array_equal(prog, base)


def test_decode_jpeg_dispatches_sof2():
    img = np.full((8, 8, 3), 200, np.uint8)
    payload = encode_jpeg_progressive(img, 95)
    assert np.array_equal(J.decode_jpeg(payload),
                          decode_jpeg_progressive(payload))
    # and through the codec registry
    assert np.array_equal(C.sniff_and_decode(payload, "image"),
                          decode_jpeg_progressive(payload))


def test_hand_built_multi_block_eob_run():
    # 16x8 grayscale flat-128 image: 2 blocks, all coefficients 0.
    # Scan 1 (DC first, Al=0): custom 1-symbol DC table, diff category 0
    # per block. Scan 2 (AC first 1..63): custom table whose only symbol
    # is 0x10 = EOBn with r=1 -> EOBRUN = (1<<1)-1 + 1 appended bit;
    # appended bit 1 gives a run of 3 > 2 blocks... use bit 0 -> run 2,
    # covering BOTH blocks with one code (the fixture encoder only ever
    # emits single-block EOBs, so this path needs its own stream).
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qtbl = bytes([0]) + bytes([1] * 64)  # identity quant
    sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    dc_dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x00])
    ac_dht = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x10])
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, qtbl)
    out += seg(0xC2, sof)
    out += seg(0xC4, dc_dht)
    out += seg(0xC4, ac_dht)
    # DC-first scan: symbol 0 (code '0', 1 bit) twice -> bits 00 + pad
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bytes([0b00111111])
    # AC-first scan 1..63: one EOB2 code: bit '0' (symbol 0x10) then
    # 1 run bit '0' -> EOBRUN = 1+0, covers this block + 1 more
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bytes([0b00111111])
    out += b"\xff\xd9"
    img = decode_jpeg_progressive(bytes(out))
    assert img.shape == (8, 16)
    assert (img == 128).all()


def test_successive_approximation_refines_low_bits():
    # a coefficient of magnitude 1 is invisible at Al=1 and must appear
    # only via the refinement scan — verified indirectly: the 5-phase
    # fixture scan script drops |coef|==1 from first passes, yet the
    # final image still equals baseline (covered above); here assert
    # the intermediate property that first passes alone differ when
    # magnitude-1 coefficients exist
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = encode_jpeg_progressive(img, 90)
    # truncate after scan 4 of 8 (DC first + 2x3-band AC... count SOS)
    sos_offsets = []
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] == 0xDA:
            sos_offsets.append(pos)
        pos += 1
    assert len(sos_offsets) >= 6  # 1 DC + 6 AC-first/refine + ...
    truncated = payload[: sos_offsets[-1]] + b"\xff\xd9"
    partial = decode_jpeg_progressive(truncated)
    full = decode_jpeg_progressive(payload)
    assert partial.shape == full.shape
    assert not np.array_equal(partial, full)  # last scan carried info


@pytest.mark.parametrize("quality", [50, 90])
def test_progressive_420_equals_baseline(quality):
    # 4:2:0 exercises the decoder's padded-MCU grid (interleaved DC)
    # vs full-grid (non-interleaved AC) distinction; 20-wide luma has
    # 4 padded but only 3 full block columns
    rng = np.random.default_rng(21)
    for shape in ((16, 16, 3), (12, 20, 3), (17, 23, 3), (9, 31, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        from pyhctsa_spark.operators.codecs_jpeg_progressive import (
            encode_jpeg_progressive,
        )

        prog = J.decode_jpeg(encode_jpeg_progressive(img, quality,
                                                     subsample=True))
        base = J.decode_jpeg(J.encode_jpeg(img, quality, subsample=True))
        assert np.array_equal(prog, base)
