"""Baseline JPEG codec: spec-arithmetic goldens (hand-built streams,
expected pixels from an INDEPENDENT Annex A double-loop IDCT), lossy
round trips within quantization tolerance, subsampling, restart
markers, and registry dispatch."""

import struct
import sys
from os.path import abspath, dirname

import numpy as np
import pytest

sys.path.insert(0, dirname(dirname(abspath(__file__))))

from pyhctsa_spark.operators import codecs as C  # noqa: E402
from pyhctsa_spark.operators import codecs_jpeg as J  # noqa: E402

rng = np.random.default_rng(99)


def idct_annex_a(S: np.ndarray) -> np.ndarray:
    """Independent reference: the spec's Annex A IDCT as a literal
    quadruple loop (no shared code with the decoder's matrix form)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (cu * cv * S[u, v]
                            * np.cos((2 * x + 1) * v * np.pi / 16)
                            * np.cos((2 * y + 1) * u * np.pi / 16))
            out[y, x] = acc / 4
    return out


def test_idct_matches_spec_double_loop():
    S = rng.standard_normal((8, 8)) * 50
    assert np.abs(J.idct2(S) - idct_annex_a(S)).max() < 1e-12
    assert np.abs(J.idct2(J.fdct2(S)) - S).max() < 1e-12


def _segment(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_hand_built_dc_only_stream():
    """8x8 grayscale, all-ones quant table, Annex K Huffman tables,
    entropy bits hand-assembled: DC category 3 (code 100) + magnitude
    100 (diff=+4), then EOB (code 1010), padded with 1s. Expected
    pixels computed through the independent double-loop IDCT."""
    dqt = _segment(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _segment(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0]))
    dht = (_segment(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS)
                    + bytes(J.DC_LUMA_VALS))
           + _segment(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS)
                      + bytes(J.AC_LUMA_VALS)))
    sos = _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # bits: 100 | 100 | 1010 -> 1001001010 + 6 pad 1s = 0x92 0xBF
    scan = bytes([0x92, 0xBF])
    payload = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    S = np.zeros((8, 8))
    S[0, 0] = 4.0  # dequantized DC
    expected = np.clip(np.round(idct_annex_a(S) + 128.0), 0, 255)
    assert dec.shape == (8, 8)
    assert np.array_equal(dec, expected.astype(np.uint8))


def test_hand_built_single_ac_coefficient():
    """Same frame, entropy bits: DC cat 0 (code 00), then AC symbol
    0x01 (run 0, size 1; Annex K code '00') + magnitude bit 1 (+1 at
    zigzag index 1), then EOB."""
    dqt = _segment(0xDB, bytes([0]) + bytes([2] * 64))  # quant = 2
    sof = _segment(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0]))
    dht = (_segment(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS)
                    + bytes(J.DC_LUMA_VALS))
           + _segment(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS)
                      + bytes(J.AC_LUMA_VALS)))
    sos = _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # bits: 00 | 00 1 | 1010 -> 001011010 wait: DC cat0 '00', AC(0,1)
    # code '00' + 1 magnitude bit '1', EOB '1010' = 00 001 1010 (9
    # bits) + 7 pad 1s -> 0x0D 0x7F
    scan = bytes([0b00001101, 0b01111111])
    payload = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    S = np.zeros((8, 8))
    S[J.ZIGZAG[1] // 8, J.ZIGZAG[1] % 8] = 1 * 2  # dequantized
    expected = np.clip(np.round(idct_annex_a(S) + 128.0), 0, 255)
    assert np.array_equal(dec, expected.astype(np.uint8))


def test_flat_block_quality100_exact():
    flat = np.full((16, 16), 77, np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(flat, 100)), flat)
    flat_rgb = np.full((8, 8, 3), 200, np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(flat_rgb, 100))
    assert np.abs(dec.astype(int) - 200).max() <= 1  # color-space round


def test_smooth_gradient_round_trip_within_tolerance():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([(yy * 5) % 256, (xx * 3) % 256,
                    ((xx + yy) * 2) % 256], -1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_chroma_subsampling_420():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([(yy * 5) % 256, (xx * 3) % 256,
                    ((xx + yy) * 2) % 256], -1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0


def test_restart_intervals_bit_identical_content():
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(img, 80))
    with_rst = J.decode_jpeg(J.encode_jpeg(img, 80, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_noise_and_odd_sizes_decode():
    for shape in ((9, 13, 3), (17, 23, 3), (8, 8, 3), (1, 1, 3), (5, 5)):
        img = rng.integers(0, 256, shape, np.uint8)
        for sub in (False, True):
            if sub and len(shape) == 2:
                continue
            dec = J.decode_jpeg(J.encode_jpeg(img, 50, subsample=sub))
            assert dec.shape == img.shape


def test_grayscale_shape_and_values():
    g = np.linspace(0, 255, 64, dtype=np.uint8).reshape(8, 8)
    dec = J.decode_jpeg(J.encode_jpeg(g, 100))
    assert dec.shape == (8, 8)
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def test_non_baseline_sof_raises_typed_boundary():
    # SOF2 (progressive) and SOF3 (lossless) are handled in-repo now;
    # arithmetic-coded SOF9 remains the typed boundary
    sof9 = (b"\xff\xd8" + b"\xff\xc9" + b"\x00\x0b"
            + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00" + b"\xff\xd9")
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(sof9)
    with pytest.raises(ValueError):
        J.decode_jpeg(b"notjpeg")


def test_registry_dispatches_jpeg():
    img = np.full((8, 8, 3), 64, np.uint8)
    dec = C.sniff_and_decode(J.encode_jpeg(img, 100), "image")
    assert dec.shape == (8, 8, 3)
    assert np.abs(dec.astype(int) - 64).max() <= 1
