"""Golden snapshot for the media_jpeg_lossless oracle — SOF3 lossless
JPEG, so the expected features are recomputed from the raw CONTENT
images with NO engine import, and n_bytes from an INDEPENDENT scalar
replay of T.81 Annex H: the predictor walk, mod-2^16 differences, SSSS
categories, the fixture's fixed 5-bit Huffman table, byte stuffing and
the closed-form segment sizes. If the engine's encoder or decoder
drifts from the spec in either direction, the value hash breaks.

Content replica of multimodal.synth_jpeg_lossless_media_df: per item i
in 0..15, rng = default_rng(7700 + i) in a fixed call order; predictor
rotates 1..7; kind rotates gray8 / rgb8 / gray16 / gray12;
h = 8 + (i*3) % 9, w = 8 + (i*5) % 11.

Regenerate: python scripts/gen_media_jpegls_golden.py
Verify only: python scripts/gen_media_jpegls_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_jpegls_16.parquet",
)
N_ITEMS = 16
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def content_for(i: int):
    rng = np.random.default_rng(7700 + i)
    pred = 1 + i % 7
    kind = ("gray8", "rgb8", "gray16", "gray12")[i % 4]
    h = 8 + (i * 3) % 9
    w = 8 + (i * 5) % 11
    if kind == "gray8":
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        prec = 8
    elif kind == "rgb8":
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        prec = 8
    elif kind == "gray16":
        img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        prec = 16
    else:
        img = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        prec = 12
    return img, pred, prec


def annex_h_payload_bytes(img: np.ndarray, predictor: int, prec: int) -> int:
    """Scalar, spec-text replay of the encoder wire size: H.1.2
    prediction, H.1.2.3 mod-2^16 differences, the 17-symbol fixed
    5-bit table, F.1.2.1-style appended magnitude bits, F.1.2.3 byte
    stuffing, B.2 segment framing."""
    a = img if img.ndim == 3 else img[:, :, None]
    h, w, nc = a.shape
    default = 1 << (prec - 1)
    # entropy-coded byte count via a minimal bit emitter with stuffing
    nbytes = 0
    acc = 0
    nbits = 0

    def emit(value: int, length: int):
        nonlocal acc, nbits, nbytes
        acc = (acc << length) | (value & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            b = (acc >> nbits) & 0xFF
            nbytes += 2 if b == 0xFF else 1
        acc &= (1 << nbits) - 1

    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                p = a[:, :, ci].astype(np.int64)
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra, rb, rc = (
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                    px = {
                        1: ra,
                        2: rb,
                        3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                ssss = abs(diff).bit_length() if diff != -32768 else 16
                emit(ssss, 5)  # canonical codes 0..16 at length 5
                if 0 < ssss < 16:
                    v = diff if diff >= 0 else diff + (1 << ssss) - 1
                    emit(v, ssss)
    if nbits:
        pad = 8 - nbits
        emit((1 << pad) - 1, pad)
    # SOI + DHT(38) + SOF3(10 + 3*nc) + SOS(8 + 2*nc) + data + EOI
    return 2 + 38 + (10 + 3 * nc) + (8 + 2 * nc) + nbytes + 2


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        img, pred, prec = content_for(i)
        flat = img.astype(np.float64).ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"j{i:06d}",
            "modality": "image",
            "n_bytes": annex_h_payload_bytes(img, pred, prec),
            "mean": spark_round6(float(flat.mean())),
            "std": spark_round6(float(flat.std(ddof=1))),
            "p01": spark_round6(float(np.quantile(flat, 0.01))),
            "p99": spark_round6(float(np.quantile(flat, 0.99))),
        }
        for j, c in enumerate(chunks):
            row[f"feat_{j}"] = spark_round6(float(c.mean()))
        rows.append(row)
    df = pd.DataFrame(rows)
    df["n_bytes"] = df["n_bytes"].astype("int64")
    return df


def main() -> int:
    df = expected_rows()
    if "--check" in sys.argv:
        cur = pd.read_parquet(OUT)
        if not cur.reset_index(drop=True).equals(df.reset_index(drop=True)):
            print("STALE: tests/golden/media_jpegls_16.parquet != spec replay")
            return 1
        print("golden is current")
        return 0
    df.to_parquet(OUT, index=False)
    print(f"wrote {OUT} ({len(df)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
