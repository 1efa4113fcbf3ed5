"""Golden snapshot for the media_webp_decode oracle — VP8L is LOSSLESS,
so this script recomputes the expected features from the raw CONTENT
pixels with NO codec in the loop at all (no pyhctsa_spark import): the
engine's decode must reproduce that content bit-for-bit or the value
hash breaks.

Content replica of multimodal.synth_webp_media_df: per item i in 0..15,
rng = default_rng(6600 + i) in a fixed call order; variant rotates
plain / subtract-green / predictor / palette / rgba (the encoder-side
transform only changes the WIRE bytes, never the decoded pixels — the
expected features depend solely on the content). n_bytes is excluded:
the entropy-coded payload length has no closed form (the wire format is
pinned separately by tests/test_codecs_webp.py's byte-stability
golden).

Regenerate: python scripts/gen_media_webp_golden.py
Verify only: python scripts/gen_media_webp_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_webp_16.parquet",
)
N_ITEMS = 16
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def content(i: int) -> np.ndarray:
    rng = np.random.default_rng(6600 + i)
    h = 8 + (i * 3) % 9
    w = 8 + (i * 5) % 11
    variant = ("plain", "sg", "pred", "palette", "rgba")[i % 5]
    if variant == "palette":
        ncol = (2, 3, 5)[(i // 5) % 3]
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, (h, w))
        return pal[idx]
    if variant == "rgba":
        return rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        flat = content(i).astype(np.float64).ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"w{i:06d}",
            "modality": "image",
            "mean": spark_round6(float(flat.mean())),
            "std": spark_round6(float(flat.std(ddof=1))),
            "p01": spark_round6(float(np.quantile(flat, 0.01))),
            "p99": spark_round6(float(np.quantile(flat, 0.99))),
        }
        for j, c in enumerate(chunks):
            row[f"feat_{j}"] = spark_round6(float(c.mean()))
        rows.append(row)
    return pd.DataFrame(rows)


def main() -> int:
    pdf = expected_rows()
    if "--check" in sys.argv:
        old = pd.read_parquet(OUT)
        same = old[pdf.columns].equals(pdf)
        print(f"golden match vs committed: {same}")
        return 0 if same else 1
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
