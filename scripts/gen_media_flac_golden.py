"""Golden snapshot for the media_flac_decode oracle — FLAC is LOSSLESS,
so this script recomputes the expected features from the raw CONTENT
samples with NO codec in the loop at all (no pyhctsa_spark import): the
engine's decode must reproduce that content bit-for-bit or the value
hash breaks.

Content replica of multimodal.synth_flac_media_df: per item i in 0..15,
rng = default_rng(9000 + i) in a fixed call order; mode rotates
verbatim / fixed1 / fixed2 / constant; every i%3==2 item is stereo
(except constant). Engine decodes to float32 samples / 32768, features
in float64 (extract_media_features). n_bytes is excluded: Rice-coded
payload length has no closed form.

Regenerate: python scripts/gen_media_flac_golden.py
Verify only: python scripts/gen_media_flac_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_flac_16.parquet",
)
N_ITEMS = 16
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        rng = np.random.default_rng(9000 + i)
        mode = ["verbatim", "fixed1", "fixed2", "constant"][i % 4]
        stereo = i % 3 == 2
        n_smp = 400 + (i * 37) % 300
        if mode == "constant":
            content = np.full(n_smp, int(rng.integers(-20000, 20000)),
                              np.int32)
        else:
            base = (
                np.sin(np.linspace(0, 15 + i, n_smp)) * 12000
                + rng.integers(-800, 800, n_smp)
            ).astype(np.int32)
            if stereo:
                content = np.stack(
                    [base, np.roll(base, 7) // 2], axis=1
                ).astype(np.int32)
            else:
                content = base
        flat = (content.astype(np.float32) / 32768.0).astype(np.float64)
        flat = flat.ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"f{i:06d}",
            "modality": "audio",
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
