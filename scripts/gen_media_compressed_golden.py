"""Golden snapshot for the media_compressed_decode oracle — derived
from the SPEC, not the engine (no pyhctsa_spark import).

The compressed-codec media table (multimodal.synth_compressed_media_df)
draws content from rng = default_rng(3000 + i) in a fixed call order,
then encodes it as PNG / GIF / WAV. PNG and GIF are LOSSLESS, so the
engine's decoded array equals the spec-side content exactly — this
script recomputes the features from that content with zero engine code.
WAV quantizes to 16-bit PCM; the quantization replica is the spec's
clip(round(x*32767))/32768.

Per item i in 0..47:
  image (i%3==0), variant (i//3)%4:
    0: PNG RGB uint8 (8,8,3)          1: PNG gray uint8 (8,8)
    2: PNG palette  pal(16,3)+idx(8,8) -> content pal[idx]
    3: GIF          pal(256,3)+idx(8,8) -> content pal[idx]
  audio (i%3==1): 256-sample sin+noise, 16-bit PCM WAV
  video (i%3==2): GIF pal(256,3)+frames(4,8,8) -> content pal[frames]

n_bytes is intentionally NOT part of this golden: compressed payload
lengths depend on zlib/LZW output, which has no closed form — the
driver query projects only the decoded-content features.

Regenerate: python scripts/gen_media_compressed_golden.py
Verify only: python scripts/gen_media_compressed_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_compressed_48.parquet",
)
N_ITEMS = 48
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
        rng = np.random.default_rng(3000 + i)
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            variant = (i // 3) % 4
            if variant == 0:
                content = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            elif variant == 1:
                content = rng.integers(0, 256, (8, 8), dtype=np.uint8)
            elif variant == 2:
                pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
                idx = rng.integers(0, 16, (8, 8), dtype=np.uint8)
                content = pal[idx]
            else:
                pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
                idx = rng.integers(0, 256, (8, 8), dtype=np.uint8)
                content = pal[idx]
            flat = content.astype(np.float64).ravel()
        elif modality == "audio":
            x = np.sin(np.linspace(0, 20 + i, 256)) * 0.5
            x += rng.standard_normal(256) * 0.05
            x = np.clip(x, -1, 1)
            ints = np.clip(np.round(x * 32767.0), -32768, 32767)
            flat = (ints / 32768.0).astype(np.float32).astype(np.float64)
        else:
            pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
            frames = rng.integers(0, 256, (4, 8, 8), dtype=np.uint8)
            flat = pal[frames].astype(np.float64).ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"c{i:06d}",
            "modality": modality,
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
