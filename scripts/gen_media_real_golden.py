"""Golden snapshot for the media_real_decode oracle — derived from the
SPEC, not the engine (no pyhctsa_spark import).

The real-codec media table (operators/multimodal.synth_real_media_df)
is, per item i in 0..47 with rng = default_rng(1000 + i):

  image (i%3==0): uint8 (8,8,3);  payload = BMP when i odd else PPM —
    both round-trip losslessly, so the decoded array IS the content.
  audio (i%3==1): x = sin(linspace(0, 20+i, 256))*0.5 + 0.05*noise,
    clipped to [-1,1], encoded 16-bit PCM; the decoder returns
    clip(round(x*32767))/32768 as float32.
  video (i%3==2): uint8 (12,8,8,3) frames, concatenated-P6 stream —
    lossless.

Features over the float64 flattened decoded array: mean, std(ddof=1),
p01/p99 (np.quantile linear), feat_0..7 = means of array_split chunks;
Spark round(x, 6) = BigDecimal HALF_UP of the shortest repr.

n_bytes is the ENCODED payload length, which this script recomputes
from the container specs directly (WAV 44-byte canonical header + 2
bytes/sample; PPM "P6\\n8 8\\n255\\n"+192; BMP 54 + rows padded to 4;
P6 stream = 12 frames x single-frame length).

Regenerate: python scripts/gen_media_real_golden.py
Verify only: python scripts/gen_media_real_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_real_48.parquet",
)
N_ITEMS = 48
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _ppm_len(h: int, w: int) -> int:
    return len(b"P6" + f"\n{w} {h}\n255\n".encode()) + h * w * 3


def _bmp_len(h: int, w: int) -> int:
    return 14 + 40 + (((w * 3 + 3) // 4) * 4) * h


def _wav_len(n_samples: int) -> int:
    data = n_samples * 2
    return 12 + 8 + 16 + 8 + data + (data & 1)


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        rng = np.random.default_rng(1000 + i)
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            n_bytes = _bmp_len(8, 8) if i % 2 else _ppm_len(8, 8)
            flat = arr.astype(np.float64).ravel()
        elif modality == "audio":
            x = np.sin(np.linspace(0, 20 + i, 256)) * 0.5
            x += rng.standard_normal(256) * 0.05
            x = np.clip(x, -1, 1)
            ints = np.clip(np.round(x * 32767.0), -32768, 32767)
            dec = (ints / 32768.0).astype(np.float32)
            n_bytes = _wav_len(256)
            flat = dec.astype(np.float64).ravel()
        else:
            arr = rng.integers(0, 256, (12, 8, 8, 3), dtype=np.uint8)
            n_bytes = 12 * _ppm_len(8, 8)
            flat = arr.astype(np.float64).ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"r{i:06d}",
            "modality": modality,
            "n_bytes": n_bytes,
            "mean": spark_round6(float(flat.mean())),
            "std": spark_round6(float(flat.std(ddof=1))),
            "p01": spark_round6(float(np.quantile(flat, 0.01))),
            "p99": spark_round6(float(np.quantile(flat, 0.99))),
        }
        for j, c in enumerate(chunks):
            row[f"feat_{j}"] = spark_round6(float(c.mean()))
        rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["n_bytes"] = pdf["n_bytes"].astype("int64")
    return pdf


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
