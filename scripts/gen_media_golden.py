"""Generate the golden snapshot for the media_features oracle —
INDEPENDENTLY of the engine code under test.

The multimodal spec (documented in operators/multimodal.py, replicated
here WITHOUT importing it) is:

  synth table, n=48 items, i in 0..47:
    rng      = np.random.default_rng(i)
    modality = ['image','audio','video'][i % 3]
    payload  = rng.integers(0, 256, 64 + (i % 5) * 32, uint8) bytes
  fake decode:
    seed = little-endian uint64 of payload[:8]  (mod 2**32)
    image -> default_rng(seed).integers(0,256,(8,8,3)) uint8
    audio -> default_rng(seed).standard_normal(256) float32
    video -> default_rng(seed).integers(0,256,(12,8,8)) uint8
  features over the float64 flattened array:
    mean, std (ddof=1), p01/p99 (np.quantile, linear), and
    feat_0..feat_7 = means of np.array_split(flat, 8) chunks
  all doubles rounded to 6 places with Spark round() semantics
  (BigDecimal HALF_UP on the shortest decimal representation).

Because this script derives the numbers from the spec with plain numpy
(no pyhctsa_spark import), a byte-identical regeneration proves the
engine's mapInPandas pipeline computes the spec — the golden is no
longer self-referential.

Regenerate with: python scripts/gen_media_golden.py
Verify only (no write): python scripts/gen_media_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_features_48.parquet",
)

N_ITEMS = 48
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    """Spark round(col, 6): Double.toString -> BigDecimal HALF_UP.
    Python's repr(float) is the same shortest round-trip decimal."""
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        rng = np.random.default_rng(i)
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, 64 + (i % 5) * 32, dtype=np.uint8)
        seed = int(
            np.frombuffer(payload.tobytes()[:8].ljust(8, b"\0"), dtype="<u8")[0]
            % 2**32
        )
        drng = np.random.default_rng(seed)
        if modality == "image":
            arr = drng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        elif modality == "audio":
            arr = drng.standard_normal(256).astype(np.float32)
        else:
            arr = drng.integers(0, 256, (12, 8, 8)).astype(np.uint8)
        flat = arr.astype(np.float64).ravel()
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"m{i:06d}",
            "modality": modality,
            "n_bytes": len(payload),
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


FRAMES_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_frames_48.parquet",
)
FRAME_EVERY_K = 4


def expected_frames() -> pd.DataFrame:
    """Per-frame stats for video items, sampled every FRAME_EVERY_K
    frames (operators/multimodal.sample_video_frames spec: population
    std over the float64 frame)."""
    rows = []
    for i in range(N_ITEMS):
        if i % 3 != 2:  # only 'video' modality
            continue
        rng = np.random.default_rng(i)
        payload = rng.integers(0, 256, 64 + (i % 5) * 32, dtype=np.uint8)
        seed = int(
            np.frombuffer(payload.tobytes()[:8].ljust(8, b"\0"), dtype="<u8")[0]
            % 2**32
        )
        arr = np.random.default_rng(seed).integers(0, 256, (12, 8, 8)).astype(
            np.uint8
        )
        for fi in range(0, arr.shape[0], FRAME_EVERY_K):
            frame = arr[fi].astype(np.float64)
            rows.append({
                "media_id": f"m{i:06d}",
                "frame_idx": fi,
                "f_mean": spark_round6(float(frame.mean())),
                "f_std": spark_round6(float(frame.std())),
            })
    pdf = pd.DataFrame(rows)
    pdf["frame_idx"] = pdf["frame_idx"].astype("int32")
    return pdf


def main() -> int:
    pdf = expected_rows()
    fdf = expected_frames()
    if "--check" in sys.argv:
        old = pd.read_parquet(OUT)
        same = old[pdf.columns].equals(pdf)
        same_f = True
        if os.path.exists(FRAMES_OUT):
            same_f = pd.read_parquet(FRAMES_OUT)[fdf.columns].equals(fdf)
        print(f"golden match vs committed: features={same} frames={same_f}")
        return 0 if (same and same_f) else 1
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    fdf.to_parquet(FRAMES_OUT, index=False)
    print(f"wrote {len(pdf)} feature rows -> {OUT}")
    print(f"wrote {len(fdf)} frame rows -> {FRAMES_OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
