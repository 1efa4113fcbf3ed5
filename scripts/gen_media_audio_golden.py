"""Golden snapshot for the media_audio_compressed oracle — derived from
the SPECS (ITU-T G.711, IMA ADPCM), not the engine (no pyhctsa_spark
import).

The compressed-audio media table (multimodal.synth_g711_media_df) draws
CODEWORDS from rng = default_rng(7000 + i) in a fixed call order, so
the decoded linear samples follow from the companding/ADPCM algorithms
alone. This script implements both independently — scalar, straight
from the published segment layouts, deliberately not the engine's
vectorized table builders — and recomputes the features.

Per item i in 0..23 (all modality 'audio'):
  i%3==0: 320 mu-law codewords  (WAVE tag 7,   n_bytes 12+24+8+320)
  i%3==1: 320 A-law codewords   (WAVE tag 6,   same container size)
  i%3==2: one 256-byte IMA ADPCM block: predictor ~ rng[-8000,8000),
          step index ~ rng[0,89), 252 nibble-pair bytes -> 505 samples

n_bytes IS part of this golden: container arithmetic is closed-form
(RIFF 12 + 'fmt '(8+16, +4-byte wSamplesPerBlock ext for ADPCM) +
'fact'(8+4, ADPCM only) + 'data'(8+len) + odd-length pad).

Regenerate: python scripts/gen_media_audio_golden.py
Verify only: python scripts/gen_media_audio_golden.py --check
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_audio_24.parquet",
)
N_ITEMS = 24
FEAT_DIM = 8


def spark_round6(x: float) -> float:
    if x != x or x in (float("inf"), float("-inf")):
        return float("nan")
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def ulaw_to_linear(code: int) -> int:
    """G.711 mu-law expansion, scalar from the spec: codeword is the
    one's complement of (sign | segment | mantissa); 14-bit linear
    magnitude is ((mantissa * 2 + 33) << segment) - 33, scaled x4 to
    16-bit."""
    c = (~code) & 0xFF
    segment = (c >> 4) & 0x07
    mantissa = c & 0x0F
    magnitude = ((mantissa * 2 + 33) << segment) - 33
    value = magnitude * 4
    return -value if c & 0x80 else value


def alaw_to_linear(code: int) -> int:
    """G.711 A-law expansion, scalar from the spec: even bits are
    inverted on the wire (XOR 0x55); segment 0 is linear with half-step
    offset; sign bit SET means positive."""
    c = code ^ 0x55
    segment = (c >> 4) & 0x07
    mantissa = c & 0x0F
    if segment == 0:
        magnitude = mantissa * 2 + 1
    else:
        magnitude = (mantissa * 2 + 33) << (segment - 1)
    value = magnitude * 8
    return value if c & 0x80 else -value


IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def ima_decode(body: bytes, predictor: int, index: int) -> list[int]:
    """IMA ADPCM block decode, scalar from the algorithm description:
    reconstructed difference = step/8 + bit-weighted step halves."""
    samples = [predictor]
    for byte in body:
        for nibble in (byte & 0x0F, (byte >> 4) & 0x0F):
            step = IMA_STEPS[index]
            diff = step >> 3
            if nibble & 0x01:
                diff += step >> 2
            if nibble & 0x02:
                diff += step >> 1
            if nibble & 0x04:
                diff += step
            if nibble & 0x08:
                predictor -= diff
            else:
                predictor += diff
            predictor = min(32767, max(-32768, predictor))
            index = min(88, max(0, index + IMA_INDEX_ADJ[nibble & 0x07]))
            samples.append(predictor)
    return samples


def wav_container_bytes(data_len: int, adpcm: bool = False) -> int:
    # RIFF(12) + fmt chunk(8 + 16 [+4-byte ext for ADPCM]) [+ fact
    # chunk(8 + 4) for ADPCM] + data chunk(8 + len [+ pad])
    fmt = 8 + (20 if adpcm else 16)
    fact = 12 if adpcm else 0
    return 12 + fmt + fact + 8 + data_len + (data_len & 1)


def expected_rows() -> pd.DataFrame:
    rows = []
    for i in range(N_ITEMS):
        rng = np.random.default_rng(7000 + i)
        kind = i % 3
        if kind < 2:
            codes = rng.integers(0, 256, 320).astype(np.uint8)
            expand = ulaw_to_linear if kind == 0 else alaw_to_linear
            ints = [expand(int(c)) for c in codes]
            n_bytes = wav_container_bytes(320)
        else:
            predictor = int(rng.integers(-8000, 8000))
            index = int(rng.integers(0, 89))
            body = rng.integers(0, 256, 252).astype(np.uint8).tobytes()
            ints = ima_decode(body, predictor, index)
            n_bytes = wav_container_bytes(4 + 252, adpcm=True)
        # engine decodes to float32 samples/32768, features in float64
        flat = (np.array(ints, dtype=np.float32) / 32768.0).astype(np.float64)
        chunks = np.array_split(flat, FEAT_DIM)
        row = {
            "media_id": f"g{i:06d}",
            "modality": "audio",
            "n_bytes": n_bytes,
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
