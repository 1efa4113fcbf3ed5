"""Generate the WL_DetailCoeffs linear-operator lookup.

The DWT + single-branch reconstruction is linear, so the level-l
reconstructed detail is D_l(N) @ y with D depending only on the series
length and level — computed by pushing the identity basis through the
engine's pywt-semantics cascade (wavedec + wrcoef, db3), for n in
[40, 100] and every admissible level. The oracle then replays the
whole operator as matvec joins; all statistics come from the data."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyhctsa_spark.functions.wavelet import (  # noqa: E402
    Wavelet,
    dwt_max_level,
    wavedec,
    wrcoef,
)

w = Wavelet("db3")
rows = []
for n in range(40, 101):
    ml = dwt_max_level(n, w)
    eye = np.eye(n)
    for level in range(1, ml + 1):
        cols = []
        for j in range(n):
            c, lens = wavedec(eye[j], w, level)
            cols.append(wrcoef(c, lens, w, level))
        D = np.column_stack(cols)  # D[i, j]
        for i in range(n):
            for j in range(n):
                if D[i, j] != 0.0:
                    rows.append((n, level, i, j, D[i, j]))
df = pd.DataFrame(rows, columns=["n", "level", "i", "j", "d"])
df.to_parquet("tests/golden/wavelet_detail.parquet", index=False)
print(len(df), "rows,", os.path.getsize("tests/golden/wavelet_detail.parquet"), "bytes")
