"""Generate the PD_PeriodicityWang spline hat-matrix lookup.

splinefit3's B-spline basis depends only on the series LENGTH (knots at
0, floor(N/2)-1, N-1 with mirrored extension), so the projection
H = A (A'A)^-1 A' is a per-N mathematical constant. Precomputing H for
n in [40, 100] lets plain SQL replay the spline detrend as a matvec
join; everything downstream (raw autocovariance, peak/trough scan,
thresholds) is computed from the data."""

import numpy as np
import pandas as pd

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyhctsa_spark.functions.embedding import _bspline_basis  # noqa: E402

rows = []
for n in range(40, 101):
    b0, b1, b2 = 0.0, float(n // 2 - 1), float(n - 1)
    h0, h1 = b1 - b0, b2 - b1
    knots = np.array([
        b0 - (2 * h1 + h0), b0 - (h1 + h0), b0 - h1,
        b0, b1, b2,
        b2 + h0, b2 + h0 + h1, b2 + 2 * h0 + h1,
    ])
    x = np.arange(n, dtype=np.float64)
    A = _bspline_basis(x, knots, order=4)
    H = A @ np.linalg.solve(A.T @ A, A.T)
    for i in range(n):
        for j in range(n):
            rows.append((n, i, j, H[i, j]))
df = pd.DataFrame(rows, columns=["n", "i", "j", "h"])
df.to_parquet("tests/golden/spline_hat.parquet", index=False)
print(len(df), "rows,", os.path.getsize("tests/golden/spline_hat.parquet"), "bytes")
