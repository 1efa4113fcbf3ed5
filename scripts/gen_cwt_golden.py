"""Generate the WL_cwt per-scale filter lookup.

pywt's CWT is, per scale a, a plain 1-D convolution with the reversed
sampled integrated wavelet followed by a diff, a -sqrt(a) scale and a
center crop — i.e. convolution with the fixed filter
F_a = -sqrt(a) * diff([0, int_psi_sampled_reversed, 0]) cropped at a
per-scale offset. F_a depends ONLY on the scale (db3, precision 10),
so the whole 32-scale transform is a ~2.7k-row lookup joined to the
data. Offsets are verified empirically against the engine's cwt()."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math  # noqa: E402

import pandas as pd  # noqa: E402

from pyhctsa_spark.functions.wavelet import Wavelet, _wavefun, cwt  # noqa: E402

w = Wavelet("db3")
psi, x = _wavefun(w, 10)
dx = x[1] - x[0]
int_psi = np.cumsum(psi) * dx

rng = np.random.default_rng(7)
rows = []
for a in range(1, 33):
    j = np.floor(np.arange(a * (x[-1] - x[0]) + 1) / (a * dx)).astype(np.int64)
    j = j[j < len(int_psi)]
    ips = int_psi[j][::-1]
    F = -math.sqrt(a) * np.diff(np.concatenate([[0.0], ips, [0.0]]))
    # verify: conv(y, F) center-cropped == engine cwt row, find the offset
    for N in (50, 87):
        y = rng.normal(size=N)
        ref = cwt(y, np.array([a]), w)[0]
        full = np.convolve(y, F)
        hits = [off for off in range(len(full) - N + 1)
                if np.allclose(full[off:off + N], ref, atol=1e-12)]
        assert hits, (a, N)
        off = hits[0]
        # offset must be expressible as floor((len(F)-1)/2) pattern; store
        # per (a, N parity safety): verify both N give the same formula
        d = (len(full) - N) / 2.0
        assert off == int(np.floor(d)), (a, N, off, d)
    for k, fv in enumerate(F):
        rows.append((a, k, fv))
df = pd.DataFrame(rows, columns=["scale", "k", "f"])
df.to_parquet("tests/golden/cwt_filters.parquet", index=False)
print(len(df), "rows,", os.path.getsize("tests/golden/cwt_filters.parquet"), "bytes")
