"""Generate the FC_Surprise sampled-index lookup (tests/golden/).

The reference's 'random' scan positions are np.random.seed(0) +
permutation(N - memory), which depend ONLY on the series length — a
deterministic mathematical constant per N. Precomputing them as a
parquet lookup lets plain SQL replay the full operator, turning an
'unreachable RNG op' into a driver-oracled one (the oracle still
computes symbols, memory windows, probabilities, and statistics from
the data itself)."""

import numpy as np
import pandas as pd

rows = []
for n in range(30, 201):
    m = int(round(0.2 * n))
    np.random.seed(0)
    rs = np.random.permutation(n - m) + m
    rs = np.sort(rs[: min(500, len(rs) - 1)])
    for t in rs:
        rows.append((n, int(t)))
df = pd.DataFrame(rows, columns=["n", "t"])
df.to_parquet("tests/golden/surprise_rs.parquet", index=False)
print(len(df), "rows for n in [30, 200]")
