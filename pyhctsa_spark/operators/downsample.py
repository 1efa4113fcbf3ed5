"""Visual downsampling: largest-triangle-three-buckets (LTTB).

The rollup tiers (operators/rollup.py) downsample by AGGREGATING —
each coarser tier summarizes windows of the finer one. LTTB is the
complementary SHAPE-preserving downsample (Steinarsson 2013): pick
``n_out`` actual points per series such that the polyline through them
preserves the visual extremes — the operation a dashboard runs before
plotting a million-point series.

Spec (deterministic, engine == oracle):
- points sorted by time; first and last always kept; series with
  ``n <= n_out`` pass through whole.
- the ``n-2`` interior points split into ``nb = n_out - 2`` buckets by
  INTEGER arithmetic: point ``j`` (0-based, interior ``1..n-2``) lands
  in bucket ``(j-1)*nb // (n-2)`` — exact in both engines, no float
  boundary drift.
- bucket ``i``'s point maximizes the triangle area with the previously
  SELECTED point and the NEXT bucket's centroid (mean time/value; the
  final bucket uses the last point). Ties pick the earliest point.
- area uses the cross-product form
  ``|(ta-tc)*(vb-va) - (ta-tb)*(vc-va)|`` evaluated in exactly that
  association on both sides.

Cross-engine exactness: callers should feed integer-valued doubles
(epoch micros; values pre-scaled to integers). Interior times are
re-based to the series start inside the kernel, so bucket SUMS stay
below 2^53 and are exact regardless of summation order — the one
division per centroid then yields bit-identical doubles in numpy and
SQL, making the sequential argmax reproducible across engines.

Scale: ONE shuffle + in-partition sort + a carry-aware ``mapInArrow``
pass over sorted key-runs (operators/seq_runs.map_sorted_runs) — NOT
``applyInPandas``, whose per-group pandas machinery measured ~5x slower
than the whole Arrow pass at sf0.1 (2.4-4.5 s of pure overhead for
1,500 groups vs 0.6-1.0 s total).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from pyhctsa_spark.operators.seq_runs import key_fields_ddl, map_sorted_runs


def lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points of a (sorted-by-t) series."""
    n = len(t)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3: {n_out}")
    if n <= n_out:
        return np.arange(n)
    nb = n_out - 2
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    tr = t - t[0]  # re-base: keeps bucket sums exact for integer inputs

    j = np.arange(1, n - 1)
    b = ((j - 1) * nb) // (n - 2)
    counts = np.bincount(b, minlength=nb).astype(np.float64)
    ct = np.bincount(b, weights=tr[1:-1], minlength=nb) / counts
    cv = np.bincount(b, weights=v[1:-1], minlength=nb) / counts
    # centroid used when selecting bucket i: bucket i+1, last point for
    # the final bucket
    nct = np.concatenate([ct[1:], [tr[-1]]])
    ncv = np.concatenate([cv[1:], [v[-1]]])

    starts = np.searchsorted(b, np.arange(nb), side="left")
    ends = np.searchsorted(b, np.arange(nb), side="right")
    sel = np.empty(n_out, dtype=np.int64)
    sel[0], sel[-1] = 0, n - 1
    sa, sv = tr[0], v[0]
    for i in range(nb):
        lo, hi = starts[i] + 1, ends[i] + 1  # candidate point indices
        tc, vc = tr[lo:hi], v[lo:hi]
        area = np.abs((sa - nct[i]) * (vc - sv) - (sa - tc) * (ncv[i] - sv))
        k = lo + int(np.argmax(area))  # first max == earliest point
        sel[i + 1] = k
        sa, sv = tr[k], v[k]
    return sel


def lttb_downsample(
    events: DataFrame,
    on: str = "tus",
    by: list[str] | None = None,
    value_col: str = "value",
    n_out: int = 24,
) -> DataFrame:
    """LTTB-downsample each key's series to at most ``n_out`` points.

    ``on`` must be an integer (epoch-micros) column; for cross-engine
    reproducibility ``value_col`` should be integer-valued too (see
    module docstring). Output: by-keys, ``on`` (long), ``value_col``
    (double) of the selected rows only.
    """
    by = list(by or ["user_id"])
    sdf = events.select(
        *by,
        F.col(on).cast("long").alias(on),
        F.col(value_col).cast("double").alias(value_col),
    )

    def _run_fn(tbl: pa.Table) -> pa.Table:
        t = tbl.column(on).to_numpy(zero_copy_only=False)
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        return tbl.take(pa.array(lttb_indices(t, v, n_out)))

    return map_sorted_runs(
        sdf,
        by=by,
        order=[on],
        run_fn=_run_fn,
        out_schema=f"{key_fields_ddl(sdf, by)}, {on} long, {value_col} double",
    )
