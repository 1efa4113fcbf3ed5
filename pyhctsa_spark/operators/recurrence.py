"""Per-series recurrences: EWMA smoothing and CUSUM drift detection.

Both are order-dependent scans — output *i* needs output *i-1* — so
they run as sequential numpy kernels over sorted key-runs via
operators/seq_runs.map_sorted_runs (one shuffle, carry-aware Arrow
pass, memory bounded by one key's series). The DuckDB oracles replay
the same recurrences as recursive CTEs (ENGINE_ORACLES['user_ewma'],
['user_cusum']); both sides evaluate the identical IEEE-double
expression sequence, so results agree bit-for-bit before the round(6).

EWMA (exponential smoothing, the `smoothing` every monitoring TSDB
ships):  s_0 = v_0;  s_i = alpha*v_i + (1-alpha)*s_{i-1}.
Use an alpha exactly representable in binary (0.25, 0.5, 0.125...) so
(1-alpha) is exact too and the recurrence carries no constant error.

CUSUM (Page 1954, the standard drift/changepoint monitor): one-sided
upper/lower cumulative sums against a target with slack k,
    hi_i = max(0, hi_{i-1} + (v_i - target - k))
    lo_i = max(0, lo_{i-1} - (v_i - target + k))
with an alarm whenever either side exceeds the decision interval h.
Emitted per key: final statistics, alarm counts, and the timestamp of
the first alarm — the summary a fleet-wide drift monitor aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from pyhctsa_spark.operators.seq_runs import key_fields_ddl, map_sorted_runs


def ewma_kernel(v: np.ndarray, alpha: float) -> np.ndarray:
    """Sequential exponential smoothing (loop — the recurrence is not
    vectorizable without scan primitives; O(n) per series)."""
    s = np.empty_like(v, dtype=np.float64)
    acc = v[0]
    s[0] = acc
    b = 1.0 - alpha
    for i in range(1, len(v)):
        acc = alpha * v[i] + b * acc
        s[i] = acc
    return s


def ewma(
    events: DataFrame,
    on: str = "tus",
    by: list[str] | None = None,
    value_col: str = "value",
    alpha: float = 0.25,
) -> DataFrame:
    """Append an ``ewma`` column to each key's time-ordered series."""
    by = list(by or ["user_id"])
    sdf = events.select(
        *by,
        F.col(on).cast("long").alias(on),
        F.col(value_col).cast("double").alias(value_col),
    )

    def _run_fn(tbl: pa.Table) -> pa.Table:
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        return tbl.append_column("ewma", pa.array(ewma_kernel(v, alpha)))

    return map_sorted_runs(
        sdf,
        by=by,
        order=[on],
        run_fn=_run_fn,
        out_schema=(
            f"{key_fields_ddl(sdf, by)}, {on} long, "
            f"{value_col} double, ewma double"
        ),
    )


def cusum_kernel(
    v: np.ndarray, target: float, k: float, h: float
) -> tuple[float, float, int, int, int]:
    """Tabular two-sided CUSUM; returns (final_hi, final_lo, n_alarm_hi,
    n_alarm_lo, first_alarm_idx) with idx=-1 when no alarm."""
    hi = lo = 0.0
    n_hi = n_lo = 0
    first = -1
    up = target + k
    dn = target - k
    for i in range(len(v)):
        hi = hi + (v[i] - up)
        if hi < 0.0:
            hi = 0.0
        lo = lo - (v[i] - dn)
        if lo < 0.0:
            lo = 0.0
        if hi > h:
            n_hi += 1
            if first < 0:
                first = i
        if lo > h:
            n_lo += 1
            if first < 0:
                first = i
    return hi, lo, n_hi, n_lo, first


def cusum(
    events: DataFrame,
    on: str = "tus",
    by: list[str] | None = None,
    value_col: str = "value",
    target: float = 10.0,
    k: float = 1.0,
    h: float = 25.0,
) -> DataFrame:
    """Per-key CUSUM drift summary: n, final hi/lo statistics, alarm
    counts per side, and the timestamp of the first alarm (NULL when the
    series never alarms)."""
    by = list(by or ["user_id"])
    sdf = events.select(
        *by,
        F.col(on).cast("long").alias(on),
        F.col(value_col).cast("double").alias(value_col),
    )

    def _run_fn(tbl: pa.Table) -> pa.Table:
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        t = tbl.column(on).to_numpy(zero_copy_only=False)
        hi, lo, n_hi, n_lo, first = cusum_kernel(v, target, k, h)
        cols = {c: tbl.column(c).slice(0, 1) for c in by}
        cols["n"] = pa.array([len(v)], pa.int64())
        cols["cusum_hi"] = pa.array([hi], pa.float64())
        cols["cusum_lo"] = pa.array([lo], pa.float64())
        cols["n_alarm_hi"] = pa.array([n_hi], pa.int64())
        cols["n_alarm_lo"] = pa.array([n_lo], pa.int64())
        cols["first_alarm_t"] = pa.array(
            [int(t[first]) if first >= 0 else None], pa.int64()
        )
        return pa.table(cols)

    return map_sorted_runs(
        sdf,
        by=by,
        order=[on],
        run_fn=_run_fn,
        out_schema=(
            f"{key_fields_ddl(sdf, by)}, n long, cusum_hi double, "
            "cusum_lo double, n_alarm_hi long, n_alarm_lo long, "
            "first_alarm_t long"
        ),
    )


def holt_kernel(
    v: np.ndarray, alpha: float, beta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Holt double-exponential smoothing (level + trend):
        l_0 = v_0,  b_0 = 0
        l_i = alpha*v_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}
    """
    n = len(v)
    lvl = np.empty(n, dtype=np.float64)
    trd = np.empty(n, dtype=np.float64)
    la = 1.0 - alpha
    lb = 1.0 - beta
    l_prev = v[0]
    b_prev = 0.0
    lvl[0], trd[0] = l_prev, b_prev
    for i in range(1, n):
        l_new = alpha * v[i] + la * (l_prev + b_prev)
        b_prev = beta * (l_new - l_prev) + lb * b_prev
        l_prev = l_new
        lvl[i], trd[i] = l_new, b_prev
    return lvl, trd


def holt(
    events: DataFrame,
    on: str = "tus",
    by: list[str] | None = None,
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Append Holt level/trend columns to each key's ordered series.

    Use exactly-representable alpha/beta (0.5, 0.25) so both recurrence
    constants are exact doubles and the oracle's recursive-CTE replay is
    bit-identical. Like EWMA, the smoothed values of 2-decimal inputs
    are dyadic rationals that can land exactly on a decimal rounding
    halfway — emit scaled integers, not round(x, 6), when hashing.
    """
    by = list(by or ["user_id"])
    sdf = events.select(
        *by,
        F.col(on).cast("long").alias(on),
        F.col(value_col).cast("double").alias(value_col),
    )

    def _run_fn(tbl: pa.Table) -> pa.Table:
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        lvl, trd = holt_kernel(v, alpha, beta)
        return tbl.append_column("level", pa.array(lvl)).append_column(
            "trend", pa.array(trd)
        )

    return map_sorted_runs(
        sdf,
        by=by,
        order=[on],
        run_fn=_run_fn,
        out_schema=(
            f"{key_fields_ddl(sdf, by)}, {on} long, "
            f"{value_col} double, level double, trend double"
        ),
    )
