"""Continuous aggregates over irregular event streams.

TSDB-style operators (TimescaleDB ``counter_agg``/``time_weight``,
PromQL ``increase``/``rate``) re-expressed as Spark window + aggregate
plans. Everything here is shuffle-lean by construction: the per-key
``lag`` scan hash-partitions on the entity key, and the follow-up
``groupBy(key, window)`` is satisfied by that same partitioning
(HashPartitioning(key) clusters every (key, window) group), so the
whole aggregate is ONE exchange end-to-end — the shape that holds at
10^12 rows because a key's history never needs to meet another key's.

``counter_agg`` — monotone-counter semantics with reset detection:
a negative delta means the counter restarted (process restart, rollover)
and the post-reset reading itself is the increase since the restart.
This is the standard Prometheus extrapolation-free ``increase``:
    adj_delta_i = v_i - v_{i-1}   if v_i >= v_{i-1}
                = v_i             otherwise (reset)
summed per wall-clock window, plus the reset count and the in-window
rate (increase / covered seconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def counter_agg(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    window_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Reset-aware counter increase / rate per (key, wall-clock window).

    Output per group: ``n_events``, ``n_resets`` (negative deltas),
    ``counter_increase`` (sum of reset-adjusted deltas for events with a
    same-key predecessor — a window's first delta reaches back across
    the boundary, so tier sums telescope), and ``rate_per_s``
    (increase / in-window covered seconds; NULL when the window has no
    span). One exchange: the lag scan partitions on ``by`` and the
    (by, window) aggregate reuses that clustering.
    """
    by = list(by or ["user_id"])
    w = Window.partitionBy(*by).orderBy(F.unix_micros(F.col(on)))
    tus = F.unix_micros(F.col(on))
    prev = F.lag(value_col).over(w)
    delta = F.col(value_col) - prev
    adj = F.when(prev.isNull(), None).otherwise(
        F.when(delta >= 0, delta).otherwise(F.col(value_col))
    )
    staged = events.select(
        *by,
        tus.alias("_tus"),
        F.floor(tus / F.lit(int(window_micros))).alias("widx"),
        adj.alias("_adj"),
        (delta < 0).cast("int").alias("_reset"),
    )
    span_s = (F.max("_tus") - F.min("_tus")).cast("double") / F.lit(1e6)
    inc = F.sum("_adj")
    return staged.groupBy(*by, "widx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(F.sum("_reset"), F.lit(0)).cast("bigint").alias("n_resets"),
        inc.alias("counter_increase"),
        F.when(span_s > 0, inc / span_s).alias("rate_per_s"),
    )
