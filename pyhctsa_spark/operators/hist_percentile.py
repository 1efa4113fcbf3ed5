"""Mergeable histogram percentiles for continuous values.

The continuous-value analogue of ``quantile_rollup`` (whose token
histograms are EXACT because the domain is integer): for doubles, every
TSDB ships a mergeable sketch (TimescaleDB percentile_agg/uddsketch,
Druid/Spark native t-digests). Those sketches are randomized or
implementation-defined, which breaks cross-engine value oracles — so
this operator uses the deterministic fixed-bin variant: an equi-width
histogram over a declared [lo, hi) with edge-clamped outliers.

- ``hist_partial``: one (by, widx, bin, cnt) row per occupied bin —
  RELATIONAL states (no array columns), so merging is a plain additive
  groupBy and every expression is a JVM built-in with map-side combine.
  State per window is bounded by nbins regardless of event count.
- ``hist_merge``: sum counts by (by, widx, bin). merge == partial of
  the union, trivially (addition).
- ``hist_percentiles``: per (by, widx) estimates at the requested
  quantiles via the standard in-bin linear interpolation: with
  continuous rank t = q*(n-1)+1, the estimate inside the first bin
  whose cumulative count reaches t is
  ``lo + width*(bin + (t - cum_before)/cnt)``. Deterministic double
  arithmetic in a fixed order — the DuckDB oracle replays the identical
  expression, so results hash-match (unlike approx_percentile /
  percentile_cont whose algorithms differ per engine).

Accuracy is the usual histogram tradeoff: error <= width/2 per
estimate; callers pick [lo, hi, nbins] from domain knowledge (the
declared-range contract every fixed-size sketch makes). Outliers clamp
into the edge bins and widen only the edge estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hist_partial(
    events: DataFrame,
    lo: float,
    hi: float,
    nbins: int = 64,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    window_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """(by, widx, bin, cnt) occupied-bin counts. One hash-aggregate."""
    by = list(by or ["user_id"])
    width = (float(hi) - float(lo)) / int(nbins)
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(int(nbins) - 1))
    tus = F.unix_micros(F.col(on))
    return (
        events.select(
            *by,
            F.floor(tus / F.lit(int(window_micros))).alias("widx"),
            b.cast("int").alias("bin"),
        )
        .groupBy(*by, "widx", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(states: DataFrame, by: list[str] | None = None) -> DataFrame:
    by = list(by or ["user_id"])
    return states.groupBy(*by, "widx", "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def hist_percentiles(
    states: DataFrame,
    lo: float,
    hi: float,
    nbins: int = 64,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    by: list[str] | None = None,
) -> DataFrame:
    """Per (by, widx): n plus one p<q> column per requested quantile.

    Two window scans over the bin rows (cumulative count + total),
    then a conditional-aggregate pivot — no joins, no explode."""
    by = list(by or ["user_id"])
    width = (float(hi) - float(lo)) / int(nbins)
    w = Window.partitionBy(*by, "widx").orderBy("bin")
    wall = Window.partitionBy(*by, "widx")
    cum = (
        states.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wall))
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        # continuous rank t in [1, n]; the estimate lives in the first
        # bin whose cumulative count reaches t
        t = F.lit(float(q)) * (F.col("n") - 1) + 1
        est = (
            F.lit(float(lo))
            + F.lit(width)
            * (F.col("bin") + (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
        )
        hit = F.when(
            (F.col("cum") >= t) & ((F.col("cum") - F.col("cnt")) < t), est
        )
        label = f"p{int(round(q * 100))}"  # q resolution: 0.01
        aggs.append(F.min(hit).alias(label))
    return cum.groupBy(*by, "widx").agg(*aggs)
