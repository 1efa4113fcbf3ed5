"""Temporal joins Spark lacks natively: as-of join and range join.

Both are written for the 100 TB case:

``asof_join`` — the classic TSDB/kdb operation (each left row picks the
most recent right row at-or-before its timestamp, per key). The naive
formulation is a range join (O(|L|·|R|) per key, a cartesian bomb).
This implementation is the MERGE formulation instead: union the two
sides, sort by (key, ts, side-tag), and carry the right payload forward
with ``last(..., ignorenulls) ROWS UNBOUNDED PRECEDING`` — ONE shuffle
on the partition keys, linear work, no join node at all. Catalyst sees
a plain window over a union, so AQE/skew handling apply as usual.

``range_join`` — point-in-interval join. The naive inequality join
degenerates to a per-key cartesian. Bucketing turns it into an
equi-join: intervals explode to the fixed-width buckets they overlap,
points carry their single bucket, and the residual predicate filters
inside the bucket pair (the same strategy as Databricks' range-join
hints / TimescaleDB chunk exclusion). Each (point, interval) pair meets
in exactly ONE bucket — the point's — so no dedup pass is needed.
``bucket_width`` should be on the order of the typical interval length:
an interval explodes to ~len/width + 1 rows, while a too-wide bucket
inflates the candidate pairs the residual filter must discard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS = "_asof_ts"
_TAG = "_asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Each left row gains the nearest right row's ``value_cols``.

    direction='backward': latest right with right.on <= left.on (ties on
    the timestamp match — the right row sorts first). 'forward': earliest
    right with right.on >= left.on. ``tolerance_micros`` nulls the match
    when |left.on - right.on| exceeds it. Matched right columns are
    suffixed; ``on + suffix`` carries the matched right timestamp.
    One shuffle on ``by`` keys; no join node (see module docstring).
    """
    by = list(by or ["user_id"])
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    value_cols = list(value_cols or
                      [c for c in right.columns if c not in by + [on]])
    lpay = [c for c in left.columns if c not in by + [on]]

    lside = left.select(
        *by,
        F.col(on).alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.col(c).alias(f"_l_{c}") for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("_r_ts"),
    )
    rside = right.select(
        *by,
        F.col(on).alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lpay],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(on).alias("_r_ts"),
    )
    u = lside.unionByName(rside)
    # carry the matched right ROW as one atomic struct: per-column
    # last(ignorenulls) would stitch the output from DIFFERENT right
    # rows whenever a right value column is NULL (and _r_ts could
    # postdate the row that supplied a value, defeating the tolerance
    # check). The struct is NULL exactly for left rows, so
    # last(ignorenulls) implements row-level as-of — a matched row's
    # NULL field stays NULL, like merge_asof / native ASOF JOIN.
    pack = F.when(
        F.col(_TAG) == 0,
        F.struct(F.col("_r_ts").alias("_r_ts"),
                 *[F.col(f"_r_{c}").alias(f"_r_{c}") for c in value_cols]),
    )
    u = u.withColumn("_r_pack", pack)

    # backward: ascending scan, right rows (tag 0) sort before left rows
    # at the same timestamp so an equal-ts right row IS matched;
    # forward: the same scan over descending timestamps.
    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
    else:
        w = Window.partitionBy(*by).orderBy(F.col(_TS).desc(), F.col(_TAG).asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    cp = F.last("_r_pack", ignorenulls=True).over(w)
    carried = u.select(
        *by, _TS, _TAG,
        *[f"_l_{c}" for c in lpay],
        *[cp[f"_r_{c}"].alias(f"_r_{c}") for c in value_cols],
        cp["_r_ts"].alias("_r_ts"),
    ).where(F.col(_TAG) == 1)

    if tolerance_micros is not None:
        # requires `on` to be a TimestampType column
        gap = F.abs(F.unix_micros(F.col(_TS)) - F.unix_micros(F.col("_r_ts")))
        ok = F.col("_r_ts").isNotNull() & (gap <= F.lit(tolerance_micros))
        carried = carried.select(
            *by, _TS, _TAG,
            *[f"_l_{c}" for c in lpay],
            *[F.when(ok, F.col(f"_r_{c}")).alias(f"_r_{c}")
              for c in value_cols],
            F.when(ok, F.col("_r_ts")).alias("_r_ts"),
        )

    return carried.select(
        *by,
        F.col(_TS).alias(on),
        *[F.col(f"_l_{c}").alias(c) for c in lpay],
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("_r_ts").alias(f"{on}{suffix}"),
    )


def _grid(
    events: DataFrame, on: str, by: list[str], step: int,
    extra: list | None = None,
) -> DataFrame:
    """Per-key regular grid: every ``step`` micros from the first event
    rounded UP to the grid, through the last event. Keys whose whole
    span contains no grid point are dropped (F.sequence with a positive
    step RAISES when start > stop — a single sparse key must not kill
    the job; there is genuinely nothing to emit for it)."""
    bounds = events.groupBy(*by).agg(
        F.min(F.unix_micros(F.col(on))).alias("_lo"),
        F.max(F.unix_micros(F.col(on))).alias("_hi"),
    ).withColumn(
        "_g0",
        (F.floor((F.col("_lo") + F.lit(step - 1)) / F.lit(step))
         * F.lit(step)).cast("long"),
    ).where(F.col("_g0") <= F.col("_hi"))
    return bounds.select(
        *by,
        F.explode(
            F.sequence(F.col("_g0"), F.col("_hi"), F.lit(step))
        ).alias("gus"),
        *(extra or []),
    )


def resample_locf(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    step_micros: int = 15 * 60 * 1_000_000,
) -> DataFrame:
    """Resample irregular events to a regular grid with LOCF fill.

    Per key: grid points every ``step_micros`` from the first event
    (rounded up to the grid) to the last; each point carries the value
    in force at that instant (as-of backward, inclusive). Output:
    by-keys, ``gus`` (grid epoch micros), ``value`` — the asof carry.
    The grid is built with an aggregate + ``explode(sequence(...))``
    (no driver-side loop) and matched with the merge-form ``asof_join``,
    so the whole resample is one aggregate plus one window scan.
    """
    by = list(by or ["user_id"])
    step = int(step_micros)
    # NULL-valued events carry no information for the fill and would
    # desynchronize grid bounds from carried values — drop them first
    events = events.where(F.col(value_col).isNotNull())
    grid = _grid(events, on, by, step)
    # the asof scan compares like-named columns, so the event time is
    # exposed under the grid's name (both are epoch micros, BIGINT)
    ev = events.select(
        *by,
        F.unix_micros(F.col(on)).alias("gus"),
        F.col(value_col).alias("_v"),
    )
    return asof_join(
        grid, ev, on="gus", by=by, value_cols=["_v"], direction="backward",
        suffix="_m",
    ).select(*by, "gus", F.col("_v_m").alias(value_col))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_width_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Join point rows to the interval rows covering them
    (start <= point < end), per key — as a bucketed EQUI-join.
    One output row per (point, interval) match. All three timestamp
    columns must be TimestampType.
    """
    by = list(by or ["user_id"])
    wus = F.lit(int(bucket_width_micros))
    s_us = F.unix_micros(F.col(start))
    e_us = F.unix_micros(F.col(end))

    pts = points.withColumn("_bucket", F.floor(F.unix_micros(F.col(on)) / wus))
    # end is exclusive: the last covered microsecond is end-1. The
    # interval side renames its key/payload columns up front: points and
    # intervals often derive from the SAME source table (a self-join),
    # and identically-named column references would resolve ambiguously
    # (Spark warns "trivially true predicate" and may drop the key).
    iv_pay = [c for c in intervals.columns if c not in by]
    iv = (
        intervals.where(e_us > s_us)
        .withColumn(
            "_ivb",
            F.explode(F.sequence(F.floor(s_us / wus),
                                 F.floor((e_us - F.lit(1)) / wus))),
        )
        .select(
            *[F.col(k).alias(f"_iv_{k}") for k in by],
            *[F.col(c).alias(f"_iv_{c}") for c in iv_pay],
            "_ivb",
        )
    )
    cond = [pts[k] == iv[f"_iv_{k}"] for k in by] + [pts["_bucket"] == iv["_ivb"]]
    resid = (
        (F.unix_micros(F.col(f"_iv_{start}")) <= F.unix_micros(F.col(on)))
        & (F.unix_micros(F.col(on)) < F.unix_micros(F.col(f"_iv_{end}")))
    )
    return pts.join(iv, cond, "inner").where(resid).select(
        *points.columns,
        *[F.col(f"_iv_{c}").alias(c) for c in iv_pay],
    )


def resample_linear(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    step_micros: int = 15 * 60 * 1_000_000,
) -> DataFrame:
    """Resample irregular events to a regular grid with LINEAR
    interpolation between the bracketing events (the other half of the
    gap-fill contract next to ``resample_locf``).

    Per key: grid points every ``step_micros`` from the first event
    (rounded up) to the last. Each point interpolates between the
    nearest event at-or-before (v0 @ t0) and at-or-after (v1 @ t1):
        v = v0 + (v1 - v0) * (g - t0) / (t1 - t0)
    A grid point that coincides with an event returns that event's value
    exactly (t1 == t0 guard). Both brackets always exist because the
    grid is clamped inside [first, last].

    Plan: one aggregate for bounds, grid explode, then ONE union of
    grid + events with TWO window carries over the SAME hash
    partitioning — ascending for the backward bracket, descending for
    the forward one. Catalyst inserts a single Exchange; the second
    Window only re-sorts within partitions. Events are scanned twice
    (bounds + union), never three times, and there is no join node.
    Cross-engine: v0/v1/micros arithmetic is evaluated in the same IEEE
    order as the oracle's dual-ASOF formulation.
    """
    by = list(by or ["user_id"])
    step = int(step_micros)
    # NULL-valued events would set bracket timestamps without bracket
    # values (the carries skip NULL _v but ev_t would not) — drop them
    # before bounds AND brackets so the two stay consistent
    events = events.where(F.col(value_col).isNotNull())
    grid = _grid(
        events, on, by, step,
        extra=[F.lit(1).alias("_tag"), F.lit(None).cast("double").alias("_v")],
    )
    ev = events.select(
        *by,
        F.unix_micros(F.col(on)).alias("gus"),
        F.lit(0).alias("_tag"),
        F.col(value_col).cast("double").alias("_v"),
    )
    u = grid.unionByName(ev)
    # event rows (_tag 0) sort before grid rows at an equal timestamp in
    # BOTH scans, so a grid point on an event matches it inclusively
    # from either direction
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("gus").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("gus").desc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev_t = F.when(F.col("_tag") == 0, F.col("gus"))
    carried = u.select(
        *by, "gus", "_tag",
        F.last("_v", ignorenulls=True).over(wb).alias("_v0"),
        F.last(ev_t, ignorenulls=True).over(wb).alias("_t0"),
        F.last("_v", ignorenulls=True).over(wf).alias("_v1"),
        F.last(ev_t, ignorenulls=True).over(wf).alias("_t1"),
    ).where(F.col("_tag") == 1)
    g, t0, t1 = F.col("gus"), F.col("_t0"), F.col("_t1")
    v0, v1 = F.col("_v0"), F.col("_v1")
    interp = F.when(t1 == t0, v0).otherwise(
        v0 + (v1 - v0) * ((g - t0).cast("double") / (t1 - t0).cast("double"))
    )
    return carried.select(*by, "gus", interp.alias(value_col))
