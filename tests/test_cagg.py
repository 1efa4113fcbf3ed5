"""Incremental continuous aggregates: merge algebra, refresh == full
recompute, late-data handling, and partition-pruned refresh plans."""

import pandas as pd
from pyspark.sql import functions as F

from pyhctsa_spark.operators.cagg import (
    cagg_finalize,
    cagg_materialize,
    cagg_merge,
    cagg_partial,
    cagg_read,
    cagg_refresh,
)

WIN = 30 * 60 * 1_000_000  # 30 min


def _events(spark, n=4000, seed_shift=0):
    # deterministic irregular stream: 8 users, ~28 days, value walks
    return spark.range(n).select(
        "id",
        (F.col("id") % 8).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000)
             + (F.col("id") + seed_shift) * 613_789_123
             + (F.col("id") * 37 % 101) * 1_000_003)
        ).alias("ts"),
        (F.sin(F.col("id") / 17.0) * 10
         + (F.col("id") % 13).cast("double")).alias("value"),
    )


def _sorted_pd(df):
    return (
        df.toPandas()
        .sort_values(["user_id", "widx"])
        .reset_index(drop=True)
        .round(9)
    )


def test_merge_of_split_equals_partial_of_union(spark):
    ev = _events(spark)
    full = cagg_partial(ev, window_micros=WIN)
    a = cagg_partial(ev.where("id % 3 != 0"), window_micros=WIN)
    b = cagg_partial(ev.where("id % 3 = 0"), window_micros=WIN)
    merged = cagg_merge(a.unionByName(b))
    pd.testing.assert_frame_equal(_sorted_pd(full), _sorted_pd(merged))


def test_refresh_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "cagg")
    ev = _events(spark)
    base = ev.where("id % 5 != 4")
    delta = ev.where("id % 5 = 4")  # interleaved in time = late data
    cagg_materialize(base, path, window_micros=WIN, chunk_windows=16)
    info = cagg_refresh(
        spark, path, delta, window_micros=WIN, chunk_windows=16
    )
    assert info["delta_states"] > 0
    assert len(info["touched_chunks"]) > 0
    got = cagg_finalize(cagg_read(spark, path).drop("chunk"))
    want = cagg_finalize(cagg_partial(ev, window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))


def test_refresh_late_rows_into_old_windows_only(spark, tmp_path):
    path = str(tmp_path / "cagg")
    ev = _events(spark)
    # delta = strictly the OLDEST 5% of events (deep late arrivals)
    cut = ev.agg(F.expr("percentile(unix_micros(ts), 0.05)")).first()[0]
    base = ev.where(F.unix_micros("ts") > cut)
    delta = ev.where(F.unix_micros("ts") <= cut)
    cagg_materialize(base, path, window_micros=WIN, chunk_windows=16)

    def _files(root):
        import os

        out = {}
        for dp, _dn, fn in os.walk(root):
            for f in fn:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    out[p] = os.path.getsize(p)
        return out

    before_files = _files(path)
    all_chunks = {
        r["chunk"] for r in cagg_read(spark, path).select("chunk").distinct().collect()
    }
    info = cagg_refresh(spark, path, delta, window_micros=WIN, chunk_windows=16)
    # late data stays in the early chunks (some brand-new, created by
    # the refresh); the store's newer chunks are never touched
    assert max(info["touched_chunks"]) < max(all_chunks)
    after_files = _files(path)
    untouched = {
        p: s
        for p, s in before_files.items()
        if not any(f"chunk={c}/" in p for c in info["touched_chunks"])
    }
    # every untouched chunk's data files survive byte-for-byte (same
    # paths, same sizes): dynamic overwrite rewrote only touched chunks
    assert untouched
    assert all(after_files.get(p) == s for p, s in untouched.items())
    got = cagg_finalize(cagg_read(spark, path).drop("chunk"))
    want = cagg_finalize(cagg_partial(ev, window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))


def test_refresh_scan_is_partition_pruned(spark, tmp_path):
    """The store-side read during refresh must prune to touched chunks:
    reproduce the refresh's read and assert the partition filter."""
    path = str(tmp_path / "cagg")
    ev = _events(spark)
    cagg_materialize(ev, path, window_micros=WIN, chunk_windows=16)
    pruned = cagg_read(spark, path).where(F.col("chunk").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters:")[1][:200]
    assert "chunk" in seg


def test_empty_delta_is_noop(spark, tmp_path):
    path = str(tmp_path / "cagg")
    ev = _events(spark)
    cagg_materialize(ev, path, window_micros=WIN, chunk_windows=16)
    before = _sorted_pd(cagg_finalize(cagg_read(spark, path).drop("chunk")))
    info = cagg_refresh(
        spark, path, ev.where("id < 0"), window_micros=WIN, chunk_windows=16
    )
    assert info == {"touched_chunks": [], "delta_states": 0}
    after = _sorted_pd(cagg_finalize(cagg_read(spark, path).drop("chunk")))
    pd.testing.assert_frame_equal(before, after)


def test_partial_is_single_aggregate_plan(spark):
    plan = (
        cagg_partial(_events(spark), window_micros=WIN)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the (key, widx) aggregate; no window functions.
    # (struct-typed min/max pushes the aggregate to SortAggregate —
    # partial aggregation still combines map-side, the exchange carries
    # pre-combined states; the in-partition sorts are local.)
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    assert "partial_" in plan  # map-side combine present


def test_realtime_view_equals_full_recompute(spark, tmp_path):
    """Materialize history up to a watermark window; feed the raw tail
    (plus irrelevant old raw rows that must be ignored) to the realtime
    view — result equals a full recompute over everything."""
    from pyhctsa_spark.operators.cagg import cagg_realtime

    path = str(tmp_path / "cagg")
    ev = _events(spark)
    wm_ts = ev.agg(F.expr("percentile(unix_micros(ts), 0.8)")).first()[0]
    wm_widx = int(wm_ts // WIN)
    hist = ev.where(
        F.floor(F.unix_micros("ts") / F.lit(WIN)) <= wm_widx
    )
    cagg_materialize(hist, path, window_micros=WIN, chunk_windows=16)
    got = cagg_realtime(
        spark, path, ev, wm_widx, window_micros=WIN, chunk_windows=16
    )
    want = cagg_finalize(cagg_partial(ev, window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))
    # the history side of the view prunes its store scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
