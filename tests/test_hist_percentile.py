"""Histogram percentiles: merge == partial-of-union, numpy brute-force
agreement, edge clamping, plan shape."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyhctsa_spark.operators.hist_percentile import (
    hist_merge,
    hist_partial,
    hist_percentiles,
)

WIN = 30 * 60 * 1_000_000
LO, HI, NB = 0.0, 100.0, 50


def _events(spark, n=3000):
    return spark.range(n).select(
        "id",
        (F.col("id") % 4).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 913_789_123
        ).alias("ts"),
        ((F.sin(F.col("id") / 7.0) + 1) * 40
         + (F.col("id") % 23).cast("double")).alias("value"),
    )


def test_merge_equals_partial_of_union(spark):
    ev = _events(spark)
    full = hist_partial(ev, LO, HI, NB, window_micros=WIN)
    a = hist_partial(ev.where("id % 2 = 0"), LO, HI, NB, window_micros=WIN)
    b = hist_partial(ev.where("id % 2 = 1"), LO, HI, NB, window_micros=WIN)
    merged = hist_merge(a.unionByName(b))
    key = ["user_id", "widx", "bin"]
    pd.testing.assert_frame_equal(
        full.orderBy(*key).toPandas(),
        merged.orderBy(*key).toPandas(),
    )


def test_percentiles_match_numpy_brute_force(spark):
    ev = _events(spark)
    got = hist_percentiles(
        hist_partial(ev, LO, HI, NB, window_micros=WIN),
        LO, HI, NB, qs=(0.5, 0.9),
    ).toPandas().set_index(["user_id", "widx"]).sort_index()
    pdf = ev.toPandas()
    pdf["widx"] = (
        pdf.ts.astype("int64") // 1000
    ) // WIN  # ns -> us -> window
    width = (HI - LO) / NB
    for (u, w), grp in pdf.groupby(["user_id", "widx"]):
        v = grp.value.to_numpy()
        bins = np.clip(((v - LO) / width).astype(int), 0, NB - 1)
        cnts = np.bincount(bins, minlength=NB)
        cum = np.cumsum(cnts)
        n = len(v)
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            t = q * (n - 1) + 1
            b = int(np.searchsorted(cum, t))
            cb = cum[b - 1] if b else 0
            want = LO + width * (b + (t - cb) / cnts[b])
            assert abs(got.loc[(u, w), col] - want) < 1e-9, (u, w, col)
            # the estimate is within half a bin of the true quantile
            # only when mass is spread; always within ONE bin width of
            # an actual in-range sample quantile
            true_q = np.quantile(v, q)
            assert abs(got.loc[(u, w), col] - true_q) <= width + 1e-9


def test_outliers_clamp_to_edge_bins(spark):
    ev = _events(spark).withColumn(
        "value",
        F.when(F.col("id") % 100 == 0, F.lit(1e9)).otherwise(F.col("value")),
    )
    st = hist_partial(ev, LO, HI, NB, window_micros=WIN)
    assert st.agg(F.max("bin")).first()[0] == NB - 1
    assert st.agg(F.min("bin")).first()[0] >= 0
    # percentiles stay finite and inside [LO, HI]
    p = hist_percentiles(st, LO, HI, NB, qs=(0.99,))
    mx = p.agg(F.max("p99")).first()[0]
    assert LO <= mx <= HI + 1e-9


def test_partial_plan_is_single_hash_aggregate(spark):
    plan = (
        hist_partial(_events(spark), LO, HI, NB, window_micros=WIN)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_hist_states_through_snapshot_store(spark, tmp_path):
    """The snapshot store is aggregate-agnostic: plug the histogram
    partial/merge pair in and the exactly-once materialize/refresh
    lifecycle serves percentiles — refresh == full recompute."""
    import pandas as pd

    from pyhctsa_spark.operators.cagg import CaggSnapshotStore

    def pf(ev, on, by, vc, wm):
        return hist_partial(ev, LO, HI, NB, on=on, by=by,
                            value_col=vc, window_micros=wm)

    store = CaggSnapshotStore(
        str(tmp_path / "hsnap"), window_micros=WIN, chunk_windows=16,
        partial_fn=pf, merge_fn=hist_merge,
    )
    ev = _events(spark)
    store.materialize(ev.where("id % 3 != 0"))
    info = store.refresh(spark, ev.where("id % 3 = 0"), batch_id=0)
    assert info["delta_states"] > 0
    got = hist_percentiles(
        store.read(spark).drop("chunk"), LO, HI, NB, qs=(0.5, 0.9)
    )
    want = hist_percentiles(
        hist_partial(ev, LO, HI, NB, window_micros=WIN),
        LO, HI, NB, qs=(0.5, 0.9),
    )
    key = ["user_id", "widx"]
    pd.testing.assert_frame_equal(
        got.orderBy(*key).toPandas(), want.orderBy(*key).toPandas()
    )
