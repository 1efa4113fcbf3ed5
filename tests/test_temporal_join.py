"""As-of join (union+window merge formulation) vs pandas.merge_asof,
range join (bucketed equi-join) vs brute force, and plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.temporal_join import (
    asof_join,
    range_join,
    resample_locf,
)


def _mk(rng, n_keys=4, n_left=300, n_right=60):
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(
            np.sort(rng.integers(0, 10**9, n_left)), unit="us"),
        "lv": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n_right),
        "ts": base + pd.to_timedelta(
            np.sort(rng.integers(0, 10**9, n_right)), unit="us"),
        "rv": rng.normal(size=n_right).round(3),
    })
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    rng = np.random.default_rng(23)
    left, right = _mk(rng)
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="ts", by=["user_id"], value_cols=["rv"], direction=direction,
        )
        .toPandas().sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction=direction, suffixes=("", "_m"),
    ).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["rv_matched"], want["rv"].rename("rv_matched"),
        check_exact=True,
    )


def test_asof_tolerance(spark):
    rng = np.random.default_rng(29)
    left, right = _mk(rng)
    tol = 50_000_000  # 50 s
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="ts", by=["user_id"], value_cols=["rv"],
            tolerance_micros=tol,
        )
        .toPandas().sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        tolerance=pd.Timedelta(microseconds=tol), suffixes=("", "_m"),
    ).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["rv_matched"], want["rv"].rename("rv_matched"), check_exact=True,
    )


def test_asof_equal_ts_matches_inclusively(spark):
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({"user_id": [1], "ts": [base], "lv": [1.0]})
    right = pd.DataFrame({"user_id": [1], "ts": [base], "rv": [9.0]})
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["user_id"], value_cols=["rv"],
    ).collect()
    assert got[0].rv_matched == 9.0


def test_asof_plan_single_exchange_no_join(spark):
    rng = np.random.default_rng(31)
    left, right = _mk(rng)
    df = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["user_id"], value_cols=["rv"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # merge formulation: window over a union
    assert plan.count("Exchange hashpartitioning") == 1


def test_resample_locf_matches_pandas(spark):
    rng = np.random.default_rng(43)
    events, _ = _mk(rng, n_keys=3, n_left=120)
    step = 60_000_000  # 1-min grid
    got = (
        resample_locf(
            spark.createDataFrame(events), on="ts", by=["user_id"],
            value_col="lv", step_micros=step,
        )
        .toPandas().sort_values(["user_id", "gus"]).reset_index(drop=True)
    )
    frames = []
    for uid, g in events.groupby("user_id"):
        g = g.sort_values("ts")
        lo = int(g.ts.astype("int64").min() // 1000)  # ns -> us
        hi = int(g.ts.astype("int64").max() // 1000)
        gus = np.arange(-(-lo // step) * step, hi + 1, step)
        grid = pd.DataFrame({
            "user_id": uid,
            "gus": gus,
            "ts": pd.to_datetime(gus, unit="us"),
        })
        m = pd.merge_asof(grid, g[["ts", "lv"]], on="ts",
                          direction="backward")
        frames.append(m[["user_id", "gus", "lv"]])
    want = (
        pd.concat(frames).sort_values(["user_id", "gus"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got.gus.values == want.gus.values).all()
    assert (got.lv.values == want.lv.values).all()  # LOCF never null here


def test_resample_locf_grid_point_on_event_is_inclusive(spark):
    base = pd.Timestamp("2024-01-01")  # exactly on the minute grid
    events = pd.DataFrame({
        "user_id": [1, 1],
        "ts": [base, base + pd.Timedelta(seconds=90)],
        "lv": [5.0, 7.0],
    })
    got = (
        resample_locf(spark.createDataFrame(events), value_col="lv",
                      step_micros=60_000_000)
        .toPandas().sort_values("gus")
    )
    # grid minutes 0 and 1; minute 0 coincides with the first event and
    # must carry ITS value (inclusive as-of), minute 1 carries it forward
    assert got.lv.tolist() == [5.0, 5.0]


def test_range_join_matches_brute(spark):
    rng = np.random.default_rng(37)
    left, right = _mk(rng, n_left=200, n_right=30)
    width = 120_000_000  # 2 min intervals
    right = right.assign(
        start_ts=right["ts"],
        end_ts=right["ts"] + pd.Timedelta(microseconds=width),
    ).drop(columns=["ts"])
    got = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["user_id"], start="start_ts", end="end_ts",
        bucket_width_micros=60_000_000,
    ).toPandas()
    brute = []
    for _, p in left.iterrows():
        for _, iv in right.iterrows():
            if (p.user_id == iv.user_id and iv.start_ts <= p.ts < iv.end_ts):
                brute.append((p.user_id, p.ts, p.lv, iv.start_ts))
    want = sorted(brute)
    gotl = sorted(zip(got.user_id, got.ts, got.lv, got.start_ts))
    assert gotl == want
    assert len(want) > 0


def test_range_join_interval_spanning_many_buckets(spark):
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [base + pd.Timedelta(minutes=m) for m in (0, 59, 61)],
        "lv": [1.0, 2.0, 3.0],
    })
    right = pd.DataFrame({
        "user_id": [1],
        "start_ts": [base],
        "end_ts": [base + pd.Timedelta(minutes=60)],
        "tag": ["iv0"],
    })
    got = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        bucket_width_micros=60_000_000,  # 1-min buckets, 60-bucket span
    ).toPandas()
    # end exclusive: minutes 0 and 59 covered, 61 not; each match ONCE
    assert sorted(got.lv.tolist()) == [1.0, 2.0]


def test_range_join_is_equi_join_not_nested_loop(spark):
    rng = np.random.default_rng(41)
    left, right = _mk(rng, n_left=50, n_right=10)
    right = right.assign(
        start_ts=right["ts"],
        end_ts=right["ts"] + pd.Timedelta(minutes=2),
    ).drop(columns=["ts"])
    df = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        bucket_width_micros=60_000_000,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucketing turns the range predicate into an equi-join; a
    # NestedLoop/cartesian here means the rewrite regressed
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_resample_linear_matches_numpy_interp(spark):
    from pyhctsa_spark.operators.temporal_join import resample_linear

    rng = np.random.default_rng(47)
    events, _ = _mk(rng, n_keys=3, n_left=120)
    step = 60_000_000
    got = (
        resample_linear(
            spark.createDataFrame(events), on="ts", by=["user_id"],
            value_col="lv", step_micros=step,
        )
        .toPandas().sort_values(["user_id", "gus"]).reset_index(drop=True)
    )
    frames = []
    for uid, g in events.groupby("user_id"):
        # np.interp is an independent implementation of the same spec;
        # duplicate-ts rows: keep the pair-sorted last so interp's choice
        # matches the asof inclusive contract only when ts is tie-free,
        # which _mk guarantees per user with overwhelming probability
        g = g.sort_values("ts")
        t = g.ts.astype("int64").to_numpy() // 1000
        v = g.lv.to_numpy(np.float64)
        gus = np.arange(-(-t[0] // step) * step, t[-1] + 1, step)
        frames.append(pd.DataFrame({
            "user_id": uid, "gus": gus,
            "want": np.interp(gus, t, v),
        }))
    want = (pd.concat(frames).sort_values(["user_id", "gus"])
            .reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got.gus.values == want.gus.values).all()
    assert np.allclose(got.lv.values, want.want.values, rtol=1e-12)


def test_resample_linear_exact_on_event(spark):
    from pyhctsa_spark.operators.temporal_join import resample_linear

    base = pd.Timestamp("2024-01-01")  # on the minute grid
    ev = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [base, base + pd.Timedelta(seconds=90),
               base + pd.Timedelta(seconds=120)],
        "lv": [2.0, 8.0, 4.0],
    })
    got = (
        resample_linear(spark.createDataFrame(ev), on="ts", by=["user_id"],
                        value_col="lv", step_micros=60_000_000)
        .toPandas().sort_values("gus").reset_index(drop=True)
    )
    # grid: 0s (on event -> exact), 60s (midway 0..90 -> 2 + 6*(60/90)),
    # 120s (on event -> exact)
    assert len(got) == 3
    assert got.lv.iloc[0] == 2.0
    assert abs(got.lv.iloc[1] - (2.0 + 6.0 * (60.0 / 90.0))) < 1e-12
    assert got.lv.iloc[2] == 4.0


def test_resample_linear_plan_shape(spark):
    # one union + TWO window carries over the SAME partitioning: exactly
    # 2 exchanges (bounds agg + union window) and 2 event scans, no join
    from pyhctsa_spark.operators.temporal_join import resample_linear

    rng = np.random.default_rng(2)
    events, _ = _mk(rng, n_keys=3, n_left=60)
    out = resample_linear(spark.createDataFrame(events), on="ts",
                          by=["user_id"], value_col="lv")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


# --- round-4c review regressions --------------------------------------------

def test_resample_sparse_key_does_not_crash(spark):
    """A key whose whole span contains no grid point must be dropped,
    not raise 'Illegal sequence boundaries' (found by review)."""
    from pyhctsa_spark.operators.temporal_join import (
        resample_linear,
        resample_locf,
    )

    ev = spark.createDataFrame(
        [(1, 100_000_000, 5.0),            # single event, off-grid
         (2, 900_000_000, 1.0), (2, 2_700_000_000, 3.0)],
        "user_id long, tus long, value double",
    ).select("user_id", F.timestamp_micros("tus").alias("ts"), "value")
    step = 900_000_000  # 15 min
    locf = resample_locf(ev, step_micros=step).orderBy("user_id", "gus")
    lin = resample_linear(ev, step_micros=step).orderBy("user_id", "gus")
    assert [r["user_id"] for r in locf.collect()] == [2, 2, 2]
    rows = lin.collect()
    assert [r["user_id"] for r in rows] == [2, 2, 2]
    assert [round(r["value"], 6) for r in rows] == [1.0, 2.0, 3.0]


def test_resample_linear_ignores_null_valued_events(spark):
    """A NULL-valued event must not desynchronize bracket timestamps
    from bracket values (found by review: ev_t tagged every event)."""
    from pyhctsa_spark.operators.temporal_join import resample_linear

    ev = spark.createDataFrame(
        [(1, 0, 10.0), (1, 100, None), (1, 200, 20.0)],
        "user_id long, tus long, value double",
    ).select("user_id", F.timestamp_micros("tus").alias("ts"), "value")
    out = resample_linear(ev, step_micros=150).orderBy("gus").collect()
    # grid point 150: brackets are (0, 10) and (200, 20) -> 17.5, NOT
    # the desynchronized 10 + 10*(150-100)/(200-100) = 15
    got = {r["gus"]: r["value"] for r in out}
    assert abs(got[150] - 17.5) < 1e-12


def test_asof_join_null_right_values_stay_null(spark):
    """The matched right ROW is atomic: a NULL field of the matched row
    is emitted as NULL (not backfilled from an older row), and the
    tolerance check uses the matched row's own timestamp."""
    from pyhctsa_spark.operators.temporal_join import asof_join

    right = spark.createDataFrame(
        [(1, 0, 5.0), (1, 100_000_000, None)],
        "user_id long, tus long, v double",
    ).select("user_id", F.timestamp_micros("tus").alias("ts"), "v")
    left = spark.createDataFrame(
        [(1, 101_000_000)], "user_id long, tus long"
    ).select("user_id", F.timestamp_micros("tus").alias("ts"))
    out = asof_join(left, right, on="ts", by=["user_id"],
                    value_cols=["v"], tolerance_micros=10_000_000).collect()
    assert len(out) == 1
    # matched row is t=100s (within 1s tolerance) whose v is NULL —
    # NOT the 101-second-stale v=5 from t=0
    assert out[0]["v_matched"] is None
    assert out[0]["ts_matched"] is not None


def test_asof_multiple_value_cols_come_from_one_row(spark):
    from pyhctsa_spark.operators.temporal_join import asof_join

    right = spark.createDataFrame(
        [(1, 0, 5.0, None), (1, 100, None, 7.0)],
        "user_id long, tus long, a double, b double",
    ).select("user_id", F.timestamp_micros("tus").alias("ts"), "a", "b")
    left = spark.createDataFrame(
        [(1, 200)], "user_id long, tus long"
    ).select("user_id", F.timestamp_micros("tus").alias("ts"))
    out = asof_join(left, right, on="ts", by=["user_id"],
                    value_cols=["a", "b"]).collect()[0]
    # matched row = t=100 -> (a NULL, b 7.0); per-column carries would
    # have stitched (a 5.0, b 7.0) from two different rows
    assert out["a_matched"] is None and out["b_matched"] == 7.0
