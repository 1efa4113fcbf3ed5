"""EWMA / CUSUM recurrences vs independent replays + plan shape."""

import numpy as np
import pandas as pd

from pyhctsa_spark.operators.recurrence import cusum, cusum_kernel, ewma


def _events(rng, n_keys=5, n=400):
    return pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "tus": np.sort(rng.choice(10**12, n, replace=False)),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })


def test_ewma_matches_pandas_ewm(spark):
    # pandas ewm(adjust=False) implements the identical recurrence —
    # an independent implementation, not a replay of our kernel
    rng = np.random.default_rng(7)
    ev = _events(rng)
    got = (
        ewma(spark.createDataFrame(ev), on="tus", by=["user_id"],
             value_col="value", alpha=0.25)
        .toPandas().sort_values(["user_id", "tus"]).reset_index(drop=True)
    )
    frames = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        g["ewma_want"] = g.value.ewm(alpha=0.25, adjust=False).mean()
        frames.append(g)
    want = (pd.concat(frames).sort_values(["user_id", "tus"])
            .reset_index(drop=True))
    assert len(got) == len(want)
    assert np.allclose(got.ewma.values, want.ewma_want.values, rtol=1e-12)


def test_ewma_carry_across_arrow_batches(spark):
    rng = np.random.default_rng(13)
    ev = _events(rng, n_keys=3, n=200).sort_values("user_id")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        got = (
            ewma(spark.createDataFrame(ev).coalesce(1), on="tus",
                 by=["user_id"], value_col="value", alpha=0.5)
            .toPandas().sort_values(["user_id", "tus"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set(key, old)
    frames = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        g["w"] = g.value.ewm(alpha=0.5, adjust=False).mean()
        frames.append(g)
    want = (pd.concat(frames).sort_values(["user_id", "tus"])
            .reset_index(drop=True))
    assert len(got) == len(ev)
    assert np.allclose(got.ewma.values, want.w.values, rtol=1e-12)


def test_cusum_kernel_flags_injected_shift():
    rng = np.random.default_rng(3)
    # in-control around the target: no alarms
    v = rng.normal(10.0, 0.5, 500)
    hi, lo, n_hi, n_lo, first = cusum_kernel(v, 10.0, 1.0, 25.0)
    assert n_hi == 0 and n_lo == 0 and first == -1
    # upward shift of +3 sigma-equivalents from index 300: hi alarms,
    # and the first alarm lands after the shift
    v2 = v.copy()
    v2[300:] += 3.0
    _, _, n_hi2, n_lo2, first2 = cusum_kernel(v2, 10.0, 1.0, 25.0)
    assert n_hi2 > 0 and n_lo2 == 0 and first2 >= 300


def test_cusum_df_matches_kernel(spark):
    rng = np.random.default_rng(17)
    ev = _events(rng, n_keys=4, n=300)
    got = (
        cusum(spark.createDataFrame(ev), on="tus", by=["user_id"],
              value_col="value", target=50.0, k=5.0, h=40.0)
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        hi, lo, n_hi, n_lo, first = cusum_kernel(
            g.value.to_numpy(np.float64), 50.0, 5.0, 40.0)
        rows.append({
            "user_id": uid, "n": len(g), "cusum_hi": hi, "cusum_lo": lo,
            "n_alarm_hi": n_hi, "n_alarm_lo": n_lo,
            "first_alarm_t": g.tus.iloc[first] if first >= 0 else None,
        })
    want = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    for c in ("n", "n_alarm_hi", "n_alarm_lo"):
        assert (got[c].values == want[c].values).all(), c
    assert np.allclose(got.cusum_hi.values, want.cusum_hi.values)
    assert np.allclose(got.cusum_lo.values, want.cusum_lo.values)
    assert got.first_alarm_t.equals(
        want.first_alarm_t.astype(got.first_alarm_t.dtype))


def test_recurrence_single_exchange(spark):
    rng = np.random.default_rng(1)
    sdf = spark.createDataFrame(_events(rng))
    for out in (
        ewma(sdf, on="tus", by=["user_id"], value_col="value"),
        cusum(sdf, on="tus", by=["user_id"], value_col="value"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


def test_holt_tracks_linear_ramp(spark):
    from pyhctsa_spark.operators.recurrence import holt

    # a pure linear ramp: Holt's trend converges to the per-step slope
    # and the level tracks the series (an analytic property check, not a
    # kernel replay)
    n = 300
    ev = pd.DataFrame({
        "user_id": np.ones(n, dtype=np.int64),
        "tus": np.arange(n, dtype=np.int64) * 1_000_000,
        "value": 5.0 + 0.5 * np.arange(n),
    })
    got = (
        holt(spark.createDataFrame(ev), on="tus", by=["user_id"],
             value_col="value", alpha=0.5, beta=0.25)
        .toPandas().sort_values("tus").reset_index(drop=True)
    )
    assert abs(got.trend.iloc[-1] - 0.5) < 1e-6
    assert abs(got.level.iloc[-1] - got.value.iloc[-1]) < 1e-3


def test_holt_matches_independent_replay(spark):
    from pyhctsa_spark.operators.recurrence import holt

    rng = np.random.default_rng(23)
    ev = _events(rng, n_keys=4, n=300)
    got = (
        holt(spark.createDataFrame(ev), on="tus", by=["user_id"],
             value_col="value", alpha=0.5, beta=0.25)
        .toPandas().sort_values(["user_id", "tus"]).reset_index(drop=True)
    )
    frames = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        v = g.value.to_numpy(np.float64)
        lvl, trd = np.empty(len(v)), np.empty(len(v))
        l, b = v[0], 0.0
        lvl[0], trd[0] = l, b
        for i in range(1, len(v)):
            # algebraically regrouped vs the kernel's form
            ln = (v[i] + l + b) / 2.0
            b = (ln - l) / 4.0 + 3.0 * b / 4.0
            l = ln
            lvl[i], trd[i] = l, b
        g["lw"], g["tw"] = lvl, trd
        frames.append(g)
    want = (pd.concat(frames).sort_values(["user_id", "tus"])
            .reset_index(drop=True))
    assert np.allclose(got.level.values, want.lw.values, rtol=1e-12)
    assert np.allclose(got.trend.values, want.tw.values, rtol=1e-10)
