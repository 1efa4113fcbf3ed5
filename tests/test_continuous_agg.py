"""counter_agg vs a per-row pandas replay, reset semantics, plan shape."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyhctsa_spark.operators.continuous_agg import counter_agg

WIN = 30 * 60 * 1_000_000


def _events(rng, n_keys=4, n=400):
    base = pd.Timestamp("2024-01-01")
    # sawtooth-ish counters: mostly increasing with occasional resets
    vals = np.cumsum(rng.exponential(2.0, n)).round(3)
    resets = rng.random(n) < 0.08
    vals = np.where(resets, rng.exponential(1.0, n).round(3), vals)
    return pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "ts": base + pd.to_timedelta(
            np.sort(rng.integers(0, 4 * 10**9, n)), unit="us"),
        "value": vals,
    })


def _brute(events):
    rows = []
    for uid, g in events.groupby("user_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        tus = g.ts.astype("int64") // 1000
        prev = g.value.shift(1)
        delta = g.value - prev
        adj = np.where(delta >= 0, delta, g.value)
        adj = np.where(prev.isna(), np.nan, adj)
        widx = tus // WIN
        for w, idx in pd.Series(range(len(g))).groupby(widx.values):
            sel = idx.values
            a = adj[sel]
            has = ~np.isnan(a)
            inc = a[has].sum() if has.any() else None
            span = (tus.iloc[sel].max() - tus.iloc[sel].min()) / 1e6
            rows.append({
                "user_id": uid, "widx": int(w), "n_events": len(sel),
                "n_resets": int((delta.iloc[sel] < 0).sum()),
                "counter_increase": inc,
                "rate_per_s": (inc / span)
                if (inc is not None and span > 0) else None,
            })
    return (pd.DataFrame(rows).sort_values(["user_id", "widx"])
            .reset_index(drop=True))


def test_counter_agg_matches_brute(spark):
    events = _events(np.random.default_rng(47))
    got = (
        counter_agg(spark.createDataFrame(events), window_micros=WIN)
        .toPandas().sort_values(["user_id", "widx"]).reset_index(drop=True)
    )
    want = _brute(events)
    assert len(got) == len(want) > 0
    assert (got.n_events.values == want.n_events.values).all()
    assert (got.n_resets.values == want.n_resets.values).all()
    np.testing.assert_allclose(
        got.counter_increase.astype(float), want.counter_increase.astype(float),
        rtol=1e-12, equal_nan=True,
    )
    np.testing.assert_allclose(
        got.rate_per_s.astype(float), want.rate_per_s.astype(float),
        rtol=1e-12, equal_nan=True,
    )


def test_counter_agg_reset_is_post_reset_value(spark):
    base = pd.Timestamp("2024-01-01")
    events = pd.DataFrame({
        "user_id": [1] * 4,
        "ts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 10, 15)],
        "value": [10.0, 14.0, 2.0, 5.0],  # reset at the third reading
    })
    row = counter_agg(spark.createDataFrame(events)).collect()[0]
    # increases: 4 (14-10), 2 (post-reset reading), 3 (5-2)
    assert row.n_resets == 1 and abs(row.counter_increase - 9.0) < 1e-12


def test_counter_agg_single_exchange(spark):
    events = _events(np.random.default_rng(53), n=100)
    df = counter_agg(spark.createDataFrame(events))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # HashPartitioning(user_id) from the lag scan must satisfy the
    # (user_id, widx) aggregate — a second exchange means it regressed
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- ohlc_agg
def test_ohlc_matches_brute(spark):
    from pyhctsa_spark.operators.continuous_agg import ohlc_agg

    rng = np.random.default_rng(11)
    ev = _events(rng, n_keys=5, n=600)
    got = (
        ohlc_agg(spark.createDataFrame(ev), on="ts", by=["user_id"],
                 value_col="value", window_micros=WIN)
        .toPandas().sort_values(["user_id", "widx"]).reset_index(drop=True)
    )
    rows = []
    for (uid, w), g in ev.assign(
        tus=ev.ts.astype("int64") // 1000
    ).assign(widx=lambda d: d.tus // WIN).groupby(["user_id", "widx"]):
        g = g.sort_values(["tus", "value"]).reset_index(drop=True)
        hi = g.value.max()
        lo = g.value.min()
        rows.append({
            "user_id": uid, "widx": w, "n_events": len(g),
            "open": g.value.iloc[0],
            "close": g.sort_values(["tus", "value"]).value.iloc[-1],
            "high": hi, "low": lo,
            "t_high": int(g[g.value == hi].tus.min()),
            "t_low": int(g[g.value == lo].tus.min()),
        })
    want = pd.DataFrame(rows).sort_values(
        ["user_id", "widx"]).reset_index(drop=True)
    for c in ("n_events", "open", "close", "high", "low", "t_high", "t_low"):
        assert (got[c].values == want[c].values).all(), c


def test_ohlc_tie_rules(spark):
    # two rows at the SAME timestamp: open takes the smaller value,
    # close the larger; duplicated extreme value: t_high/t_low take the
    # EARLIEST timestamp attaining it
    from pyhctsa_spark.operators.continuous_agg import ohlc_agg

    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "ts": [base, base, base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(minutes=9)],
        "value": [5.0, 2.0, 9.0, 9.0],
    })
    row = (
        ohlc_agg(spark.createDataFrame(ev), on="ts", by=["user_id"],
                 value_col="value", window_micros=WIN)
        .toPandas().iloc[0]
    )
    t0 = base.value // 1000
    assert row.open == 2.0 and row.close == 9.0
    assert row.high == 9.0 and row.low == 2.0
    assert row.t_high == t0 + 5 * 60 * 1_000_000   # earliest of the two 9.0s
    assert row.t_low == t0


def test_ohlc_single_exchange(spark):
    from pyhctsa_spark.operators.continuous_agg import ohlc_agg

    rng = np.random.default_rng(3)
    out = ohlc_agg(spark.createDataFrame(_events(rng)), on="ts",
                   by=["user_id"], value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan  # pure hash-aggregate, no sort/window


# -------------------------------------------------------------- gap_detect
def test_gap_detect_matches_brute(spark):
    from pyhctsa_spark.operators.continuous_agg import gap_detect

    rng = np.random.default_rng(5)
    ev = _events(rng, n_keys=4, n=300)
    # _events spans ~67 min; with ~75 events/key the mean spacing is
    # ~54 s, so a 2-minute threshold yields a real-but-sparse gap set
    thr = 2 * 60 * 1_000_000
    got = (
        gap_detect(spark.createDataFrame(ev), on="ts", by=["user_id"],
                   min_gap_micros=thr)
        .toPandas().sort_values(["user_id", "gap_start"])
        .reset_index(drop=True)
    )
    rows = []
    for uid, g in ev.groupby("user_id"):
        t = np.sort(g.ts.astype("int64").values // 1000)
        d = np.diff(t)
        for i in np.flatnonzero(d > thr):
            rows.append({"user_id": uid, "gap_start": t[i],
                         "gap_end": t[i + 1], "gap_s": d[i] / 1e6})
    want = pd.DataFrame(rows).sort_values(
        ["user_id", "gap_start"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in ("gap_start", "gap_end"):
        assert (got[c].values == want[c].values).all()
    assert np.allclose(got.gap_s.values, want.gap_s.values)
