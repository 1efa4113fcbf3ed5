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
