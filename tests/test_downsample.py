"""LTTB kernel vs an independent per-point replay, edge cases, plan."""

import numpy as np
import pandas as pd
import pytest

from pyhctsa_spark.operators.downsample import lttb_downsample, lttb_indices


def _brute_lttb(t, v, n_out):
    """Straight-line replay of the spec with python loops."""
    n = len(t)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    tr = [float(x - t[0]) for x in t]
    buckets = [[] for _ in range(nb)]
    for j in range(1, n - 1):
        buckets[((j - 1) * nb) // (n - 2)].append(j)
    cent = [
        (sum(tr[j] for j in b) / len(b), sum(v[j] for j in b) / len(b))
        for b in buckets
    ]
    sel = [0]
    sa, sv = tr[0], float(v[0])
    for i in range(nb):
        ct, cv = cent[i + 1] if i + 1 < nb else (tr[-1], float(v[-1]))
        best, best_area = None, -1.0
        for j in buckets[i]:
            area = abs((sa - ct) * (v[j] - sv) - (sa - tr[j]) * (cv - sv))
            if area > best_area:  # strict: first max wins ties
                best, best_area = j, area
        sel.append(best)
        sa, sv = tr[best], float(v[best])
    sel.append(n - 1)
    return sel


@pytest.mark.parametrize("n,n_out", [(100, 10), (57, 24), (500, 24), (26, 24)])
def test_lttb_indices_match_brute(n, n_out):
    rng = np.random.default_rng(n)
    t = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    v = np.round(rng.normal(size=n) * 100).astype(np.int64).astype(float)
    got = lttb_indices(t, v.copy(), n_out)
    want = _brute_lttb(t.tolist(), v.tolist(), n_out)
    assert got.tolist() == want


def test_lttb_passthrough_and_endpoints():
    t = np.arange(10, dtype=np.int64) * 1000
    v = np.arange(10, dtype=float)
    assert lttb_indices(t, v, 24).tolist() == list(range(10))
    idx = lttb_indices(np.arange(100, dtype=np.int64), np.ones(100), 5)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 5


def test_lttb_keeps_spikes():
    # a flat series with two big spikes: LTTB must keep both
    t = np.arange(200, dtype=np.int64)
    v = np.zeros(200)
    v[50], v[150] = 100.0, -80.0
    idx = set(lttb_indices(t, v, 12).tolist())
    assert 50 in idx and 150 in idx


def test_lttb_downsample_df(spark):
    rng = np.random.default_rng(61)
    rows = []
    for uid in range(5):
        n = int(rng.integers(10, 120))
        t = np.sort(rng.choice(10**9, n, replace=False))
        v = np.round(rng.normal(size=n) * 100)
        rows.append(pd.DataFrame({"user_id": uid, "tus": t, "v100": v}))
    pdf = pd.concat(rows)
    df = spark.createDataFrame(pdf)
    got = (
        lttb_downsample(df, on="tus", by=["user_id"], value_col="v100",
                        n_out=16)
        .toPandas().sort_values(["user_id", "tus"]).reset_index(drop=True)
    )
    frames = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        sel = _brute_lttb(g.tus.tolist(), g.v100.tolist(), 16)
        frames.append(g.iloc[sel])
    want = (pd.concat(frames).sort_values(["user_id", "tus"])
            .reset_index(drop=True))
    assert (got.tus.values == want.tus.values).all()
    assert (got.v100.values == want.v100.values).all()
    plan = (
        lttb_downsample(df, on="tus", by=["user_id"], value_col="v100")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_lttb_carry_across_arrow_batches(spark):
    # tiny Arrow batches force key runs to straddle batch boundaries:
    # the kernel's carry buffer must reassemble each key's FULL series
    # (a split run would downsample two partial series instead)
    rng = np.random.default_rng(67)
    rows = []
    for uid in range(6):
        n = int(rng.integers(40, 90))
        t = np.sort(rng.choice(10**9, n, replace=False))
        rows.append(pd.DataFrame({
            "user_id": uid, "tus": t,
            "v100": np.round(rng.normal(size=n) * 100),
        }))
    pdf = pd.concat(rows)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        got = (
            lttb_downsample(
                spark.createDataFrame(pdf).coalesce(1),
                on="tus", by=["user_id"], value_col="v100", n_out=12,
            )
            .toPandas().sort_values(["user_id", "tus"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set(key, old)
    frames = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("tus").reset_index(drop=True)
        frames.append(g.iloc[_brute_lttb(g.tus.tolist(), g.v100.tolist(), 12)])
    want = (pd.concat(frames).sort_values(["user_id", "tus"])
            .reset_index(drop=True))
    assert len(got) == len(want) == 6 * 12
    assert (got.tus.values == want.tus.values).all()
    assert (got.v100.values == want.v100.values).all()
