"""Count-min sketch: column hashing, one-sided guarantee, merge
algebra, and the Spark relational-state surfaces."""

import numpy as np
import pytest

from pyhctsa_spark.functions.hll_state import splitmix64
from pyhctsa_spark.operators.cms_sketch import (
    D,
    W,
    cms_cols,
    cms_estimate,
    cms_from_tokens,
)


def test_cols_are_hash_bytes():
    toks = np.array([0, 1, 490, -7], dtype=np.int64)
    cols = cms_cols(toks)
    hs = splitmix64(toks)
    for j in range(len(toks)):
        for i in range(D):
            assert cols[j, i] == (int(hs[j]) >> (8 * i)) % W


def test_estimates_never_undercount_and_are_tight_for_heavy():
    rng = np.random.default_rng(5)
    # zipf-ish: token t appears ~ 5000/(t+1) times
    toks = np.concatenate([
        np.full(5000 // (t + 1), t, dtype=np.int64) for t in range(300)
    ])
    cms = cms_from_tokens(toks)
    true = {t: int((toks == t).sum()) for t in range(300)}
    est = cms_estimate(cms, np.arange(300, dtype=np.int64))
    n = len(toks)
    for t in range(300):
        assert est[t] >= true[t]                 # one-sided guarantee
        assert est[t] <= true[t] + 0.1 * n       # loose eps*N bound
    # the heaviest tokens should be near-exact (collisions add little)
    for t in range(5):
        assert est[t] - true[t] <= 0.02 * n


def test_merge_is_elementwise_add():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 100, 2000, dtype=np.int64)
    b = rng.integers(50, 150, 2000, dtype=np.int64)
    assert (cms_from_tokens(np.concatenate([a, b]))
            == cms_from_tokens(a) + cms_from_tokens(b)).all()


@pytest.fixture(scope="module")
def seq(spark):
    from pyhctsa_spark.sources.synthetic import sequences_df

    return sequences_df(spark, 30).cache()


def test_sketch_by_matches_numpy_and_point_estimates(spark, seq):
    from pyhctsa_spark.operators.cms_sketch import (
        cms_point_estimates,
        cms_sketch_by,
    )

    states = cms_sketch_by(seq).cache()
    per_src: dict = {}
    for r in seq.select("source", "tokens").collect():
        per_src.setdefault(r["source"], []).extend(r["tokens"])
    want = {s: cms_from_tokens(np.asarray(t, dtype=np.int64))
            for s, t in per_src.items()}
    got: dict = {}
    for r in states.collect():
        got.setdefault(r["source"],
                       np.zeros((D, W), dtype=np.int64))[r["i"], r["col"]] = r["cnt"]
    assert set(got) == set(want)
    for s in want:
        assert (got[s] == want[s]).all()

    probes = list(range(10))
    est = {(r["source"], r["token"]): r["est_count"]
           for r in cms_point_estimates(states, probes).collect()}
    for s, toks in per_src.items():
        arr = np.asarray(toks, dtype=np.int64)
        ref = cms_estimate(want[s], np.asarray(probes, dtype=np.int64))
        for j, t in enumerate(probes):
            assert est[(s, t)] == int(ref[j])
            assert est[(s, t)] >= int((arr == t).sum())


def test_cms_merge_equals_partial_of_union(spark, seq):
    import pandas as pd

    from pyhctsa_spark.operators.cms_sketch import cms_merge, cms_sketch_by

    a = seq.where("doc_id like '%0' or doc_id like '%1'")
    b = seq.subtract(a)
    merged = cms_merge(
        cms_sketch_by(a).unionByName(cms_sketch_by(b))
    )
    direct = cms_sketch_by(seq)
    key = ["source", "i", "col"]
    pd.testing.assert_frame_equal(
        merged.orderBy(*key).toPandas()[["source", "i", "col", "cnt"]],
        direct.orderBy(*key).toPandas()[["source", "i", "col", "cnt"]],
    )


def test_sketch_by_plan_is_combiner_friendly(spark, seq):
    from pyhctsa_spark.operators.cms_sketch import cms_sketch_by

    plan = (
        cms_sketch_by(seq)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_sum" in plan  # map-side combine before the shuffle
