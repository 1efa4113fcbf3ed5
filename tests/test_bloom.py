"""Bloom decontamination: position hashing replay, one-sided error vs
the exact screen, bitmap build accounting."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.bloom import (
    K_HASHES,
    M_BITS,
    _ngrams,
    _positions,
    bloom_build,
    contamination_check_bloom,
)


def _py_positions(ng: str, m: int = M_BITS, k: int = K_HASHES):
    hexd = hashlib.md5(ng.encode()).hexdigest()
    h1, h2 = int(hexd[:15], 16), int(hexd[15:30], 16)
    return [(h1 + i * h2) % m for i in range(k)]


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for d in range(30):
        words = (base + f" filler{d} " + " ".join(
            f"w{d}_{j}" for j in range(12))).split()
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_positions_match_hashlib_replay(spark, docs):
    rows = (
        _positions(_ngrams(docs, "text", "doc_id", 8), M_BITS, K_HASHES)
        .select("ng", "idxs").limit(50).collect()
    )
    assert rows
    for r in rows:
        assert list(r["idxs"]) == _py_positions(r["ng"])


def test_bloom_hits_superset_of_exact(spark, docs):
    from pyhctsa_spark.operators.text import contamination_check

    ev = docs.where("doc_id < 5")
    exact = {r["doc_id"]: r["n_hits"]
             for r in contamination_check(docs, ev).collect()}
    bloom = {r["doc_id"]: r["n_hits"]
             for r in contamination_check_bloom(docs, ev).collect()}
    assert set(bloom) == set(exact)
    for d in exact:
        assert bloom[d] >= exact[d]  # one-sided error only
    # the shared prefix means every doc shares n-grams with the eval set
    assert all(v >= 1 for v in exact.values())


def test_bloom_build_counts_set_bits(spark, docs):
    ev = docs.where("doc_id < 3")
    bm, nbits = bloom_build(ev)
    assert int(np.unpackbits(bm).sum()) == nbits
    ngs = [r["ng"] for r in
           _ngrams(ev, "text", "doc_id", 8).select("ng").distinct().collect()]
    want = set()
    for ng in ngs:
        want.update(_py_positions(ng))
    assert nbits == len(want)


def test_disjoint_eval_set_flags_nothing_at_this_density(spark, docs):
    ev = docs.sparkSession.createDataFrame(
        [(999, " ".join(f"zz{j}" for j in range(20)))],
        "doc_id long, text string",
    )
    out = contamination_check_bloom(docs, ev)
    # ~100 set bits in 2^20 -> FP rate ~(1e-4)^5; nothing can fire
    assert out.where("contaminated = 1").count() == 0
