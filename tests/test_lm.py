"""Bigram-LM perplexity scoring (operators/lm.py): numpy-replayed
ground truth on a tiny corpus, smoothing/backoff behavior on unseen
bigrams, the broadcast-join plan contract, and the end-to-end filter.
The cross-engine value check is ENGINE_ORACLES["doc_lm_ppl"]."""

import math

import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.lm import (
    doc_bigrams,
    lm_perplexity,
    lm_quality_filter,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b a b c", "good"),
        (1, "a b a b a b", "good"),
        (2, "c c a b", "good"),
        (3, "z q z q", "crawl"),   # all-unseen bigrams -> backoff path
        (4, "a b c", "crawl"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).persist()


def _np_lm(rows, train_sources, alpha=0.5):
    bi, ctx = {}, {}
    for _i, text, src in rows:
        if src not in train_sources:
            continue
        ws = ["<s>"] + text.split(" ")
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    vocab = len({b for (_a, b) in bi})
    return bi, ctx, vocab


def test_bigram_counts_match_python(spark, corpus):
    rows = [(r.doc_id, r.text, r.source) for r in corpus.collect()]
    bi_np, ctx_np, v_np = _np_lm(rows, {"good"})
    bi, ctx, v = train_bigram_lm(corpus.where(F.col("source") == "good"))
    got_bi = {(r.w1, r.w2): r.c_bi for r in bi.collect()}
    got_ctx = {r.w1: r.c_ctx for r in ctx.collect()}
    assert got_bi == bi_np
    assert got_ctx == ctx_np
    assert v == v_np


def test_perplexity_matches_numpy_replay(spark, corpus):
    rows = [(r.doc_id, r.text, r.source) for r in corpus.collect()]
    bi_np, ctx_np, v = _np_lm(rows, {"good"})
    a = 0.5
    want = {}
    for doc_id, text, _src in rows:
        ws = ["<s>"] + text.split(" ")
        lps = [
            math.log(
                (bi_np.get((p, w), 0) + a) / (ctx_np.get(p, 0) + a * v)
            )
            for p, w in zip(ws, ws[1:])
        ]
        nll = -sum(lps) / len(lps)
        want[doc_id] = (len(lps), round(nll, 6), round(math.exp(nll), 6))
    bi, ctx, vv = train_bigram_lm(corpus.where(F.col("source") == "good"))
    got = {
        r.doc_id: (r.n_bigrams, r.nll, r.ppl)
        for r in lm_perplexity(corpus, bi, ctx, vv, alpha=a).collect()
    }
    assert got == want


def test_unseen_bigrams_score_worse(spark, corpus):
    out = lm_quality_filter(
        corpus, F.col("source") == "good", max_ppl=2.9
    ).toPandas().set_index("doc_id")
    # doc 3 is entirely out-of-vocabulary: its ppl must dominate
    assert out.loc[3, "ppl"] > out.drop(index=3)["ppl"].max()
    assert not out.loc[3, "keep"]
    assert out.loc[1, "keep"]


def test_lm_scoring_joins_are_broadcast(spark, corpus):
    bi, ctx, v = train_bigram_lm(corpus.where(F.col("source") == "good"))
    plan = (
        lm_perplexity(corpus, bi, ctx, v)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-side bigram stream must never shuffle on the Zipf-
    # skewed bigram key: both model joins are broadcast
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_every_doc_scored_once(spark, corpus):
    bi, ctx, v = train_bigram_lm(corpus.where(F.col("source") == "good"))
    out = lm_perplexity(corpus, bi, ctx, v).toPandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]
    n_tok = {r.doc_id: len(r.text.split(" ")) for r in corpus.collect()}
    assert {r: n for r, n in zip(out["doc_id"], out["n_bigrams"])} == n_tok


def test_bigram_explode_shape(spark):
    df = spark.createDataFrame([(7, "x y z")], "doc_id long, text string")
    got = [
        (r.w1, r.w2) for r in doc_bigrams(df).orderBy("w1", "w2").collect()
    ]
    assert got == [("<s>", "x"), ("x", "y"), ("y", "z")]


def test_empty_training_slice_rejected(spark, corpus):
    import pytest

    bi, ctx, v = train_bigram_lm(
        corpus.where(F.col("source") == "no_such_source")
    )
    assert v == 0
    with pytest.raises(ValueError, match="vocab_size = 0"):
        lm_perplexity(corpus, bi, ctx, v)


def test_null_text_docs_scored_as_unscoreable_and_kept(spark):
    df = spark.createDataFrame(
        [(0, "a b a b", "good"), (1, None, "good"), (2, "a b", "crawl")],
        "doc_id long, text string, source string",
    )
    out = lm_quality_filter(df, F.col("source") == "good", max_ppl=100.0)
    got = {r.doc_id: (r.n_bigrams, r.ppl, r.keep) for r in out.collect()}
    assert set(got) == {0, 1, 2}              # every doc has a row
    assert got[1] == (0, None, True)          # unscoreable -> kept
    assert got[0][0] == 4 and got[0][2]
