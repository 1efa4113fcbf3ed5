"""N-gram language-model training and perplexity scoring — the
CCNet/RefinedWeb-style quality gate: train a smoothed bigram LM on a
trusted slice of the corpus, score every document's per-token negative
log-likelihood against it, and filter on perplexity.

Spark-first shape (the 100 TB contract):
- Training is two hash aggregations over exploded bigrams (map-side
  partial combine does most of the work; the shuffle carries
  (bigram, partial-count) pairs, never text).
- The trained model is VOCABULARY-bounded, not corpus-bounded — for a
  word-level LM that is at most |V|^2 observed bigrams (in practice a
  few hundred MB for web-scale vocab), so scoring BROADCASTS the model
  and stays map-side: no shuffle of the corpus on the Zipf-skewed
  bigram key, which would otherwise be the classic skew bottleneck
  (the top bigram alone can be 1% of a crawl).
- Everything is deterministic: counts are exact integers, smoothing is
  closed-form, so the DuckDB oracle replays the identical arithmetic
  (plans/oracle_queries.ENGINE_ORACLES["doc_lm_ppl"]).

Smoothing: add-alpha (Lidstone) over the context row,
p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * |V|),
with c() = 0 for pairs/contexts unseen in training — the backoff path
documents from outside the training slice actually exercise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BOS = "<s>"


def doc_bigrams(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """Explode each document into (doc_id, w1, w2) word-bigram rows with
    a BOS sentinel, one row per token: a document of n whitespace words
    yields exactly n bigrams (<s>,w_1), (w_1,w_2), ..., (w_{n-1},w_n).

    The prepended array is materialized under an alias BEFORE the
    shingle expressions so the (non-cheap) split isn't inlined and
    re-evaluated per reference — the round-2 expression-inlining trap.

    Bigram construction is ``explode(arrays_zip(slice, slice))`` —
    all codegen'd built-ins (optimization r6, guide §4.1: the former
    ``transform(sequence(...), lambda)`` was interpreted per element,
    measured ~40% of the scoring scan). arr always has >= 2 elements
    (BOS + split's >= 1 result), so the slice lengths are never
    negative; same pairs in the same order as the lambda formulation.
    """
    arr = F.concat(F.array(F.lit(BOS)), F.split(F.col(text_col), " "))
    toks = df.select(F.col(doc_col).alias("doc_id"), arr.alias("arr"))
    a = F.col("arr")
    m = F.size(a) - 1
    pairs = F.explode(
        F.arrays_zip(F.slice(a, 1, m).alias("w1"), F.slice(a, 2, m).alias("w2"))
    )
    return toks.select("doc_id", pairs.alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Count-train a word-bigram LM: returns (bigram counts (w1, w2,
    c_bi), context counts (w1, c_ctx), vocab size |V|).

    Two hash aggregations with map-side combine; c_ctx is derived from
    the (already tiny) bigram table, not re-scanned from the corpus.
    |V| is the distinct count of predicted tokens (BOS never appears as
    a w2, so it is excluded by construction). The single-scalar collect
    for |V| is a one-row aggregate — fine at any corpus size.

    The returned bigram table is persisted (it feeds ctx, the |V|
    count, and the scoring broadcast); callers that train repeatedly in
    one session should ``bi.unpersist()`` once the scored output has
    been materialized — jobs/curation_job.py does.
    """
    bg = doc_bigrams(df, text_col, doc_col)
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    bi = bi.persist()
    ctx = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    vocab = bi.select("w2").distinct().count()
    return bi, ctx, int(vocab)


def lm_perplexity(
    docs: DataFrame,
    bi: DataFrame,
    ctx: DataFrame,
    vocab_size: int,
    alpha: float = 0.5,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a trained bigram LM: per-token
    negative log-likelihood (``nll``, natural log) and perplexity
    (``ppl`` = exp(nll)), the CCNet filter statistic.

    Both LM tables are explicitly broadcast — the corpus-side bigram
    stream is Zipf-skewed on (w1, w2), so a shuffle join here would
    funnel the head bigrams through single reducers; map-side broadcast
    lookup is both the fast AND the skew-proof shape. Denominators are
    >= alpha * |V| > 0 for a non-degenerate model; an empty training
    slice (|V| = 0) would make them exactly 0.0 — under ANSI mode a
    runtime DIVIDE_BY_ZERO, or worse a silent ppl=0 pass-all — so it is
    rejected eagerly here.

    EVERY input row gets an output row: documents that produce no
    bigram rows (NULL text) come back with n_bigrams = 0 and NULL
    nll/ppl rather than vanishing — the round-3 composite-filter trap.
    """
    if vocab_size <= 0:
        raise ValueError(
            "empty bigram LM (vocab_size = 0): the training slice "
            "matched no documents — smoothing denominators would be 0"
        )
    a = float(alpha)
    av = a * float(vocab_size)
    bg = doc_bigrams(docs, text_col, doc_col)
    lp = (
        bg.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(a))
                / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(av))
            ).alias("lp"),
        )
    )
    per = lp.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("lp").alias("slp")
    )
    ids = docs.select(F.col(doc_col).alias("doc_id")).distinct()
    per = ids.join(per, "doc_id", "left")
    nll = -F.col("slp") / F.col("n")
    return per.select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(nll, 6).alias("nll"),
        F.round(F.exp(nll), 6).alias("ppl"),
    )


def lm_quality_filter(
    docs: DataFrame,
    train_pred: Column,
    max_ppl: float,
    alpha: float = 0.5,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """End-to-end perplexity gate: train on ``docs`` rows matching
    ``train_pred`` (the trusted slice), score ALL rows, keep those with
    ppl <= ``max_ppl``. Unscoreable documents (no bigrams -> NULL ppl)
    are KEPT — a quality gate must not silently drop what it could not
    measure. Returns (doc_id, n_bigrams, nll, ppl, keep)."""
    bi, ctx, v = train_bigram_lm(docs.where(train_pred), text_col, doc_col)
    scored = lm_perplexity(docs, bi, ctx, v, alpha, text_col, doc_col)
    return scored.withColumn(
        "keep",
        F.coalesce(F.col("ppl") <= F.lit(float(max_ppl)), F.lit(True)),
    )
