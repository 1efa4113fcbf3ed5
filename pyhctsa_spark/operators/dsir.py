"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score every raw document by how much its hashed-n-gram bag looks like a
small TARGET distribution, perturb with deterministic Gumbel noise, and
keep the top mass — the standard recipe for carving a domain-matched
pretraining subset out of a web crawl.

Model: unigram + bigram occurrences are hashed into ``n_buckets``
buckets; the target and raw corpora each induce an add-alpha-smoothed
categorical distribution over buckets; a document's log importance
weight is

    log w(d) = sum_{gram g in d} [ log p_target(b(g)) - log p_raw(b(g)) ]

(occurrence-weighted, exactly the paper's bag-of-hashed-ngrams form).
Gumbel-top-k resampling is made deterministic by deriving the uniform
from md5(doc_id) — the same cross-engine hash primitive the split and
source-mix operators use — so the DuckDB oracle replays selection
bit-for-bit (plans/oracle_queries.ENGINE_ORACLES["doc_dsir_select"]).

Spark-first shape (the 100 TB contract):
- Pass 1 aggregates gram occurrences into ``n_buckets`` partial counts:
  the shuffle carries at most ``n_buckets`` rows per map task (map-side
  combine), never text. The bucket model is O(n_buckets) — tiny — and
  is BROADCAST back for scoring.
- Pass 2 rescans the corpus, joins each gram occurrence to the
  broadcast model, and partial-sums per doc_id: one corpus-keyed
  shuffle whose payload is a single double per (task, doc).
  Re-deriving grams instead of caching them trades a second scan for
  not persisting a corpus-sized gram table — the right call at scale.
- Selection is a map-side threshold on the Gumbel-perturbed score
  (zero extra shuffles, predicate-pushdown friendly). Exact top-k
  needs a global sort; ``dsir_top_fraction`` provides it for bounded
  outputs and documents the cost.

No reference counterpart: pyhctsa has no corpus-curation surface
(SURVEY §2.0); this extends the LLM-pipeline family (lm.py, dedup.py,
curation.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from pyhctsa_spark.operators.curation import md5_u32

HASH_SALT = "dsir:"
GUMBEL_SALT = "dsir-g:"
U32 = 4294967296.0  # 2^32


def hashed_gram_buckets(
    df: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    doc_col: str = "doc_id",
    carry: list[str] | None = None,
) -> DataFrame:
    """Explode each document into one row per unigram/bigram OCCURRENCE
    with its hash bucket: (doc_id, *carry, bucket).

    Tokens are single-space-split words; a bigram's gram string is
    ``w1 || ' ' || w2`` (space-joined, so the unigram and bigram gram
    spaces never collide — unigrams cannot contain a space). Bucket =
    md5_u32(salt || gram) % n_buckets, the cross-engine hash. NULL-text
    rows yield no grams (split(NULL) is NULL; explode drops it) —
    callers that must keep every row LEFT JOIN back (dsir_select does).

    The split is materialized under an alias BEFORE the transform
    references it per element (expression-inlining trap), and the
    bigram builder filters ``size >= 2`` BEFORE F.sequence — sequence
    DESCENDS for 1-word docs otherwise (CLAUDE.md invariant).
    """
    keep = [F.col(doc_col).alias("doc_id")] + [F.col(c) for c in (carry or [])]
    base = df.select(*keep, F.split(F.col(text_col), " ").alias("_ws"))
    uni = base.select(
        "doc_id", *(carry or []), F.explode("_ws").alias("gram")
    )
    bi = base.where(F.size("_ws") >= 2).select(
        "doc_id",
        *(carry or []),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_ws") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("_ws"), i),
                    F.element_at(F.col("_ws"), i + 1),
                ),
            )
        ).alias("gram"),
    )
    grams = uni.unionAll(bi)
    bucket = F.pmod(md5_u32(F.col("gram"), HASH_SALT), F.lit(n_buckets))
    return grams.select(
        "doc_id", *(carry or []), bucket.cast("long").alias("bucket")
    )


def dsir_bucket_model(
    df: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Pass 1: the per-bucket log importance ratio table
    (bucket, log_ratio), at most ``n_buckets`` rows.

    ``target_pred`` marks the target slice (e.g. ``F.col("lang") ==
    "en"``); the raw distribution is the WHOLE input. Both counts come
    out of one aggregation (target count = conditional sum), so the
    corpus is scanned once. Smoothing is add-alpha over buckets:
    p(b) = (c_b + alpha) / (total + alpha * n_buckets); buckets with no
    raw occurrence never appear — no document can reference them, so
    the scoring join loses nothing by their absence.
    """
    flagged = df.withColumn("_tgt", target_pred)
    grams = hashed_gram_buckets(
        flagged, n_buckets, text_col, doc_col, carry=["_tgt"]
    )
    per_bucket = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_tgt"),
    )
    # one-row scalar totals: a single-row collect, fine at any scale
    tot = per_bucket.agg(
        F.sum("c_raw").alias("r"), F.sum("c_tgt").alias("t")
    ).collect()[0]
    r_tot, t_tot = float(tot["r"] or 0), float(tot["t"] or 0)
    a = float(alpha)
    ab = a * n_buckets
    lr = (
        F.log(F.col("c_tgt") + F.lit(a))
        - F.lit(math.log(t_tot + ab))
        - F.log(F.col("c_raw") + F.lit(a))
        + F.lit(math.log(r_tot + ab))
    )
    return per_bucket.select("bucket", lr.alias("log_ratio"))


def dsir_log_weights(
    df: DataFrame,
    model: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Pass 2: per-document log importance weight (doc_id, logw).

    Joins each gram occurrence to the BROADCAST bucket model and
    partial-sums per doc — map-side combine makes the doc_id shuffle
    carry one double per (task, doc). Documents with no grams (NULL
    text) are absent from the result; dsir_select restores them.
    """
    grams = hashed_gram_buckets(df, n_buckets, text_col, doc_col)
    joined = grams.join(F.broadcast(model), "bucket")
    return joined.groupBy("doc_id").agg(F.sum("log_ratio").alias("logw"))


def gumbel_noise(doc_col: Column, salt: str = GUMBEL_SALT) -> Column:
    """Deterministic standard-Gumbel draw from md5(doc_id): u =
    (md5_u32 + 0.5) / 2^32 lies strictly inside (0, 1), so
    g = -ln(-ln(u)) is always finite — the +0.5 offset is the guard."""
    u = (md5_u32(doc_col, salt) + F.lit(0.5)) / F.lit(U32)
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    threshold: float,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """End-to-end DSIR selection with a FIXED score threshold: every
    input row comes back (score-every-row contract) with

      logw6    round(log importance weight, 6); NULL when unscoreable
      gscore6  round(logw + Gumbel(md5(doc_id)), 6); NULL likewise
      selected gscore6 >= threshold (false for unscoreable rows)

    Thresholding (rather than exact top-k) keeps selection map-side —
    no global sort — which is the shape that survives 100 TB; pick the
    threshold from a quantile probe on a sample, or use
    ``dsir_top_fraction`` when an exact fraction is required. Rounding
    BEFORE the comparison pins the boundary decision to 6 decimals on
    both engines (oracle convention).
    """
    model = dsir_bucket_model(
        df, target_pred, n_buckets, alpha, text_col, doc_col
    )
    w = dsir_log_weights(df, model, n_buckets, text_col, doc_col)
    base = df.select(F.col(doc_col).alias("doc_id"))
    out = base.join(w, "doc_id", "left")
    gscore = F.col("logw") + gumbel_noise(F.col("doc_id"))
    g6 = F.round(gscore, 6)
    return out.select(
        "doc_id",
        F.round(F.col("logw"), 6).alias("logw6"),
        g6.alias("gscore6"),
        F.coalesce(
            g6 >= F.lit(float(threshold)).cast("double"), F.lit(False)
        ).alias("selected"),
    )


def dsir_top_fraction(
    df: DataFrame,
    target_pred: Column,
    fraction: float,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Exact Gumbel-top-k selection: keep ceil(fraction * n_scoreable)
    docs by (gscore6 DESC, doc_id) rank. The unpartitioned rank window
    funnels through ONE task — correct and fine for bounded outputs,
    but at corpus scale use dsir_select with a probed threshold."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    model = dsir_bucket_model(
        df, target_pred, n_buckets, alpha, text_col, doc_col
    )
    w = dsir_log_weights(df, model, n_buckets, text_col, doc_col)
    from pyspark.sql.window import Window

    g6 = F.round(F.col("logw") + gumbel_noise(F.col("doc_id")), 6)
    scored = w.select(
        "doc_id", F.round("logw", 6).alias("logw6"), g6.alias("gscore6")
    )
    win = Window.orderBy(F.col("gscore6").desc(), F.col("doc_id"))
    ranked = scored.withColumn("rnk", F.row_number().over(win)).withColumn(
        "n_tot", F.count(F.lit(1)).over(Window.partitionBy())
    )
    keep = F.col("rnk") <= F.ceil(F.col("n_tot") * F.lit(float(fraction)))
    base = df.select(F.col(doc_col).alias("doc_id"))
    return base.join(
        ranked.select("doc_id", "logw6", "gscore6", keep.alias("selected")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "logw6",
        "gscore6",
        F.coalesce("selected", F.lit(False)).alias("selected"),
    )
