"""Bloom-filter benchmark decontamination: membership screening against
a broadcast BITMAP instead of a broadcast n-gram set.

The exact screen (operators/text.contamination_check) broadcasts the
eval n-gram strings and hash-semi-joins the corpus explode. That is the
right shape while the benchmark fits comfortably in executor memory; at
a consortium-scale decontamination list (hundreds of millions of
n-grams) the broadcast side itself becomes GBs. The Bloom variant caps
the shipped state at m/8 bytes FOREVER (2^20 bits = 128 KB here) at the
price of a deterministic, quantifiable false-positive rate
(~(1-e^{-kn/m})^k) — and a decontamination screen is exactly where
one-sided error is acceptable: a false positive only quarantines an
extra training doc, never leaks an eval doc in.

Determinism contract (what makes the DuckDB value oracle possible,
false positives included): positions come from md5 — which Spark, (the
engine kernels via hashlib) and DuckDB all compute identically — split
into two 60-bit halves h1, h2, expanded to k indexes by
Kirsch-Mitzenmacher double hashing idx_i = (h1 + i*h2) mod m. The
oracle rebuilds the eval position SET in SQL and flags a corpus n-gram
iff all k of its positions are present — bit-for-bit the bitmap
semantics, so even the false positives agree.

Scale shape: the corpus side is explode -> per-n-gram JVM md5/conv ->
one Arrow-batched bitmap probe (O(k) bit tests per n-gram, no join
node) -> one doc_id-keyed count aggregation. The corpus text is never
shuffled; the eval set is read once to build the bitmap.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

M_BITS = 1 << 20
K_HASHES = 5


def _ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct space-separated word n-grams per doc (the same
    construction as text.contamination_check and its SQL oracle)."""
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_w")
    ).where(F.size("_w") >= n)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("_w") - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("_w"), i + k + 1) for k in range(n)],
            ),
        )
    )
    return words.select(F.col(id_col), F.explode(sh).alias("ng"))


def _positions(ng_df: DataFrame, m: int, k: int) -> DataFrame:
    """k bitmap positions per n-gram: md5 split into two 60-bit halves,
    Kirsch-Mitzenmacher expansion. All JVM expressions (conv on hex
    substrings) — identical in DuckDB via ('0x' || substr)::BIGINT."""
    hexd = F.md5(F.col("ng"))
    h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hexd, 16, 15), 16, 10).cast("long")
    idxs = F.array(*[
        F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("long")
        for i in range(k)
    ])
    return ng_df.withColumn("idxs", idxs)


def bloom_build(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 8,
    m: int = M_BITS,
    k: int = K_HASHES,
) -> tuple[np.ndarray, int]:
    """Packed uint8 bitmap (m/8 bytes) of the eval set's n-gram
    positions + the set-bit count (for FP-rate accounting). The only
    driver transfer is the bounded distinct-position list (<= m)."""
    pos = (
        _positions(
            _ngrams(eval_df, text_col, id_col, ngram_n).select("ng").distinct(),
            m, k,
        )
        .select(F.explode("idxs").alias("p"))
        .distinct()
        .collect()
    )
    bm = np.zeros(m // 8, dtype=np.uint8)
    idx = np.array([r["p"] for r in pos], dtype=np.int64)
    np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bm, len(idx)


def contamination_check_bloom(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 8,
    min_hits: int = 1,
    m: int = M_BITS,
    k: int = K_HASHES,
    prebuilt: np.ndarray | None = None,
) -> DataFrame:
    """Per corpus doc: count of distinct n-grams whose k positions are
    all set in the eval bitmap, plus the 0/1 contaminated flag. Same
    output shape as the exact screen; hits are a superset of the exact
    hits (one-sided error, asserted in tests)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bm = prebuilt if prebuilt is not None else bloom_build(
        eval_df, text_col, id_col, ngram_n, m, k)[0]
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(bm)

    def member(idxs):
        b = bc.value
        if not len(idxs):
            return pd.Series(np.zeros(0, dtype=bool))
        A = np.stack(idxs.to_numpy()).astype(np.int64)  # (rows, k)
        bits = (b[A >> 3] >> (A & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    member.__annotations__ = {"idxs": pd.Series, "return": pd.Series}
    member_udf = pandas_udf(member, "boolean")

    probed = _positions(
        _ngrams(corpus, text_col, id_col, ngram_n), m, k
    ).withColumn("hit", member_udf(F.col("idxs")))
    hits = (
        probed.where(F.col("hit"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits)
            .cast("int").alias("contaminated"),
        )
    )
