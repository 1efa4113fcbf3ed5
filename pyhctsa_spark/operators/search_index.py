"""Persistent inverted index for BM25 retrieval — the 100 TB search
shape: one corpus-sized indexing pass, then every query is a
PARTITION-PRUNED probe that reads only the term buckets it mentions.

``operators/search.py`` scores straight off the documents table — right
for one-off audits, wrong as the steady state: a corpus re-scan per
query cannot survive 100 TB. This module materializes the postings once
and makes query cost proportional to the query's own term buckets,
independent of corpus size.

Layout under ``path`` (plain parquet, the same manifest-less convention
as the MinHash index in operators/dedup_index.py):

    postings/term_bucket=B/   (term, doc_id, tf, dl)  hash-partitioned
    df/term_bucket=B/         (term, df_t) PARTIAL rows, same
                              partitioning — each build/append batch
                              appends its own partial counts; readers
                              SUM them (so appends never rewrite the
                              vocabulary-sized table), compaction merges
    stats/                    1 row (n_docs, n_dl, sum_dl)  BM25 constants
    _search_meta.json         {n_buckets, k_shingle n/a, id_type, ...}

Scale contract:

- ``build_search_index`` is the one corpus pass: explode → partial-agg
  postings (the shuffle carries one row per DISTINCT (term, doc), never
  raw token volume), written ``partitionBy(term_bucket)`` and sorted by
  term within each partition so query-time ``term IN (...)`` predicates
  prune parquet row groups under the pruned partitions.
- ``query_search_index`` reads ONLY the ≤|q| buckets the query's terms
  hash to (partition pruning, asserted in tests/test_search_index.py),
  derives df_t from the pruned ``df/`` table (broadcast — ≤|q| rows)
  and the corpus constants from the 1-row ``stats/``; top-k is
  TakeOrderedAndProject. No shuffle in the plan touches the corpus.
- ``append_to_search_index`` is delta-proportional in EVERY table: the
  batch's postings and its df PARTIALS append into the same partition
  layout (a per-append rewrite of the full vocabulary table would be
  the scale killer — web-corpus vocabularies run to billions of hapax
  tokens); ``stats/`` merges exactly (sums, not averages, are stored
  so the merge is associative) through a crash-recoverable swap.
- ``compact_search_index(drop_ids=...)`` is the right-to-be-forgotten
  path (the searchability sibling of operators/deletion.py): rewrites
  postings without the dropped docs and RECOMPUTES df/stats from the
  surviving postings, atomic per table via the tmp/old rename swap.

Scores are identical (to the 6-decimal in-query rounding) to
``search.bm25_topk`` run against the same corpus — the equality is a
pytest gate, so the ad-hoc and indexed paths can never drift.

No reference counterpart: pyhctsa has no search surface (SURVEY §2.0);
this is training-data-pipeline infrastructure.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyhctsa_spark.operators.search import BM25_B, BM25_K1, _doc_words

_META = "_search_meta.json"


def _bucket_expr(term_col, n_buckets: int):
    """Non-negative stable bucket for a term: pmod(xxhash64(term), n).

    xxhash64 is a Spark built-in (same seed everywhere), so the probe
    side can compute the SAME bucket ids for its literal query terms
    driver-side via a 1-row select — no Python reimplementation that
    could drift from the JVM's hash.
    """
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _term_buckets(spark: SparkSession, terms: list[str], n_buckets: int) -> list[int]:
    """Bucket ids for literal query terms, computed BY Spark (one local
    1-row job) so they are bit-identical to the index's own bucketing."""
    row = spark.range(1).select(
        *[
            _bucket_expr(F.lit(t), n_buckets).alias(f"b{i}")
            for i, t in enumerate(terms)
        ]
    ).head()
    return sorted({int(v) for v in row})


def _swap_names(d: str) -> tuple[str, str]:
    parent, base = os.path.dirname(d), os.path.basename(d)
    return (
        os.path.join(parent, f"_compact_tmp.{base}"),
        os.path.join(parent, f"_compact_old.{base}"),
    )


def _recover_index(path: str) -> None:
    """Repair a crashed swap, same protocol as dedup_index._recover_index:
    old-without-live -> restore, then drop any tmp/old leftovers."""
    for table in ("postings", "df", "stats"):
        d = os.path.join(path, table)
        tmp, old = _swap_names(d)
        if os.path.exists(old) and not os.path.exists(d):
            os.rename(old, d)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)


def _swap_in(spark_df: DataFrame, d: str, partition_col: str | None = None) -> None:
    """Write ``spark_df`` to a tmp sibling, then atomically (two renames)
    replace ``d`` with it. Single-writer convention, crash-recoverable
    by _recover_index."""
    tmp, old = _swap_names(d)
    w = spark_df.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    if os.path.exists(d):
        os.rename(d, old)
    os.rename(tmp, d)
    if os.path.exists(old):
        shutil.rmtree(old)


def _postings(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """(term_bucket, term, doc_id, tf, dl) for a document batch. The
    groupBy's partial (map-side) aggregation collapses token occurrences
    to distinct (term, doc) before the exchange."""
    return (
        _doc_words(df, text_col, id_col)
        .select("doc_id", "dl", F.explode("_w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
        .select(
            _bucket_expr(F.col("term"), n_buckets).alias("term_bucket"),
            "term",
            "doc_id",
            "tf",
            "dl",
        )
    )


def _df_from_postings(postings: DataFrame) -> DataFrame:
    return postings.groupBy("term_bucket", "term").agg(
        F.count("*").alias("df_t")
    )


def _stats_from_base(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus constants, stored as exact integer SUMS so append merges
    are associative: n_docs = every doc (idf's N, NULL text included),
    n_dl / sum_dl = docs with a tokenizable text (avg(dl) semantics:
    avgdl = sum_dl / n_dl). Matches search.bm25_topk's
    ``agg(count(*), avg(dl))`` exactly."""
    return _doc_words(df, text_col, id_col).agg(
        F.count("*").alias("n_docs"),
        F.count("dl").alias("n_dl"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )


def _stats_from_postings(postings: DataFrame) -> DataFrame:
    """Corpus constants recomputed from the postings (compaction path):
    one row per doc is (doc_id, dl) after dedup. A NULL-text doc has no
    postings, so it leaves n_docs on recompute — documented compaction
    caveat (tokenizable docs, the only kind that can score, are exact)."""
    return (
        postings.select("doc_id", "dl")
        .dropDuplicates(["doc_id"])
        .agg(
            F.count("*").alias("n_docs"),
            F.count("*").alias("n_dl"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
        )
    )


def build_search_index(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> dict:
    """Index ``df`` under ``path``; returns the meta dict.

    One corpus pass builds the postings; df/ and stats/ are projections
    of it (the postings table is persisted across the three writes so
    the explode runs once). Within each term_bucket partition the files
    are sorted by term, so a query's ``term IN (...)`` predicate prunes
    parquet row groups below the partition pruning.

    Stats are computed from the BASE table, not the postings, so NULL-
    text docs (no postings) still count toward idf's N exactly as the
    ad-hoc ``bm25_topk`` counts them.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    post = _postings(df, text_col, id_col, n_buckets).persist()
    (
        post.repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    _df_from_postings(post).repartition("term_bucket").write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(os.path.join(path, "df"))
    _stats_from_base(df, text_col, id_col).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "stats"))
    post.unpersist()
    meta = {
        "n_buckets": int(n_buckets),
        "tokenizer": "whitespace",
        "id_type": df.select(id_col).schema[0].dataType.simpleString(),
    }
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh)
    return meta


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def _postings_schema(meta: dict) -> str:
    return (
        f"term string, doc_id {meta['id_type']}, tf bigint, dl int, "
        "term_bucket int"
    )


def _read_or_empty(spark: SparkSession, d: str, schema: str) -> DataFrame:
    """Read a table dir, falling back to an empty frame with the known
    schema. A partitionBy write of ZERO rows leaves only _SUCCESS (no
    part files), so an index bootstrapped over an empty corpus — the
    from-nothing streaming start — is unreadable by schema inference."""
    try:
        return spark.read.parquet(d)
    except Exception:
        return spark.createDataFrame([], schema)


def query_search_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k BM25 over the index: same scoring (and the same
    (score6 DESC, doc_id ASC) tie order) as ``search.bm25_topk``, but
    the scan is pruned to the query's term buckets.

    Plan shape (asserted in tests): the postings scan shows
    ``PartitionFilters: [term_bucket IN (...)]`` — only ≤|q| of the
    index's buckets are read; df_t and stats are broadcast; top-k is
    TakeOrderedAndProject. Nothing in the plan scales with corpus size
    except the pruned bucket scan itself.
    """
    _recover_index(path)
    meta = read_index_meta(path)
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_search_index needs at least one query term")
    buckets = _term_buckets(spark, terms, meta["n_buckets"])

    post = _read_or_empty(
        spark, os.path.join(path, "postings"), _postings_schema(meta)
    ).where(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
    # df rows are per-batch PARTIALS — sum them (pruned read: ≤|q|
    # buckets, then ≤|q| grouped rows)
    dft = (
        _read_or_empty(
            spark,
            os.path.join(path, "df"),
            "term string, df_t bigint, term_bucket int",
        )
        .where(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("df_t").cast("long").alias("df_t"))
    )
    stats = spark.read.parquet(os.path.join(path, "stats")).select(
        "n_docs",
        (
            F.col("sum_dl").cast("double")
            / F.nullif(F.col("n_dl"), F.lit(0)).cast("double")
        ).alias("avgdl"),
    )

    from pyspark.sql import Window

    k1c = F.lit(float(k1)).cast("double")
    bc = F.lit(float(b)).cast("double")
    one = F.lit(1.0).cast("double")
    half = F.lit(0.5).cast("double")
    idf = F.log(
        one
        + (F.col("n_docs") - F.col("df_t") + half) / (F.col("df_t") + half)
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1c + one)
        / (
            F.col("tf")
            + k1c
            * (one - bc + bc * F.col("dl") / F.nullif(F.col("avgdl"), F.lit(0.0)))
        )
    )
    scored = (
        post.join(F.broadcast(dft), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("score6"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    top = scored.orderBy(F.col("score6").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score6").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score6", "n_terms_hit"
    )


def append_to_search_index(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Add a document batch. Delta-proportional in every table: the
    batch's postings and its df PARTIALS append into the partition
    layout (no rewrite of any existing file); only the 1-row ``stats``
    merges through a crash-recoverable swap.

    Caller contract (same as the MinHash index): ids not already
    present. A replayed append duplicates (term, doc) rows and df
    partials — ``compact_search_index`` repairs both.
    """
    _recover_index(path)
    meta = read_index_meta(path)
    spark = df.sparkSession
    nb = int(meta["n_buckets"])

    post = _postings(df, text_col, id_col, nb).persist()
    (
        post.repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode("append")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    # df: append the DELTA's partial counts only — readers sum
    # partials, so the vocabulary-sized table is never rewritten here
    _df_from_postings(post).repartition("term_bucket").write.mode(
        "append"
    ).partitionBy("term_bucket").parquet(os.path.join(path, "df"))

    d_stats_row = _stats_from_base(df, text_col, id_col).head()
    old_stats = spark.read.parquet(os.path.join(path, "stats")).head()
    from pyhctsa_spark.operators._local_df import one_slice_df

    merged_stats = one_slice_df(
        spark,
        [
            (
                int(old_stats["n_docs"]) + int(d_stats_row["n_docs"]),
                int(old_stats["n_dl"]) + int(d_stats_row["n_dl"]),
                int(old_stats["sum_dl"]) + int(d_stats_row["sum_dl"]),
            )
        ],
        "n_docs long, n_dl long, sum_dl long",
    )
    _swap_in(merged_stats, os.path.join(path, "stats"))
    post.unpersist()


def compact_search_index(
    spark: SparkSession,
    path: str,
    drop_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> dict:
    """Rewrite the index in place: de-duplicate rows left by replayed
    appends and, when ``drop_ids`` is given, ERASE those documents from
    searchability (the governance sibling of operators/deletion.py).
    df/ and stats/ are RECOMPUTED from the surviving postings, so a
    compacted index is self-consistent whatever state appends left it
    in. Atomic per table via the tmp/old swap.

    Returns {"postings": (rows_before, rows_after)}.

    Note: after an erasure, stats (and so every score) reflect the
    surviving corpus — the indexed path keeps matching an ad-hoc
    ``bm25_topk`` over the erased base table, which is the invariant
    that matters.
    """
    _recover_index(path)
    meta = read_index_meta(path)
    d = os.path.join(path, "postings")
    post = _read_or_empty(spark, d, _postings_schema(meta))
    before = post.count()
    clean = post.dropDuplicates(["term", "doc_id"])
    if drop_ids is not None:
        drops = F.broadcast(
            drop_ids.select(F.col(id_col).alias("doc_id")).distinct()
        )
        clean = clean.join(drops, "doc_id", "left_anti")
    # eager checkpoint severs lineage from the OLD postings directory —
    # the swap below renames it away, so clean must never recompute
    clean = clean.select(
        "term_bucket", "term", "doc_id", "tf", "dl"
    ).localCheckpoint(eager=True)
    after = clean.count()

    _swap_in(
        clean.repartition("term_bucket").sortWithinPartitions("term"),
        d,
        partition_col="term_bucket",
    )
    _swap_in(
        _df_from_postings(clean).repartition("term_bucket"),
        os.path.join(path, "df"),
        partition_col="term_bucket",
    )
    _swap_in(
        _stats_from_postings(clean).coalesce(1),
        os.path.join(path, "stats"),
    )
    from pyhctsa_spark.operators.dedup import _release_local_checkpoint

    _release_local_checkpoint(clean)
    return {"postings": (int(before), int(after))}
