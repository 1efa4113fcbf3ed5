"""Backfill: store after targeted recompute == from-scratch rebuild of
the corrected corpus, bit-for-bit; untouched docs' rows unaffected."""

import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.backfill import backfill_docs
from pyhctsa_spark.operators.quantile_rollup import rollup_quantile_tiers
from pyhctsa_spark.operators.retention import write_tier_chunked


def _roll(seq):
    return rollup_quantile_tiers(seq, window=8, group=4, n_tiers=2)


@pytest.fixture()
def corpus(spark):
    from pyhctsa_spark.sources.synthetic import sequences_df

    return sequences_df(spark, 20, binary=True).cache()


def _rows(df):
    return sorted(
        (r["doc_id"], r["tier"], r["window_idx"], r["n"], r["n_distinct"],
         r["mode_tok"], r["p50"], bytes(r["hist_bin"]))
        for r in df.collect()
    )


def test_backfill_equals_full_rebuild(spark, corpus, tmp_path):
    store = str(tmp_path / "store")
    write_tier_chunked(_roll(corpus), store, chunk_windows=16)

    # "corrected" corpus: two docs get different tokens
    fixed = [r["doc_id"] for r in
             corpus.select("doc_id").orderBy("doc_id").limit(2).collect()]
    corrected = corpus.withColumn(
        "tokens_bin",
        F.when(
            F.col("doc_id").isin(fixed),
            F.reverse(F.col("tokens_bin")),
        ).otherwise(F.col("tokens_bin")),
    )
    info = backfill_docs(spark, store, corrected, fixed, _roll,
                         chunk_windows=16)
    assert info["rows_deleted"] > 0 and info["rows_appended"] > 0

    rebuilt = str(tmp_path / "rebuild")
    write_tier_chunked(_roll(corrected), rebuilt, chunk_windows=16)
    assert _rows(spark.read.parquet(store)) == \
           _rows(spark.read.parquet(rebuilt))


def test_backfill_noop_on_empty_ids(spark, corpus, tmp_path):
    store = str(tmp_path / "store2")
    write_tier_chunked(_roll(corpus), store, chunk_windows=16)
    before = _rows(spark.read.parquet(store))
    info = backfill_docs(spark, store, corpus, [], _roll)
    assert info == {"rows_deleted": 0, "rows_appended": 0,
                    "touched_chunks": []}
    assert _rows(spark.read.parquet(store)) == before
