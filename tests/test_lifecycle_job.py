"""Chunk-lifecycle job: retention-then-compaction under the spark-submit
CLI contract, watermark derivation, and --retain spec parsing."""

import sys

from pyspark.sql import functions as F

from pyhctsa_spark.operators.retention import (
    read_tier_chunked,
    tier_watermarks,
    write_tier_chunked,
)


def _store(spark, path, n_docs=4, n_w0=256, n_parts=6):
    rows = []
    for d in range(n_docs):
        for t, ratio in ((0, 1), (1, 16)):
            for w in range(n_w0 // ratio):
                rows.append((f"doc{d}", t, w, float(w)))
    df = spark.createDataFrame(
        rows, "doc_id string, tier int, window_idx long, mean double"
    )
    # fragment deliberately: many parts per chunk dir
    (
        df.withColumn("chunk", (F.col("window_idx") / F.lit(64)).cast("long"))
        .repartition(n_parts)
        .write.mode("overwrite")
        .partitionBy("tier", "chunk")
        .parquet(path)
    )


def test_tier_watermarks_reads_only_newest_chunk(spark, tmp_path):
    path = str(tmp_path / "store")
    _store(spark, path)
    wm = tier_watermarks(spark, path)
    assert wm == {0: 255, 1: 15}


def test_parse_retain():
    sys.path.insert(0, "/root/repo/jobs")
    from lifecycle_job import parse_retain

    assert parse_retain("0:168,1:2160,2:keep") == {0: 168, 1: 2160, 2: None}


def test_lifecycle_job_cli_end_to_end(spark, tmp_path, capsys):
    import json

    path = str(tmp_path / "store")
    _store(spark, path)
    sys.path.insert(0, "/root/repo/jobs")
    import lifecycle_job

    # tier-0 horizon 128 windows, watermark 255 -> chunks 0,1 evicted;
    # the 2 surviving tier-0 chunks + tier-1 chunk 0 then compact
    rc = lifecycle_job.main([
        "--store", path,
        "--retain", "0:128,1:keep",
        "--chunk-windows", "64",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["evicted_chunks"] == 2
    assert out["bytes_reclaimed"] > 0
    assert out["compacted_chunks"] == 3
    assert out["files_removed"] > 0
    survivors = read_tier_chunked(spark, path)
    assert survivors.where("tier = 0").agg(
        F.min("window_idx")).first()[0] == 128
    # second run: nothing to evict, nothing to compact
    rc = lifecycle_job.main([
        "--store", path, "--retain", "0:128,1:keep",
        "--chunk-windows", "64",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["evicted_chunks"] == 0
    assert out["compacted_chunks"] == 0
