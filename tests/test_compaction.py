"""Chunk compaction: candidate selection, data-identity, lineage,
idempotence, and interop with retention + partition pruning."""

import os

from pyspark.sql import functions as F

from pyhctsa_spark.operators.compaction import (
    compact_chunks,
    compaction_candidates,
    compaction_log,
)
from pyhctsa_spark.operators.retention import (
    RetentionPolicy,
    apply_retention,
    read_tier_chunked,
)


def _fragmented_store(spark, path, n_docs=4, n_w0=256, n_parts=8):
    """Write a (tier, chunk) store where every chunk has n_parts files."""
    rows = []
    for d in range(n_docs):
        for t, ratio in ((0, 1), (1, 16)):
            for w in range(n_w0 // ratio):
                rows.append((f"doc{d}", t, w, float(w) * (d + 1)))
    df = spark.createDataFrame(
        rows, "doc_id string, tier int, window_idx long, mean double"
    ).withColumn("chunk", (F.col("window_idx") / F.lit(64)).cast("long"))
    (
        df.repartition(n_parts)  # force many small parts per partition dir
        .write.mode("overwrite")
        .partitionBy("tier", "chunk")
        .parquet(path)
    )
    return df


def test_compaction_merges_parts_preserves_data(spark, tmp_path):
    path = str(tmp_path / "store")
    _fragmented_store(spark, path, n_parts=8)
    before = read_tier_chunked(spark, path)
    before_pd = before.orderBy("tier", "doc_id", "window_idx").toPandas()
    cands = compaction_candidates(path, target_files=1)
    # tier 0: chunks 0..3, tier 1: chunk 0 — all fragmented
    assert len(cands) == 5
    rows = compact_chunks(spark, path, target_files=1)
    assert len(rows) == 5
    for r in rows:
        assert r["files_before"] > 1
        assert r["files_after"] == 1
        assert r["rows"] > 0
    # data identical after the rewrite (values AND partition columns)
    after_pd = (
        read_tier_chunked(spark, path)
        .orderBy("tier", "doc_id", "window_idx")
        .toPandas()
    )
    assert before_pd[["doc_id", "tier", "window_idx", "mean"]].equals(
        after_pd[["doc_id", "tier", "window_idx", "mean"]]
    )
    # lineage log complete
    log = compaction_log(spark, path).toPandas()
    assert len(log) == 5
    assert (log.files_after == 1).all()
    # idempotent: nothing left to compact
    assert compaction_candidates(path, target_files=1) == []
    assert compact_chunks(spark, path, target_files=1) == []


def test_compacted_chunk_is_sorted_within_file(spark, tmp_path):
    path = str(tmp_path / "store")
    _fragmented_store(spark, path, n_parts=8)
    compact_chunks(spark, path, target_files=1)
    # read ONE physical file raw: rows must be clustered by (doc_id,
    # window_idx) for run-friendly downstream scans
    tier0chunk0 = os.path.join(path, "tier=0", "chunk=0")
    part = [
        f for f in os.listdir(tier0chunk0) if f.endswith(".parquet")
    ][0]
    pdf = spark.read.parquet(os.path.join(tier0chunk0, part)).toPandas()
    assert (
        pdf.sort_values(["doc_id", "window_idx"]).reset_index(drop=True)
        .equals(pdf.reset_index(drop=True))
    )


def test_compaction_then_retention_lifecycle(spark, tmp_path):
    """The full chunk lifecycle on one store: fragment -> compact ->
    evict; pruning still reaches the scan afterwards."""
    path = str(tmp_path / "store")
    _fragmented_store(spark, path, n_parts=6)
    compact_chunks(spark, path, target_files=1)
    policy = RetentionPolicy(horizons={0: 128, 1: None}, chunk_windows=64)
    evicted = apply_retention(
        spark, path, policy, watermark_widx={0: 255, 1: 15}
    )
    assert sorted(e["chunk"] for e in evicted) == [0, 1]
    df = read_tier_chunked(spark, path).where("tier = 0 AND chunk = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert df.count() == 64 * 4


def test_bulk_compaction_one_job_preserves_data(spark, tmp_path):
    from pyhctsa_spark.operators.compaction import compact_chunks_bulk

    path = str(tmp_path / "store")
    _fragmented_store(spark, path, n_parts=8)
    before_pd = (
        read_tier_chunked(spark, path)
        .orderBy("tier", "doc_id", "window_idx").toPandas()
    )
    rows = compact_chunks_bulk(spark, path, target_files=1)
    assert len(rows) == 5
    assert all(r["files_after"] == 1 for r in rows)
    assert all(r["files_before"] > 1 for r in rows)
    after_pd = (
        read_tier_chunked(spark, path)
        .orderBy("tier", "doc_id", "window_idx").toPandas()
    )
    cols = ["doc_id", "tier", "window_idx", "mean"]
    assert before_pd[cols].equals(after_pd[cols])
    # idempotent
    assert compact_chunks_bulk(spark, path, target_files=1) == []


def test_compaction_crash_recovery_all_windows(spark, tmp_path):
    """Simulated crash states around the swap: leftover tmp, leftover
    old with live dir, and the worst case — live dir missing entirely
    (between the two renames). All must repair on the next invocation
    with no data loss and no chunk= parse breakage."""
    import os
    import shutil

    from pyhctsa_spark.operators.compaction import _swap_names

    path = str(tmp_path / "store")
    _fragmented_store(spark, path, n_parts=4)
    before = (
        read_tier_chunked(spark, path)
        .orderBy("tier", "doc_id", "window_idx").toPandas()
    )
    d0 = os.path.join(path, "tier=0", "chunk=0")
    d1 = os.path.join(path, "tier=0", "chunk=1")
    d2 = os.path.join(path, "tier=0", "chunk=2")
    tmp0, _ = _swap_names(d0)
    _, old1 = _swap_names(d1)
    _, old2 = _swap_names(d2)
    shutil.copytree(d0, tmp0)       # crash before swap
    shutil.copytree(d1, old1)       # crash before cleanup
    os.rename(d2, old2)             # crash BETWEEN the renames
    # the store still reads (hidden _ dirs are invisible to Spark) and
    # retention's _chunk_dirs does not choke on the leftovers
    from pyhctsa_spark.operators.retention import _chunk_dirs

    assert 2 not in _chunk_dirs(path)[0]  # d2 is mid-swap, not live
    rows = compact_chunks(spark, path, target_files=1)
    assert rows  # recovery happened, then compaction proceeded
    after = (
        read_tier_chunked(spark, path)
        .orderBy("tier", "doc_id", "window_idx").toPandas()
    )
    cols = ["doc_id", "tier", "window_idx", "mean"]
    assert before[cols].equals(after[cols])
    # no leftovers remain anywhere
    for tdir in os.listdir(path):
        if tdir.startswith("tier="):
            assert not any(
                e.startswith("_compact")
                for e in os.listdir(os.path.join(path, tdir))
            )
