"""Chunk compaction for the (tier, chunk)-partitioned rollup store.

The other half of the chunk lifecycle (retention.py drops expired
chunks; this merges fragmented live ones). At 10^12 sequences the
chunked store accretes small files — every micro-batch / salt-bucket /
restart appends its own parquet part — and small files are the classic
scan killer: a 100 TB store made of 4 MB parts costs ~25M file opens
per full scan and swamps the NameNode/object-store listing.

Design (mirrors TimescaleDB ``compress_chunk`` / Iceberg ``rewrite_data_files``):

- Compaction unit = one (tier, chunk) partition directory — the same
  unit retention evicts, so the two never race across units.
- Candidate selection is METADATA-ONLY: a chunk qualifies when it has
  more than ``target_files`` parts AND at least one part below
  ``small_bytes`` (few-but-large parts are healthy and left alone).
  No parquet file is opened to decide.
- Rewrite is per-chunk and idempotent: read the chunk, sort by
  (doc_id, window_idx) for run-clustered scans downstream, coalesce to
  ``target_files``, write to a HIDDEN ``_compact_tmp...`` sibling
  (underscore-prefixed, so Spark partition discovery and _chunk_dirs
  never see it), then swap directories. A crash before the swap leaves
  the original intact; after it, the compacted version; in the brief
  two-rename window, ``_recover_chunk`` restores the original on the
  next invocation.
- Every rewrite appends a lineage row (tier, chunk, files/bytes before
  and after, rows, wall) to ``_compaction_log`` under the store, the
  same audit contract as ``_retention_log``.

On a cluster, chunks compact independently (one job per chunk here for
sandbox simplicity; a driver loop over chunks is fine because each
chunk rewrite is itself a distributed job — the driver only sequences
metadata). Sorting within a chunk costs one local sort per output file,
not a global shuffle.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyhctsa_spark.operators.retention import _chunk_dirs

_LOG_SCHEMA = (
    "tier int, chunk long, files_before long, bytes_before long, "
    "files_after long, bytes_after long, rows long, compacted_at double"
)


def _parquet_parts(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def _swap_names(d: str) -> tuple[str, str]:
    """Hidden tmp/old sibling names for the atomic swap: underscore
    prefix on the BASENAME, so neither Spark partition discovery nor
    retention's _chunk_dirs (which match 'chunk=' prefixes) can ever
    see a half-swapped directory as a live chunk."""
    parent, base = os.path.dirname(d), os.path.basename(d)
    return (
        os.path.join(parent, f"_compact_tmp.{base}"),
        os.path.join(parent, f"_compact_old.{base}"),
    )


def _recover_chunk(d: str) -> None:
    """Repair leftovers from a compaction crash. States possible:
    tmp exists (crash before swap) -> drop it; old exists and d
    missing (crash between the two renames) -> restore the original;
    old exists and d exists (crash before cleanup) -> drop old."""
    tmp, old = _swap_names(d)
    if os.path.exists(old) and not os.path.exists(d):
        os.rename(old, d)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def _recover_store(path: str) -> None:
    """Sweep every tier directory for swap leftovers. Needed because a
    chunk that crashed between the two renames has NO live ``chunk=``
    directory, so candidate listing alone would never find it."""
    if not os.path.isdir(path):
        return
    for tdir in os.listdir(path):
        if not tdir.startswith("tier="):
            continue
        tpath = os.path.join(path, tdir)
        for e in os.listdir(tpath):
            if e.startswith(("_compact_tmp.", "_compact_old.")):
                live = os.path.join(tpath, e.split(".", 1)[1])
                _recover_chunk(live)


def _part_stats(d: str) -> tuple[int, int]:
    """(n_parts, bytes) over DATA files only — markers like _SUCCESS
    are excluded so before/after lineage compares like with like."""
    parts = _parquet_parts(d)
    return len(parts), sum(os.path.getsize(p) for p in parts)


def compaction_candidates(
    path: str, target_files: int = 1, small_bytes: int = 8 * 1024 * 1024
) -> list[tuple[int, int, str]]:
    """(tier, chunk, dir) for every chunk that compaction can improve:
    more parts than ``target_files`` AND at least one part below
    ``small_bytes``. A chunk already at/under the target part count is
    never a candidate (merging cannot reduce it further), and a chunk
    of few-but-LARGE parts is deliberately left alone — rewriting
    healthy gigabyte files buys nothing and costs a full chunk rewrite.
    Decided from directory listings only — no data file is opened."""
    out = []
    for tier, chunks in sorted(_chunk_dirs(path).items()):
        for chunk, d in sorted(chunks.items()):
            parts = _parquet_parts(d)
            if len(parts) > target_files and any(
                os.path.getsize(p) < small_bytes for p in parts
            ):
                out.append((tier, chunk, d))
    return out


def compact_chunks_bulk(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    small_bytes: int = 8 * 1024 * 1024,
    sort_cols: tuple[str, ...] = ("doc_id", "window_idx"),
) -> list[dict]:
    """ONE Spark job compacting every fragmented chunk at once.

    The per-chunk loop in ``compact_chunks`` sequences one job per
    chunk — right for dozens of candidates, wrong for the 10^5 a
    day-old ingest backlog can fragment. Here all candidates are read
    in a single scan, repartitioned on (tier, chunk) so each chunk's
    rows land in exactly one task (one output part per chunk dir),
    locally sorted, and written back with DYNAMIC partition overwrite —
    which stages in _temporary and replaces only the listed partitions
    at job commit, so a crash mid-job leaves every original chunk
    intact (stronger than the loop's per-chunk swap). Lineage rows are
    appended to the same ``_compaction_log``.
    """
    _recover_store(path)
    cands = compaction_candidates(path, target_files, small_bytes)
    if not cands:
        return []
    before = {(t, c): _part_stats(d) for t, c, d in cands}
    paths = [d for _t, _c, d in cands]
    df = (
        spark.read.option("basePath", path).parquet(*paths)
    )
    present = [c for c in sort_cols if c in df.columns]
    out = df.repartition("tier", "chunk")
    if present:
        out = out.sortWithinPartitions(*present)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("tier", "chunk").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    now = time.time()
    rows = []
    for (t, c), (fb, bb) in sorted(before.items()):
        fa, ba = _part_stats(
            os.path.join(path, f"tier={t}", f"chunk={c}")
        )
        rows.append({
            "tier": t, "chunk": c,
            "files_before": fb, "bytes_before": bb,
            "files_after": fa, "bytes_after": ba,
            "rows": -1,  # not re-counted in bulk mode (one job, no per-
            #              chunk action); -1 marks "not recorded"
            "compacted_at": now,
        })
    from pyhctsa_spark.operators._local_df import one_slice_df

    (
        one_slice_df(spark, rows, _LOG_SCHEMA)
        .write.mode("append")
        .parquet(os.path.join(path, "_compaction_log"))
    )
    return rows


def compact_chunks(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    small_bytes: int = 8 * 1024 * 1024,
    sort_cols: tuple[str, ...] = ("doc_id", "window_idx"),
) -> list[dict]:
    """Rewrite every fragmented (tier, chunk) partition into
    ``target_files`` sorted parquet parts; append lineage to
    ``<path>/_compaction_log``. Returns the lineage rows.

    Idempotent: a second invocation finds no candidates and is a no-op.
    Per-chunk jobs — use ``compact_chunks_bulk`` when the candidate
    count is large (one job for all chunks).
    """
    _recover_store(path)
    rows: list[dict] = []
    for tier, chunk, d in compaction_candidates(path, target_files, small_bytes):
        files_before, bytes_before = _part_stats(d)
        df = spark.read.parquet(d)
        present = [c for c in sort_cols if c in df.columns]
        if present:
            # sortWithinPartitions after coalesce = one local sort per
            # output file; no shuffle enters the plan
            df = df.coalesce(target_files).sortWithinPartitions(*present)
        else:
            df = df.coalesce(target_files)
        tmp, old = _swap_names(d)
        df.write.mode("overwrite").parquet(tmp)
        n_rows = spark.read.parquet(tmp).count()
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
        files_after, bytes_after = _part_stats(d)
        rows.append({
            "tier": tier,
            "chunk": chunk,
            "files_before": files_before,
            "bytes_before": bytes_before,
            "files_after": files_after,
            "bytes_after": bytes_after,
            "rows": n_rows,
            "compacted_at": time.time(),
        })
    if rows:
        from pyhctsa_spark.operators._local_df import one_slice_df

        (
            one_slice_df(spark, rows, _LOG_SCHEMA)
            .write.mode("append")
            .parquet(os.path.join(path, "_compaction_log"))
        )
    return rows


def compaction_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "_compaction_log"))
