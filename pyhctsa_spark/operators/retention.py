"""Retention-policy executor over time-chunked rollup tiers.

The missing third of "rollup + downsample + retention": actually aging
data OUT. The design constraint at 10^12 sequences is that eviction
must be a METADATA operation — dropping whole time-chunks — never a
row-level rewrite (a DELETE that rewrites 100 TB of parquet to expire
1% of it is a non-starter). This is the same chunk-drop model as
TimescaleDB's `drop_chunks` / Iceberg's partition-level delete:

- ``write_tier_chunked`` materializes a rollup tier partitioned by
  ``(tier, chunk)`` where ``chunk = window_idx // chunk_windows``.
  Directory-level partitioning gives readers free partition pruning
  (a window_idx range filter never opens expired-adjacent chunks) and
  gives retention a whole-directory unit of deletion.
- ``apply_retention`` evicts every chunk strictly older than the
  per-tier horizon. Expiry is decided from partition VALUES (directory
  names) — no data files are opened. Each eviction appends a lineage
  row (tier, chunk, files, bytes, row estimate, watermark, wall time)
  to a ``_retention_log`` parquet under the store, so an auditor can
  reconstruct what was dropped when, and counters mirror the flagship
  rollup's per-partition lineage contract.
- Cascade-before-evict guard: tier k chunks may only be dropped if the
  coarser tier k+1 already COVERS their window range (the
  cascade_from_store output exists) — otherwise the summary of that
  period would be lost forever. ``force=True`` overrides (terminal
  tier / deliberate data deletion).

On a real warehouse the same executor maps 1:1 onto Iceberg
``DROP PARTITION`` / snapshot expiry; plain parquet directories are the
sandbox stand-in. Policy horizons are expressed in WINDOWS of the
tier's own resolution, so one policy object covers every tier: e.g.
{0: 7 * 24, 1: 90 * 24, 2: None} keeps 7 days of raw hourly windows,
90 days of 16x windows, and the 256x tier forever.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

_LOG_SCHEMA = (
    "tier int, chunk long, n_files long, bytes long, "
    "watermark_widx long, horizon_windows long, evicted_at double"
)


@dataclass
class RetentionPolicy:
    """Per-tier horizons in windows of that tier's own resolution.

    ``horizons[tier] = None`` (or a missing tier) means keep forever.
    ``chunk_windows`` must match the layout written by
    ``write_tier_chunked``.
    """

    horizons: dict[int, int | None] = field(default_factory=dict)
    chunk_windows: int = 64
    tier_ratio: int = 16  # windows per parent window (1x -> 16x -> 256x)

    def cutoff_chunk(self, tier: int, watermark_widx: int) -> int | None:
        """First chunk that must be KEPT for ``tier`` given the current
        high-watermark window index; chunks strictly below it expire.
        None = nothing expires."""
        horizon = self.horizons.get(tier)
        if horizon is None:
            return None
        keep_from_widx = watermark_widx - int(horizon) + 1
        if keep_from_widx <= 0:
            return None
        # a chunk expires only when EVERY window in it is older than the
        # horizon: chunk_end = (c+1)*cw - 1 < keep_from_widx, i.e.
        # c < keep_from_widx // cw. (ceil here would over-evict the
        # boundary chunk when the horizon lands mid-chunk — its tail
        # windows are still live.)
        return keep_from_widx // self.chunk_windows


def write_tier_chunked(
    tier_df: DataFrame, path: str, chunk_windows: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize rollup tiers partitioned by (tier, chunk).

    ``chunk = window_idx // chunk_windows`` — the retention unit AND the
    pruning unit. Size it so one chunk is O(100 MB-1 GB) per tier at
    cluster scale (bigger chunks = fewer partitions to track, coarser
    eviction granularity).

    ``mode="append"`` is the incremental-ingest path: fresh windows land
    in fresh chunk directories (time moves forward), so appends never
    rewrite history; the small files they accrete are the compaction
    operator's job, and retention ages them out chunk-wise like any
    other data.

    Rows are sorted (doc_id, window_idx) within each write task so
    parquet row-group min/max statistics on doc_id are TIGHT — a
    doc-targeted read (deletion.delete_docs probe, per-doc backfill)
    then skips most row groups instead of scanning every chunk. Same
    zone-map discipline as compaction's in-partition sort."""
    keyed = tier_df.withColumn(
        "chunk",
        (F.col("window_idx") / F.lit(int(chunk_windows))).cast("long"),
    )
    sort_cols = [c for c in ("doc_id", "window_idx") if c in keyed.columns]
    if sort_cols:
        keyed = keyed.sortWithinPartitions(*sort_cols)
    keyed.write.mode(mode).partitionBy("tier", "chunk").parquet(path)


def read_tier_chunked(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _chunk_dirs(path: str) -> dict[int, dict[int, str]]:
    """{tier: {chunk: dir}} from the partition directory names only —
    no parquet file is opened."""
    out: dict[int, dict[int, str]] = {}
    for tdir in os.listdir(path):
        if not tdir.startswith("tier="):
            continue
        tier = int(tdir.split("=", 1)[1])
        tpath = os.path.join(path, tdir)
        for cdir in os.listdir(tpath):
            if not cdir.startswith("chunk="):
                continue
            chunk = int(cdir.split("=", 1)[1])
            out.setdefault(tier, {})[chunk] = os.path.join(tpath, cdir)
    return out


def _dir_stats(d: str) -> tuple[int, int]:
    n_files = n_bytes = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            n_files += 1
            n_bytes += os.path.getsize(os.path.join(root, f))
    return n_files, n_bytes


def tier_watermarks(spark: SparkSession, path: str) -> dict[int, int]:
    """{tier: max window_idx} read from the NEWEST chunk of each tier
    only — partition pruning keeps this O(one chunk) per tier no matter
    how large the store is, so deriving watermarks stays metadata-cheap
    even at 10^12 sequences."""
    out: dict[int, int] = {}
    for tier, chunks in _chunk_dirs(path).items():
        newest = chunks[max(chunks)]
        wm = (
            spark.read.parquet(newest)
            .agg(F.max("window_idx").alias("m"))
            .first()["m"]
        )
        if wm is not None:
            out[tier] = int(wm)
    return out


def apply_retention(
    spark: SparkSession,
    path: str,
    policy: RetentionPolicy,
    watermark_widx: dict[int, int],
    force: bool = False,
) -> list[dict]:
    """Evict expired chunks; append lineage to ``<path>/_retention_log``.

    ``watermark_widx[tier]`` is the tier's current high-watermark window
    index (normally max(window_idx) of fresh ingest — passed in, not
    scanned, so the executor itself touches only directory metadata).

    Guard: a tier's chunks are dropped only when the NEXT tier's chunks
    cover the same window range (its last chunk index, scaled by the
    16x tier ratio, reaches past the evicted range) — the
    cascade-before-evict invariant. ``force=True`` skips the check.

    Returns the lineage rows for this invocation.
    """
    layout = _chunk_dirs(path)
    now = time.time()
    # PLAN phase: evaluate every tier's cutoff AND its cascade guard
    # before deleting anything — a guard failure on a later tier must
    # abort the whole run with zero directories removed (otherwise the
    # earlier tiers' data would be gone before the log is written, and
    # the audit contract breaks)
    plan: list[tuple[int, int, list[int]]] = []
    for tier, chunks in sorted(layout.items()):
        wm = watermark_widx.get(tier)
        if wm is None:
            continue
        cut = policy.cutoff_chunk(tier, wm)
        if cut is None:
            continue
        doomed = sorted(c for c in chunks if c < cut)
        if not doomed:
            continue
        if not force:
            nxt = layout.get(tier + 1)
            if nxt is None:
                raise ValueError(
                    f"retention would drop tier {tier} chunks {doomed} but "
                    f"no coarser tier {tier + 1} exists to cover them — "
                    "run the cascade first or pass force=True"
                )
            # tier t+1 windows are tier_ratio x coarser: evicting tier-t
            # windows [0, W) needs tier t+1 coverage up to (W-1)//ratio.
            # Coverage is judged from partition VALUES (a present chunk
            # directory), a deliberately coarse metadata-only check.
            r = policy.tier_ratio
            need_widx = (cut * policy.chunk_windows - 1) // r
            have_widx = (max(nxt) + 1) * policy.chunk_windows - 1
            if have_widx < need_widx:
                raise ValueError(
                    f"retention would drop tier {tier} windows up to "
                    f"{cut * policy.chunk_windows - 1} but tier {tier + 1} "
                    f"only covers window_idx <= {have_widx} "
                    f"(need >= {need_widx}) — cascade before evicting"
                )
        plan.append((tier, wm, doomed))
    # EXECUTE phase: every guard passed. The audit row for each chunk
    # is written BEFORE its directory is removed — a crash mid-run can
    # leave a logged-but-still-present chunk (harmless: re-running the
    # policy evicts it again, and apply_retention tolerates duplicate
    # log rows), but never a deleted chunk with no audit record.
    evicted: list[dict] = []
    for tier, wm, doomed in plan:
        for c in doomed:
            d = layout[tier][c]
            n_files, n_bytes = _dir_stats(d)
            evicted.append({
                "tier": tier,
                "chunk": c,
                "n_files": n_files,
                "bytes": n_bytes,
                "watermark_widx": wm,
                "horizon_windows": int(policy.horizons[tier]),
                "evicted_at": now,
            })
    if evicted:
        from pyhctsa_spark.operators._local_df import one_slice_df

        (
            one_slice_df(spark, evicted, _LOG_SCHEMA)
            .write.mode("append")
            .parquet(os.path.join(path, "_retention_log"))
        )
    for tier, _wm, doomed in plan:
        for c in doomed:
            shutil.rmtree(layout[tier][c])
    return evicted


def retention_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "_retention_log"))
