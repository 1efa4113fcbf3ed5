"""Streaming vector indexing: continuous maintenance of the persistent
IVF index (operators/similarity) over an embedding ingest stream, so
ANN retrieval stays current without ever re-indexing the corpus.

Per micro-batch (``foreachBatch``):

  1. sink append — the batch's vectors land in the sink partitioned by
     ``batch`` with dynamic partition overwrite (exactly-once under
     replays: a redelivered batch rewrites its own ``batch=N``
     directory);
  2. index append — ``append_to_ivf_index`` (delta-proportional:
     map-side assignment against the index's own centroids, written to
     the cid-sorted LSM append heap).

Exactly-once contract, same marker protocol as the search stream: a
replayed IVF append duplicates (cid, nid) rows, and a duplicated
neighbor occupies two top-k slots — wrong results, not just waste. So
the batch body brackets the index append with two markers:

    _stream_pending/<batch>   written BEFORE the index append
    _stream_commits/<batch>   written after everything succeeded

- commit marker present  -> the batch is done; a redelivery is a no-op.
- pending marker present without its commit -> a previous attempt
  crashed somewhere inside the index append; the body SELF-HEALS by
  running ``compact_ivf_index`` dropping the batch's own ids (erasing
  whatever the crashed attempt landed in the heap) before re-appending
  — restoring exactness without operator intervention.
- neither -> first delivery, normal path.

Unlike the search index, the IVF index cannot bootstrap from an empty
corpus: the coarse quantizer needs training vectors. ``index_path``
must hold an index built by ``ivf_write_index`` over a representative
bootstrap corpus (the faiss train-then-add shape); the stream then
keeps it current. Quantizer drift across the stream is visible in the
append counters (assign_cos_mean vs the build baseline) — when it
falls, rebuild with fresh centroids and restart the stream.

The reference has no streaming or ANN surface (SURVEY.md §2.0); this
extends the engine-native streaming family (rollup, exact dedup,
near-dup screen, cagg, search) with continuous vector-index
maintenance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from pyhctsa_spark.operators.similarity import (
    append_to_ivf_index,
    compact_ivf_index,
)
from pyhctsa_spark.streaming.search_stream import _marker, _write_marker

VEC_STREAM_SCHEMA = "vec_id long, embedding array<double>"


def process_vector_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    index_path: str,
    sink_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """The foreachBatch body, callable directly for batch-mode replays
    and tests. Idempotent per ``batch_id``; self-heals a crash-window
    replay by compacting out the batch's own ids before re-appending
    (see module docstring)."""
    commit = _marker(index_path, "_stream_commits", batch_id)
    if os.path.exists(commit):
        return
    spark = batch_df.sparkSession
    pending = _marker(index_path, "_stream_pending", batch_id)
    batch_df = batch_df.persist()

    # 1. sink, exactly-once via batch-partition overwrite
    (
        batch_df.withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(sink_dir)
    )

    # 2. index append, bracketed by the pending/commit markers
    if os.path.exists(pending):
        # a previous attempt died inside its append — some of the
        # batch's rows may already sit in the heap. One compact that
        # DROPS the batch's own ids erases whatever the crashed attempt
        # landed, so the re-append below starts exact.
        compact_ivf_index(
            spark,
            index_path,
            drop_ids=batch_df.select(F.col(id_col).alias("vec_id")),
            id_col="vec_id",
        )
    _write_marker(pending)
    if batch_df.limit(1).count():
        append_to_ivf_index(
            batch_df, index_path, vec_col=vec_col, id_col=id_col
        )
    _write_marker(commit)
    batch_df.unpersist()


def stream_vector_indexing(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    index_path: str,
    *,
    schema: str = VEC_STREAM_SCHEMA,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start continuous vector indexing; returns the handle.

    ``index_path`` must hold an index built by ``ivf_write_index`` over
    a representative bootstrap corpus — the coarse quantizer trains at
    build time and every streamed batch is assigned against it."""
    def _body(bdf: DataFrame, bid: int) -> None:
        process_vector_batch(
            bdf, bid,
            index_path=index_path, sink_dir=sink_dir,
            vec_col=vec_col, id_col=id_col,
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    vecs = reader.parquet(source_dir)
    writer = (
        vecs.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
