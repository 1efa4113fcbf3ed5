"""Streaming continuous aggregates: per-micro-batch incremental refresh.

``readStream`` on an events directory -> ``foreachBatch`` ->
``operators/cagg.cagg_refresh``. Each micro-batch partial-aggregates
its own rows and merges them into the chunk-partitioned state store,
rewriting only the touched chunks — so the materialized aggregate is
continuously maintained with per-batch cost ∝ batch size, and LATE
events need no watermark bookkeeping at all: a late row is just a
touched chunk further back, merged by the same associative state
algebra (merge(partial(A), partial(B)) == partial(A ∪ B)).

This is deliberately different from Spark's built-in stateful windowed
aggregation: the state lives in the STORE (readable by any batch query
mid-stream, survives the stream, retention/compaction-managed like any
chunked tier), not in the streaming state store; there is nothing to
expire, so no watermark-forced completeness/latency tradeoff. The
tradeoff accepted in exchange: per-batch refresh is read-merge-rewrite
of touched chunks, so batches should be seconds-to-minutes, not
per-record (exactly the continuous-aggregate cadence every TSDB uses).

Exactly-once: foreachBatch gives at-least-once delivery on retries; a
replayed batch id is skipped via a tiny committed-batch manifest under
``<store>/_stream_commits`` (idempotent refresh, the same pattern as
checkpoint.RollupJob's bucket manifest).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def _commit_path(store: str, batch_id: int) -> str:
    return os.path.join(store, "_stream_commits", f"{batch_id}.json")


def stream_cagg(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, value double",
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    window_micros: int = 30 * 60 * 1_000_000,
    chunk_windows: int = 48,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming refresh; returns the StreamingQuery handle."""
    from pyhctsa_spark.operators.cagg import cagg_refresh

    by = list(by or ["user_id"])

    def _refresh_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = _commit_path(store_path, batch_id)
        if os.path.exists(marker):  # replayed batch after a crash
            return
        info = cagg_refresh(
            spark,
            store_path,
            batch_df,
            on=on,
            by=by,
            value_col=value_col,
            window_micros=window_micros,
            chunk_windows=chunk_windows,
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            json.dump({"batch_id": batch_id, **info}, f)

    # no store seeding needed: the first batch's refresh creates it
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(source_dir)
    writer = (
        events.writeStream.foreachBatch(_refresh_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
