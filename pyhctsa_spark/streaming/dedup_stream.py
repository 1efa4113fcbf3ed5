"""Streaming exact dedup: continuous content-hash deduplication.

The batch exact-dedup operator (operators/dedup.exact_dedup) keyed on a
content hash becomes a stateful streaming operator with
``dropDuplicatesWithinWatermark``: the state store keeps one entry per
content hash until the event-time watermark passes, so re-crawled /
re-ingested copies of a document arriving within the retention horizon
are dropped exactly once, across micro-batches and across restarts
(checkpointed state). This is the continuous-ingestion shape of a
crawl pipeline: late duplicates inside the watermark never reach the
sink; state is bounded by (distinct docs per watermark window), not by
stream length.

The reference has no streaming surface (SURVEY.md §2.0); this is the
engine-native extension mandated by the Spark-first design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

DOC_STREAM_SCHEMA = (
    "doc_id long, text string, source string, event_time timestamp"
)


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    text_col: str = "text",
    time_col: str = "event_time",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the streaming dedup; returns the StreamingQuery handle.

    One pass: hash the content (md5, JVM-side — the SAME key as the
    batch exact_dedup path and its oracle, so batch and streaming agree
    on what counts as a duplicate; a 64-bit xxhash64 key would silently
    drop a distinct document on collision), watermark on the event-time
    column, and keep the first arrival per hash within the watermark
    horizon. Output = the surviving (deduplicated) rows.
    """
    docs = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(source_dir)
    deduped = (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
