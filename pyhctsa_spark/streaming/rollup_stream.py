"""Structured-streaming rollup: continuous ingestion of sequence files.

The tier rollup is stateless per input row (every window of a doc lives
in its row), so the same Arrow-native kernel runs unchanged under
Structured Streaming: ``readStream`` on a parquet directory of
sequences -> ``rollup_tiers`` -> ``writeStream`` with exactly-once file
sink + checkpoint. New docs appearing in the source directory flow into
new tier rows; combined with ``cascade_from_store`` this gives a
continuously-maintained continuous aggregate (the streaming analogue of
a TSDB's refresh policy).

The reference has no streaming surface (SURVEY.md §2.0); this is the
engine-native extension mandated by the Spark-first design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyhctsa_spark.operators.rollup import rollup_tiers
from pyhctsa_spark.sources.synthetic import SEQ_BIN_SCHEMA, SEQ_SCHEMA


def stream_rollup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: int = 32,
    group: int = 16,
    n_tiers: int = 3,
    lags: list[int] | None = None,
    binary: bool = True,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming rollup; returns the StreamingQuery handle.

    ``available_now=True`` drains the current directory contents and
    stops (used for catch-up runs and tests); otherwise the query keeps
    following the directory.
    """
    schema = SEQ_BIN_SCHEMA if binary else SEQ_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    seq = reader.parquet(source_dir)
    tiers = rollup_tiers(seq, window=window, group=group, n_tiers=n_tiers, lags=lags)
    writer = (
        tiers.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
