"""SparkSession factory with the engine's scale-oriented defaults.

The same settings we would ship in spark-defaults.conf for a 1000-executor
cluster, expressed here for local[N] testing: AQE on (skew-join splitting,
partition coalescing), Arrow on (every dataplane kernel is an Arrow-batched
pandas UDF), bounded Arrow batches so one long token array never forces a
giant batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyhctsa_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset). Pass ``master="from-submit"`` to leave the master
    unset so spark-submit / the cluster manager decides (the production
    jobs/ entrypoints do this).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    b = SparkSession.builder.appName(app_name)
    if master != "from-submit":
        b = b.master(master)
    b = (
        b
        # AQE: runtime coalescing + skew-join splitting; at 100 TB this is
        # what turns a bad static plan into a survivable one.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # All kernels are Arrow pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Token arrays can be ~16k ints; 2048 rows/batch is ~32MB at the
        # TYPICAL ~4k-token doc and ~128MB worst-case if a batch were all
        # 16k-token docs (log-uniform lengths make that vanishingly rare;
        # the heap headroom below covers it). Output-side memory is
        # bounded separately: the kernels flush RecordBatches every ~64k
        # rows). 2048 measured ~15% faster than 512 on the rollup (fewer
        # Arrow roundtrips).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # 128 MiB parquet split — the default, stated explicitly because
        # partition sizing is part of the contract (BASELINE.md §3).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local[N] runs scan, kernel I/O and N concurrent parquet WRITERS
        # in one JVM: 32 writer tasks x (row-group buffers + dictionary
        # pages + the binary state column) overflow an 8g heap (observed
        # java.lang.OutOfMemoryError in ColumnChunkPageWriteStore on the
        # 240k-doc/0.7B-point run). On a real cluster this is per-executor
        # sizing; locally default to a heap that matches 32 writers.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
