"""Streaming continuous aggregates: foreachBatch refresh == batch
recompute across multi-file ingest with late data; replay idempotence."""

import os

import pandas as pd
from pyspark.sql import functions as F

from pyhctsa_spark.operators.cagg import cagg_finalize, cagg_partial, cagg_read
from pyhctsa_spark.streaming.cagg_stream import stream_cagg

WIN = 30 * 60 * 1_000_000


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.col("id") * 613_789_123
            + (F.col("id") * 37 % 101) * 1_000_003
        ).alias("ts"),
        (F.col("id") % 8).alias("user_id"),
        (F.sin(F.col("id") / 17.0) * 10
         + (F.col("id") % 13).cast("double")).alias("value"),
    )


def _sorted_pd(df):
    return (
        df.toPandas()
        .sort_values(["user_id", "widx"])
        .reset_index(drop=True)
        .round(9)
    )


def test_stream_cagg_matches_batch_with_late_files(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("caggstream"))
    src, store, ckpt = f"{root}/src", f"{root}/store", f"{root}/ckpt"
    os.makedirs(src)
    # file 1: the NEWER half; file 2: the older half arriving later —
    # late data crossing into already-refreshed windows
    _events(spark, 1000, 2000).coalesce(1).write.mode("append").parquet(src)
    q = stream_cagg(spark, src, store, ckpt, available_now=True,
                    window_micros=WIN, chunk_windows=16)
    q.awaitTermination(120)
    _events(spark, 0, 1000).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_cagg(spark, src, store, ckpt, available_now=True,
                     window_micros=WIN, chunk_windows=16)
    q2.awaitTermination(120)
    got = cagg_finalize(cagg_read(spark, store).drop("chunk"))
    want = cagg_finalize(cagg_partial(_events(spark, 0, 2000),
                                      window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))
    # commit manifest recorded every batch exactly once
    commits = os.listdir(os.path.join(store, "_stream_commits"))
    assert len(commits) >= 2


def test_stream_cagg_replayed_batch_is_skipped(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("caggreplay"))
    src, store, ckpt = f"{root}/src", f"{root}/store", f"{root}/ckpt"
    os.makedirs(src)
    _events(spark, 0, 500).coalesce(1).write.mode("append").parquet(src)
    q = stream_cagg(spark, src, store, ckpt, available_now=True,
                    window_micros=WIN, chunk_windows=16)
    q.awaitTermination(120)
    snap = _sorted_pd(cagg_finalize(cagg_read(spark, store).drop("chunk")))
    # simulate a foreachBatch redelivery: wipe the streaming checkpoint
    # so the SAME file replays with the SAME batch ids — the commit
    # manifest must make the refresh a no-op (no double counting)
    import shutil

    shutil.rmtree(ckpt)
    q2 = stream_cagg(spark, src, store, ckpt, available_now=True,
                     window_micros=WIN, chunk_windows=16)
    q2.awaitTermination(120)
    after = _sorted_pd(cagg_finalize(cagg_read(spark, store).drop("chunk")))
    pd.testing.assert_frame_equal(snap, after)
