"""Streaming continuous aggregates over the snapshot store: stream ==
batch across late files, replay idempotence, crash-before-commit
recovery, generation GC."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.cagg import (
    CaggSnapshotStore,
    cagg_finalize,
    cagg_partial,
)
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


def _final(spark, store):
    return cagg_finalize(store.read(spark).drop("chunk"))


def test_stream_cagg_matches_batch_with_late_files(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("caggstream"))
    src, store_path, ckpt = f"{root}/src", f"{root}/store", f"{root}/ckpt"
    os.makedirs(src)
    # file 1: the NEWER half; file 2: the older half arriving later —
    # late data crossing into already-refreshed windows
    _events(spark, 1000, 2000).coalesce(1).write.mode("append").parquet(src)
    q = stream_cagg(spark, src, store_path, ckpt, available_now=True,
                    window_micros=WIN, chunk_windows=16)
    q.awaitTermination(120)
    _events(spark, 0, 1000).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_cagg(spark, src, store_path, ckpt, available_now=True,
                     window_micros=WIN, chunk_windows=16)
    q2.awaitTermination(120)
    store = CaggSnapshotStore(store_path, window_micros=WIN, chunk_windows=16)
    got = _final(spark, store)
    want = cagg_finalize(cagg_partial(_events(spark, 0, 2000),
                                      window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))
    man = store.manifest()
    assert man["last_batch"] is not None
    assert man["gen"] >= 1


def test_stream_cagg_replayed_batch_is_skipped(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("caggreplay"))
    src, store_path, ckpt = f"{root}/src", f"{root}/store", f"{root}/ckpt"
    os.makedirs(src)
    _events(spark, 0, 500).coalesce(1).write.mode("append").parquet(src)
    q = stream_cagg(spark, src, store_path, ckpt, available_now=True,
                    window_micros=WIN, chunk_windows=16)
    q.awaitTermination(120)
    store = CaggSnapshotStore(store_path, window_micros=WIN, chunk_windows=16)
    snap = _sorted_pd(_final(spark, store))
    # simulate a foreachBatch redelivery: wipe the streaming checkpoint
    # so the SAME file replays with the SAME batch ids — the committed
    # manifest must make the refresh a no-op (no double counting)
    import shutil

    shutil.rmtree(ckpt)
    q2 = stream_cagg(spark, src, store_path, ckpt, available_now=True,
                     window_micros=WIN, chunk_windows=16)
    q2.awaitTermination(120)
    after = _sorted_pd(_final(spark, store))
    pd.testing.assert_frame_equal(snap, after)


def test_snapshot_refresh_crash_before_commit_replays_cleanly(
    spark, tmp_path
):
    """Kill the refresh AFTER the new generation's data is written but
    BEFORE the manifest publish — the exact window the plain chunk
    store cannot survive. The replay must produce the single-apply
    result, not a double merge."""
    store = CaggSnapshotStore(str(tmp_path / "snap"),
                              window_micros=WIN, chunk_windows=16)
    ev = _events(spark, 0, 2000)
    store.materialize(ev.where("event_id % 5 != 4"))
    delta = ev.where("event_id % 5 = 4")

    real_publish = store._publish
    calls = {"n": 0}

    def crashing_publish(man):
        calls["n"] += 1
        raise RuntimeError("simulated crash before manifest commit")

    store._publish = crashing_publish
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.refresh(spark, delta, batch_id=7)
    assert calls["n"] == 1
    store._publish = real_publish
    # pre-replay view is the PRE-refresh state (manifest unchanged)
    man = store.manifest()
    assert man["gen"] == 0 and man["last_batch"] is None
    # replay the same batch
    info = store.refresh(spark, delta, batch_id=7)
    assert info["delta_states"] > 0
    got = _final(spark, store)
    want = cagg_finalize(cagg_partial(ev, window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))
    # and a SECOND delivery of the committed batch is a no-op
    again = store.refresh(spark, delta, batch_id=7)
    assert again.get("skipped_committed_batch")


def test_snapshot_gc_removes_superseded_and_orphaned_generations(
    spark, tmp_path
):
    store = CaggSnapshotStore(str(tmp_path / "snap"),
                              window_micros=WIN, chunk_windows=16)
    ev = _events(spark, 0, 1500)
    store.materialize(ev.where("event_id < 1000"))
    # orphan: a generation written by a crashed refresh, never committed
    orphan = os.path.join(store.path, "gen=99", "chunk=123")
    os.makedirs(orphan)
    store.refresh(spark, ev.where("event_id >= 1000"), batch_id=0)
    man = store.manifest()
    live = {(c, g) for c, g in man["chunks"].items()}
    for gdir in os.listdir(store.path):
        if not gdir.startswith("gen="):
            continue
        g = int(gdir.split("=", 1)[1])
        for cdir in os.listdir(os.path.join(store.path, gdir)):
            if cdir.startswith("chunk="):
                assert (cdir.split("=", 1)[1], g) in live, (gdir, cdir)
    assert not os.path.exists(os.path.join(store.path, "gen=99"))
    # the committed view is complete and correct
    got = _final(spark, store)
    want = cagg_finalize(cagg_partial(ev, window_micros=WIN))
    pd.testing.assert_frame_equal(_sorted_pd(got), _sorted_pd(want))


def test_snapshot_expire_is_a_manifest_edit(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "snap"),
                              window_micros=WIN, chunk_windows=16)
    ev = _events(spark, 0, 2000)
    store.materialize(ev)
    man0 = store.manifest()
    all_chunks = sorted(int(c) for c in man0["chunks"])
    assert len(all_chunks) > 4
    # keep only windows >= the 3rd chunk's start; chunk boundary rule:
    # a mid-chunk keep_from keeps the boundary chunk
    keep_from = all_chunks[2] * 16 + 5
    doomed = store.expire(keep_from)
    assert doomed == all_chunks[:2]
    got = store.read(spark)
    assert got.agg(F.min("widx")).first()[0] >= all_chunks[2] * 16
    # expired chunk dirs are gone from disk (GC), survivors intact
    for c in doomed:
        assert not os.path.exists(
            os.path.join(store.path, "gen=0", f"chunk={c}"))
    # full recompute over the SURVIVING window range matches
    want = cagg_finalize(
        cagg_partial(ev, window_micros=WIN)
        .where(F.col("widx") >= all_chunks[2] * 16)
    )
    pd.testing.assert_frame_equal(
        _sorted_pd(cagg_finalize(got.drop("chunk"))), _sorted_pd(want))
