"""Snapshot time travel on the cagg store: read_at() resolves exact
chunk versions of retained generations, retention expiry, and commit
identity for data-free commits (expire)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.cagg import CaggSnapshotStore, cagg_finalize

WIN = 30 * 60 * 1_000_000


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 913_789_123
        ).alias("ts"),
        ((F.sin(F.col("id") / 5.0) + 1) * 40).alias("value"),
    )


def _frame(df):
    return (
        df.orderBy("user_id", "widx")
        .toPandas().reset_index(drop=True)
    )


def test_read_at_reproduces_pre_refresh_view(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "tt"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=4)
    store.materialize(_events(spark, 0, 1500))
    v0 = _frame(store.read(spark).drop("chunk"))
    store.refresh(spark, _events(spark, 1500, 2500), batch_id=0)
    v1 = _frame(store.read(spark).drop("chunk"))
    store.refresh(spark, _events(spark, 2500, 3200), batch_id=1)

    snaps = store.snapshots()
    gens = [s["gen"] for s in snaps]
    assert gens == [0, 1, 2]
    pd.testing.assert_frame_equal(
        _frame(store.read_at(spark, 0).drop("chunk")), v0)
    pd.testing.assert_frame_equal(
        _frame(store.read_at(spark, 1).drop("chunk")), v1)
    pd.testing.assert_frame_equal(
        _frame(store.read_at(spark, 2).drop("chunk")),
        _frame(store.read(spark).drop("chunk")),
    )


def test_retention_window_expires_old_snapshots(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "tt2"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=2)
    store.materialize(_events(spark, 0, 1200))
    store.refresh(spark, _events(spark, 1200, 1800), batch_id=0)
    store.refresh(spark, _events(spark, 1800, 2400), batch_id=1)
    gens = [s["gen"] for s in store.snapshots()]
    assert gens == [1, 2]  # gen 0 fell out of the window
    with pytest.raises(ValueError, match="not a retained snapshot"):
        store.read_at(spark, 0)


def test_expire_commit_has_own_snapshot_id(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "tt3"), window_micros=WIN,
                              chunk_windows=4, snapshot_retain=4)
    store.materialize(_events(spark, 0, 2000))
    man_before = store.manifest()
    n_chunks = len(man_before["chunks"])
    assert n_chunks >= 3
    cut_widx = (min(int(c) for c in man_before["chunks"]) + 1) * 4
    doomed = store.expire(keep_from_widx=cut_widx)
    assert doomed
    snaps = store.snapshots()
    assert [s["gen"] for s in snaps] == [0, 1]
    # pre-expire snapshot still reads the evicted chunks
    full = store.read_at(spark, 0)
    trimmed = store.read_at(spark, 1)
    assert full.count() > trimmed.count()
    pd.testing.assert_frame_equal(
        _frame(trimmed.drop("chunk")),
        _frame(store.read(spark).drop("chunk")),
    )


def test_time_travel_values_finalize_consistently(spark, tmp_path):
    """The pre-refresh snapshot finalizes to exactly the aggregate of
    the pre-refresh events — time travel is semantic, not just file
    bookkeeping."""
    store = CaggSnapshotStore(str(tmp_path / "tt4"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=3)
    ev0 = _events(spark, 0, 1000)
    store.materialize(ev0)
    store.refresh(spark, _events(spark, 1000, 1600), batch_id=0)
    got = cagg_finalize(store.read_at(spark, 0).drop("chunk"))
    from pyhctsa_spark.operators.cagg import cagg_partial

    want = cagg_finalize(cagg_partial(ev0, "ts", ["user_id"], "value", WIN))
    pd.testing.assert_frame_equal(_frame(got), _frame(want))


def test_delete_keys_erases_and_purges_history(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "dk"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=4)
    ev = _events(spark, 0, 2000)
    store.materialize(ev)
    store.refresh(spark, _events(spark, 2000, 2600), batch_id=0)
    info = store.delete_keys(spark, [1])
    assert info["states_deleted"] > 0 and info["touched_chunks"]
    assert store.read(spark).where("user_id = 1").count() == 0
    # compliance default: the time-travel horizon is truncated to the
    # erasure commit — no retained snapshot can resolve the old chunks
    snaps = store.snapshots()
    assert [s["gen"] for s in snaps] == [2]
    with pytest.raises(ValueError, match="not a retained snapshot"):
        store.read_at(spark, 1)
    # survivors equal a world that never had user 1
    want = cagg_finalize(
        CaggSnapshotStore(str(tmp_path / "ref"), window_micros=WIN,
                          chunk_windows=8)._partial(
            _events(spark, 0, 2600).where("user_id != 1"),
            "ts", ["user_id"], "value", WIN)
    )
    got = cagg_finalize(store.read(spark).drop("chunk"))
    pd.testing.assert_frame_equal(_frame(got), _frame(want))
    # idempotent
    info2 = store.delete_keys(spark, [1])
    assert info2 == {"touched_chunks": [], "states_deleted": 0}


def test_delete_keys_mixed_types_and_large_batch(spark, tmp_path):
    """A mixed int/str key batch (erasure jobs coerce per-id) must not
    crash Python's cross-type sort, and a >2048-key batch must route
    through the broadcast-join fallback with the same result."""
    store = CaggSnapshotStore(str(tmp_path / "dk3"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=4)
    store.materialize(_events(spark, 0, 2000))
    # numeric-string keys coerce to the bigint column; a key that can't
    # be the column type is a TYPED error, not a Catalyst cast landmine
    info = store.delete_keys(spark, ["1", 1])
    assert info["states_deleted"] > 0
    assert store.read(spark).where("user_id = 1").count() == 0
    with pytest.raises(TypeError, match="integer-coercible"):
        store.delete_keys(spark, [2, "not-a-key"])
    # large batch: 3000 keys (one real, rest absent) -> broadcast path
    big = [2] + list(range(10_000, 12_999))
    info2 = store.delete_keys(spark, big)
    assert info2["states_deleted"] > 0
    assert store.read(spark).where("user_id = 2").count() == 0
    assert store.read(spark).count() > 0  # other users survive


def test_delete_keys_audit_mode_keeps_history(spark, tmp_path):
    store = CaggSnapshotStore(str(tmp_path / "dk2"), window_micros=WIN,
                              chunk_windows=8, snapshot_retain=4)
    store.materialize(_events(spark, 0, 1500))
    store.delete_keys(spark, [2], purge_history=False)
    assert store.read(spark).where("user_id = 2").count() == 0
    # audit mode: the pre-erasure snapshot is still readable and still
    # contains the key (ages out with the retention window instead)
    gens = [s["gen"] for s in store.snapshots()]
    assert gens == [0, 1]
    assert store.read_at(spark, 0).where("user_id = 2").count() > 0
