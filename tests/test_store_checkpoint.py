"""Compressed-store round-trip + resumable checkpointed job semantics."""

import os

import numpy as np
import pandas as pd
import pytest

from pyhctsa_spark.operators.checkpoint import RollupJob
from pyhctsa_spark.operators.rollup import rollup_tiers
from pyhctsa_spark.operators.store import (
    FEATURES,
    compression_report,
    read_compressed_store,
    write_compressed_store,
)
from pyhctsa_spark.sources.synthetic import sequences_df


@pytest.fixture(scope="module")
def tier_df(spark):
    df = sequences_df(spark, 40, partitions=4)
    return rollup_tiers(df).cache()


def test_store_roundtrip_identity(spark, tier_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "tiers")
    write_compressed_store(tier_df, path)
    back = read_compressed_store(spark, path).toPandas()
    orig = tier_df.toPandas()
    key = ["doc_id", "tier", "window_idx"]
    a = orig.set_index(key).sort_index()
    b = back.set_index(key).sort_index()
    assert len(a) == len(b)
    for f in FEATURES + ["n"]:
        av = a[f].to_numpy(np.float64)
        bv = b[f].to_numpy(np.float64)
        # bit-exact: gorilla stores raw float64 bits
        np.testing.assert_array_equal(
            av.view(np.uint64)[~np.isnan(av)], bv.view(np.uint64)[~np.isnan(bv)],
            err_msg=f,
        )
        assert np.isnan(av).sum() == np.isnan(bv).sum()


def test_store_compression_wins(spark, tier_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store2") / "tiers")
    write_compressed_store(tier_df, path)
    rep = compression_report(spark, path)
    assert rep["windows"] == tier_df.count()
    assert rep["ratio"] > 1.3  # gorilla+dod beats raw doubles
    assert rep["raw_bytes"] > rep["comp_bytes"]


def test_checkpoint_resume_after_injected_crash(spark, tmp_path_factory):
    store_crash = str(tmp_path_factory.mktemp("job") / "store")
    store_clean = str(tmp_path_factory.mktemp("job2") / "store")
    seq = sequences_df(spark, 30, partitions=4)

    clean = RollupJob(store_clean, n_buckets=4)
    snap_clean = clean.run(spark, seq)
    assert snap_clean["complete"]

    job = RollupJob(store_crash, n_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(spark, seq, fail_after_bucket=1)
    done = job.completed_buckets()
    assert len(done) == 2  # buckets 0 and 1 committed before the crash

    # restart: only pending buckets run; result equals the clean job
    snap = RollupJob(store_crash, n_buckets=4).run(spark, seq)
    assert snap["complete"]
    assert snap["windows_emitted"] == snap_clean["windows_emitted"]

    a = (
        RollupJob(store_crash, n_buckets=4).result(spark).toPandas()
        .sort_values(["doc_id", "tier", "window_idx"]).reset_index(drop=True)
        .drop(columns=["state_bin"])
    )
    b = (
        clean.result(spark).toPandas()
        .sort_values(["doc_id", "tier", "window_idx"]).reset_index(drop=True)
        .drop(columns=["state_bin"])
    )
    pd.testing.assert_frame_equal(a, b)
    # lineage present per bucket
    entry = job.completed_buckets()[0]
    for k in ("rows_read", "windows_emitted", "checksum_mismatches",
              "wall_sec", "output_bytes"):
        assert k in entry
    assert os.path.exists(os.path.join(store_crash, "_SNAPSHOT.json"))


def test_packaged_zip_imports_and_job_cli_runs(spark, tmp_path):
    """spark-submit packaging contract: the --py-files zip must be
    importable on its own, and jobs/rollup_job.py must run end-to-end
    (resumable store + snapshot) against a parquet sequences table."""
    import json
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from package import build

    zip_path = build(str(tmp_path / "pyhctsa_spark.zip"))
    # the zip alone must satisfy the import (pure-python package)
    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "sys.path = [p for p in sys.path if p not in ('', '/root/repo')]; "
         "import pyhctsa_spark.functions.kernels as K; import numpy as np; "
         "print(K.mean_(np.arange(10.0))); "
         # data resources must load from INSIDE the zip too
         # (importlib.resources, not a filesystem path)
         "from pyhctsa_spark.operators.bpe import load_merges; "
         "print(len(load_merges()) > 0)",
         zip_path],
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path),
    )
    assert probe.returncode == 0, probe.stderr[-500:]
    assert probe.stdout.split() == ["4.5", "True"]

    from pyhctsa_spark.sources.synthetic import sequences_df

    src = str(tmp_path / "seq")
    sequences_df(spark, 12, binary=True).write.parquet(src)
    store = str(tmp_path / "store")
    sys.path.insert(0, "/root/repo/jobs")
    import rollup_job

    rc = rollup_job.main([
        "--input", src, "--store", store,
        "--window", "8", "--group", "4", "--tiers", "2", "--buckets", "2",
    ])
    assert rc == 0
    snap = json.load(open(store + "/_SNAPSHOT.json"))
    assert snap["buckets_done"] == 2 if "buckets_done" in snap else True
    out = spark.read.parquet(store + "/tier_data")
    assert out.count() > 0
    assert set(out.select("tier").distinct().toPandas()["tier"]) == {0, 1}


def test_rollup_job_families(spark, tmp_path):
    """Every tier family runs under the same bucket-manifest resume
    machinery; the bucketed result equals the direct single-pass
    operator."""
    from pyhctsa_spark.operators.checkpoint import RollupJob
    from pyhctsa_spark.operators.fused_rollup import rollup_fused_tiers
    from pyhctsa_spark.sources.synthetic import sequences_df

    seq = sequences_df(spark, 12, binary=True).cache()
    job = RollupJob(str(tmp_path / "fstore"), n_buckets=3, window=16,
                    group=4, n_tiers=2, lags=[1], family="fused")
    snap = job.run(spark, seq)
    assert snap["complete"]
    got = sorted(
        (r["doc_id"], r["tier"], r["window_idx"], r["mean"],
         r["n_distinct"], r["hll_denom"])
        for r in spark.read.parquet(
            str(tmp_path / "fstore" / "tier_data")).collect()
    )
    want = sorted(
        (r["doc_id"], r["tier"], r["window_idx"], r["mean"],
         r["n_distinct"], r["hll_denom"])
        for r in rollup_fused_tiers(seq, window=16, group=4,
                                    n_tiers=2, lags=[1]).collect()
    )
    assert got == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown rollup family"):
        RollupJob(str(tmp_path / "x"), family="nope")
