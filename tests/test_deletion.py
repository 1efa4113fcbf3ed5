"""Deletion propagation: exactness, touched-chunk-only rewrites, audit
trail, dead-chunk sweep, idempotence."""

import os

import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.deletion import (
    delete_docs,
    deletion_log,
    verify_erased,
)
from pyhctsa_spark.operators.retention import write_tier_chunked


@pytest.fixture()
def store(spark, tmp_path):
    from pyhctsa_spark.operators.quantile_rollup import rollup_quantile_tiers
    from pyhctsa_spark.sources.synthetic import sequences_df

    seq = sequences_df(spark, 24)
    tiers = rollup_quantile_tiers(seq, window=8, group=4, n_tiers=2)
    d = str(tmp_path / "store")
    write_tier_chunked(tiers, d, chunk_windows=16)
    return d


def test_total_erasure_then_verify_and_rerun(spark, store):
    """Erasing EVERY doc sweeps every chunk; the emptied store must
    verify as 0 remaining and a re-run must be a no-op — not crash the
    schema-less parquet read (UNABLE_TO_INFER_SCHEMA)."""
    all_ids = [r["doc_id"] for r in
               spark.read.parquet(store).select("doc_id").distinct().collect()]
    info = delete_docs(spark, store, all_ids)
    assert info["rows_deleted"] > 0 and info["chunks_removed"]
    assert verify_erased(spark, store, all_ids) == 0
    again = delete_docs(spark, store, all_ids)
    assert again == {"touched_chunks": [], "rows_deleted": 0,
                     "chunks_removed": []}


def test_delete_is_exact_and_verified(spark, store):
    before = spark.read.parquet(store)
    doomed = [r["doc_id"] for r in
              before.select("doc_id").distinct().limit(3).orderBy("doc_id").collect()]
    # snapshot the expected survivors BEFORE the store is rewritten
    b = (
        before.where(~F.col("doc_id").isin(doomed))
        .orderBy("doc_id", "tier", "window_idx").drop("hist_bin").collect()
    )
    info = delete_docs(spark, store, doomed)
    assert info["rows_deleted"] > 0 and info["touched_chunks"]
    assert verify_erased(spark, store, doomed) == 0
    # survivors are bit-identical: deletion == filter of the old store
    a = (
        spark.read.parquet(store)
        .orderBy("doc_id", "tier", "window_idx").drop("hist_bin").collect()
    )
    assert a == b


def test_untouched_chunks_never_rewritten(spark, store):
    # every chunk's current file set, by mtime+size
    def snap():
        out = {}
        for root, _dirs, files in os.walk(store):
            if "_deletion_log" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snap()
    doomed = [r["doc_id"] for r in
              spark.read.parquet(store).select("doc_id").distinct()
              .orderBy("doc_id").limit(1).collect()]
    info = delete_docs(spark, store, doomed)
    after = snap()
    touched_dirs = {
        os.path.join(store, f"tier={t}", f"chunk={c}")
        for t, c in info["touched_chunks"]
    }
    for p, m in before.items():
        d = os.path.dirname(p)
        if d not in touched_dirs:
            assert after.get(p) == m, f"untouched file rewritten: {p}"


def test_audit_log_and_idempotence(spark, store):
    doomed = [r["doc_id"] for r in
              spark.read.parquet(store).select("doc_id").distinct()
              .orderBy("doc_id").limit(2).collect()]
    info1 = delete_docs(spark, store, doomed)
    log = deletion_log(spark, store)
    assert set(r["doc_id"] for r in log.collect()) == set(doomed)
    assert log.agg(F.sum("n_rows")).first()[0] == info1["rows_deleted"]
    # re-run: converged no-op, no extra log rows
    info2 = delete_docs(spark, store, doomed)
    assert info2 == {"touched_chunks": [], "rows_deleted": 0,
                     "chunks_removed": []}
    assert deletion_log(spark, store).count() == log.count()


def test_fully_dead_chunk_is_swept(spark, tmp_path):
    rows = [(f"d{i}", "s", 0, w, 1) for i in range(2) for w in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, tier int, window_idx long, n long"
    )
    d = str(tmp_path / "tiny")
    write_tier_chunked(df, d, chunk_windows=2)
    # delete every doc -> every chunk dies
    info = delete_docs(spark, d, ["d0", "d1"])
    assert info["chunks_removed"]
    assert not any(
        c.startswith("chunk=")
        for t in os.listdir(d) if t.startswith("tier=")
        for c in os.listdir(os.path.join(d, t))
    )


def test_erasure_job_cli_tier_store(spark, store, capsys, monkeypatch, tmp_path):
    import json

    # reuse the running test session instead of building a new one
    from pyspark.sql import SparkSession

    from jobs.erasure_job import main

    doomed = [r["doc_id"] for r in
              spark.read.parquet(store).select("doc_id").distinct()
              .orderBy("doc_id").limit(2).collect()]
    ids_file = tmp_path / "ids.txt"
    ids_file.write_text("\n".join(doomed) + "\n")
    rc = main(["--store", store, "--ids-file", str(ids_file)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_deleted"] > 0 and out["rows_remaining"] == 0
    assert out["n_ids"] == 2


def test_erasure_job_cli_cagg_store(spark, tmp_path, capsys):
    import json

    from pyspark.sql import functions as F

    from jobs.erasure_job import main
    from pyhctsa_spark.operators.cagg import CaggSnapshotStore

    ev = spark.range(1500).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 913_789_123
        ).alias("ts"),
        (F.col("id") % 50).cast("double").alias("value"),
    )
    path = str(tmp_path / "cs")
    CaggSnapshotStore(path).materialize(ev)
    rc = main(["--cagg-store", path, "--ids", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["states_deleted"] > 0 and out["states_remaining"] == 0
    assert out["history_purged"] is True


def test_erasure_job_cli_minhash_index(spark, tmp_path, capsys):
    import json

    from jobs.erasure_job import main
    from pyhctsa_spark.operators.dedup_index import build_minhash_index

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = spark.createDataFrame(
        [
            (i, " ".join(words[(i + j) % 6] + str((i * 7 + j) % 23)
                         for j in range(12)), "s")
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(docs, idx, threshold=0.3)
    rc = main(["--minhash-index", idx, "--ids", "3,5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_remaining"] == 0 and out["n_ids"] == 2
    assert out["sigs"][1] == out["sigs"][0] - 2  # two docs erased
    # untouched docs still searchable
    assert spark.read.parquet(idx + "/sigs").count() == 6


def test_erasure_job_cli_search_index(spark, tmp_path, capsys):
    import json

    from jobs.erasure_job import main
    from pyhctsa_spark.operators.search import bm25_topk
    from pyhctsa_spark.operators.search_index import (
        build_search_index,
        query_search_index,
    )

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = spark.createDataFrame(
        [
            (i, " ".join(words[(i + j) % 6] for j in range(10)), "s")
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "sidx")
    build_search_index(docs, idx, n_buckets=8)
    rc = main(["--search-index", idx, "--ids", "3,5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_remaining"] == 0 and out["n_ids"] == 2
    before, after = out["postings"]
    assert before > after
    # erased docs are unretrievable; survivors re-rank exactly like an
    # ad-hoc run over the erased corpus
    got = [tuple(r) for r in
           query_search_index(spark, idx, ["alpha", "beta"], k=8).collect()]
    want = [tuple(r) for r in
            bm25_topk(docs.where("doc_id not in (3, 5)"),
                      ["alpha", "beta"], k=8).collect()]
    assert got == want
    assert not {3, 5} & {r[1] for r in got}


def test_erasure_job_cli_ivf_index(spark, tmp_path, capsys):
    import json

    import numpy as np
    from jobs.erasure_job import main
    from pyhctsa_spark.operators.similarity import ivf_write_index

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "vidx")
    ivf_write_index(emb, idx, num_centroids=4)
    rc = main(["--ivf-index", idx, "--ids", "3,5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_remaining"] == 0 and out["n_ids"] == 2
    before, after = out["lists"]
    assert (before, after) == (24, 22)
    # survivors still retrievable
    assert spark.read.parquet(idx + "/lists").count() == 22


def test_erasure_job_cli_ivfpq_index(spark, tmp_path, capsys):
    import json

    import numpy as np
    from jobs.erasure_job import main
    from pyhctsa_spark.operators.pq import ivfpq_write_index

    rng = np.random.default_rng(9)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "pqidx")
    ivfpq_write_index(emb, idx, m=4, ksub=8, num_centroids=4,
                      pq_train_iters=0, ivf_train_iters=2)
    rc = main(["--ivfpq-index", idx, "--ids", "3,5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_remaining"] == 0 and out["n_ids"] == 2
    assert tuple(out["lists"]) == (24, 22)
