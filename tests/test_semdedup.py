"""SemDeDup (operators/semdedup.py): agreement with an independent
numpy reference on random data, the paper's survivor rule (farthest
from centroid survives a duplicate group), zero-norm handling, blocked
matmul invariance, the oversized-cluster contract, and the Lloyd path."""

import numpy as np
import pytest

from pyhctsa_spark.operators.semdedup import semdedup


def _emb_df(spark, X, partitions=4):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(partitions)


def _reference(X, C, eps):
    """Independent SemDeDup replay: float32-faithful input, cosine
    assignment, (cent_sim asc, id asc) order, upper-triangular max."""
    X = X.astype(np.float32).astype(np.float64)
    vn = np.linalg.norm(X, axis=1)
    cn = np.linalg.norm(C, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = (X @ C.T) / np.outer(vn, cn)
    cos[:, cn == 0] = np.nan
    cos[vn == 0] = np.nan
    safe = np.where(np.isnan(cos), -np.inf, cos)
    cid = safe.argmax(axis=1)
    cent = cos[np.arange(len(X)), cid]
    out = {}
    for c in np.unique(cid):
        members = np.where(cid == c)[0]
        order = sorted(
            members,
            key=lambda i: (np.isnan(cent[i]), cent[i] if not np.isnan(cent[i]) else 0.0, i),
        )
        for pos, i in enumerate(order):
            sims = []
            if vn[i] > 0:
                for j in order[:pos]:
                    if vn[j] > 0:
                        sims.append(float(X[i] @ X[j] / (vn[i] * vn[j])))
            mps = max(sims) if sims else None
            out[i] = (int(c), None if np.isnan(cent[i]) else float(cent[i]),
                      mps, mps is None or mps < eps)
    return out


def test_agrees_with_numpy_reference(spark):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(120, 16)).astype(np.float32)
    # plant near-duplicates so keep=False actually occurs
    X[50] = X[10] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    X[51] = X[10] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    X[90] = X[33] * 2.0
    df = _emb_df(spark, X)
    got = {
        r["vec_id"]: (r["cid"], r["cent_sim"], r["max_prior_sim"], r["keep"])
        for r in semdedup(df, num_clusters=6, eps=0.8).collect()
    }
    from pyhctsa_spark.operators.semdedup import semdedup_centroids

    C = semdedup_centroids(df, 6)
    want = _reference(X, C, 0.8)
    assert set(got) == set(want)
    n_dropped = 0
    for i in want:
        gc, gcent, gmps, gkeep = got[i]
        wc, wcent, wmps, wkeep = want[i]
        assert gc == wc, i
        assert gkeep == wkeep, i
        n_dropped += not gkeep
        assert (gcent is None) == (wcent is None)
        if wcent is not None:
            assert abs(gcent - wcent) < 1e-9
        assert (gmps is None) == (wmps is None), i
        if wmps is not None:
            assert abs(gmps - wmps) < 1e-9
    assert n_dropped >= 2  # the planted duplicates were caught


def test_survivor_is_farthest_from_centroid(spark):
    # a tight duplicate pair: the member with LOWER centroid similarity
    # must be the kept one (the paper's marginal-information rule)
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 8)).astype(np.float32)
    X[20] = X[7] + 1e-4
    df = _emb_df(spark, X)
    rows = {r["vec_id"]: r for r in semdedup(df, num_clusters=3, eps=0.99).collect()}
    a, b = rows[7], rows[20]
    assert a["cid"] == b["cid"]
    dropped = a if not a["keep"] else b
    kept = b if dropped is a else a
    assert not dropped["keep"] and kept["keep"]
    assert kept["cent_sim"] <= dropped["cent_sim"]


def test_zero_norm_vector_is_kept_with_null_sims(spark):
    X = np.vstack([np.eye(4, dtype=np.float32),
                   np.zeros((1, 4), np.float32),
                   np.eye(4, dtype=np.float32)[:1] * 3])
    df = _emb_df(spark, X, partitions=2)
    rows = {r["vec_id"]: r for r in semdedup(df, num_clusters=2, eps=0.9).collect()}
    z = rows[4]
    assert z["keep"] and z["cent_sim"] is None and z["max_prior_sim"] is None
    # the scaled copy of row 0 is a cosine-1.0 duplicate: one survives
    assert rows[0]["keep"] != rows[5]["keep"] or rows[0]["cid"] != rows[5]["cid"]


def test_block_rows_invariance(spark):
    rng = np.random.default_rng(2)
    X = rng.normal(size=(90, 12)).astype(np.float32)
    df = _emb_df(spark, X)
    small = sorted(
        semdedup(df, num_clusters=2, eps=0.3, block_rows=3).collect()
    )
    big = sorted(
        semdedup(df, num_clusters=2, eps=0.3, block_rows=100_000).collect()
    )
    # GEMM summation order differs with block shape: values agree to
    # ~1e-15, and every discrete decision (cid, keep) is identical
    for s, b in zip(small, big):
        assert (s["vec_id"], s["cid"], s["keep"]) == \
            (b["vec_id"], b["cid"], b["keep"])
        assert s["cent_sim"] == b["cent_sim"]  # assignment path is shared
        if s["max_prior_sim"] is None:
            assert b["max_prior_sim"] is None
        else:
            assert abs(s["max_prior_sim"] - b["max_prior_sim"]) < 1e-12


def test_oversized_cluster_raises(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 4)).astype(np.float32)
    df = _emb_df(spark, X)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(df, num_clusters=1, eps=0.5, max_cluster_rows=10).collect()


def test_lloyd_refinement_path(spark):
    rng = np.random.default_rng(4)
    # two well-separated cones: refined centroids must split them
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.3, size=(40, 4))
    b = rng.normal(loc=(0, 5, 0, 0), scale=0.3, size=(40, 4))
    X = np.vstack([a, b]).astype(np.float32)
    df = _emb_df(spark, X)
    rows = semdedup(df, num_clusters=2, eps=2.0, train_iters=8,
                    train_sample=80).collect()
    cids = {r["vec_id"]: r["cid"] for r in rows}
    assert len({cids[i] for i in range(40)}) == 1
    assert len({cids[i] for i in range(40, 80)}) == 1
    assert cids[0] != cids[40]
    assert all(r["keep"] for r in rows)  # eps=2.0 can never drop
