"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (exact; broadcast the query side).
Scale path: IVF — deterministic coarse centroids, inverted-list
assignment, probe the top-nprobe lists per query. Everything is
DataFrame expressions (zip_with/aggregate dot products stay in
whole-stage codegen); the only shuffles are fine-grained groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus scan — no shuffle of the corpus, one pass."""
    c = (
        corpus.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("cv"))
        .withColumn("cnorm", _norm(F.col("cv")))
    )
    q = (
        queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
        .withColumn("qnorm", _norm(F.col("qv")))
    )
    pairs = c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
    # an all-zero embedding has norm 0 and Spark 4 ANSI raises on the
    # division — a NULL cosine instead (desc ordering sorts NULLs last,
    # so degenerate vectors simply never make top-k)
    denom = F.col("qnorm") * F.col("cnorm")
    cos = F.when(denom > 0, _dot(F.col("qv"), F.col("cv")) / denom)
    scored = pairs.select("qid", "nid", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _spherical_kmeans(X, k: int, iters: int = 10):
    """Deterministic spherical k-means (cosine) on a numpy sample.
    Init = first k rows of the (hash-ordered) sample; Lloyd iterations
    with re-normalized mean centroids. Empty clusters keep their previous
    centroid (stable, deterministic)."""
    import numpy as np

    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:k].copy()
    for _ in range(iters):
        assign = (Xn @ C.T).argmax(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                v = Xn[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[j] = v / nv
    return C


def ivf_build(
    corpus: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 4096,
    train_iters: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """IVF index: spherical-k-means centroids trained driver-side on a
    deterministic bounded sample (the ``train_sample`` corpus vectors
    with the smallest xxhash64(id) — the faiss-style train-on-sample
    pattern, so index build cost is independent of corpus size), then
    every vector is assigned map-side to its nearest centroid by cosine.
    Returns (centroids, assigned) DataFrames.

    Centroid ids are fixed integers baked into a literal DataFrame —
    both downstream consumers (inverted-list assignment and query
    routing) see the identical broadcast centroid table, and the corpus
    itself is never collected or shuffled.
    """
    base = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv")))
    sample = (
        base.withColumn("_h", F.xxhash64(F.col("nid")))
        .orderBy("_h")
        .limit(train_sample)
        .select("cv")
        .collect()  # bounded index-build sample, never the corpus
    )
    import numpy as np

    X = np.asarray([r["cv"] for r in sample], dtype=np.float64)
    k = min(num_centroids, len(X))
    C = _spherical_kmeans(X, k, train_iters)
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(k)],
        "cid int, centroid array<double>",
    ).withColumn("centnorm", _norm(F.col("centroid")))

    # Map-side assignment: centroids are unit vectors, so the nearest
    # centroid by cosine is argmax(cv @ C^T) — the per-row norm is a
    # positive scalar that cannot change the argmax. One Arrow-batched
    # matmul per batch, ZERO shuffle of the corpus (the previous shape —
    # crossJoin + row_number() OVER (PARTITION BY nid) — hash-shuffled
    # corpus x k rows, a non-starter at 10^12 vectors). Ties resolve to
    # the smallest cid (np.argmax first occurrence), matching the old
    # (desc sim, asc cid) ranking.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nearest(cv):
        M = np.stack(cv.to_numpy())
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf cannot resolve
    _nearest.__annotations__ = {"cv": pd.Series, "return": pd.Series}
    _nearest_cid = pandas_udf(_nearest, "int")

    assigned = base.withColumn("cid", _nearest_cid(F.col("cv")))
    return cents, assigned


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: route each query to its ``nprobe`` nearest centroids and
    search only those inverted lists — scanning ~nprobe/num_centroids of
    the corpus per query instead of all of it."""
    cents, assigned = ivf_build(corpus, num_centroids, vec_col, id_col)
    q = (
        queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
        .withColumn("qnorm", _norm(F.col("qv")))
    )
    qc = q.crossJoin(F.broadcast(cents))
    qdenom = F.col("qnorm") * F.col("centnorm")
    qcos = F.when(qdenom > 0, _dot(F.col("qv"), F.col("centroid")) / qdenom)
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qc.select("qid", "qv", "qnorm", "cid", qcos.alias("csim"))
        .withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= nprobe)
        .select("qid", "qv", "qnorm", "cid")
    )
    cand = probes.join(assigned, "cid").where(F.col("qid") != F.col("nid"))
    cdenom = F.col("qnorm") * F.col("cnorm")
    cos = F.when(cdenom > 0, _dot(F.col("qv"), F.col("cv")) / cdenom)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.select("qid", "nid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
