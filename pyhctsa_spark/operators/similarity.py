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
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))
    scored = pairs.select("qid", "nid", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_build(
    corpus: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: centroids = the ``num_centroids`` corpus
    vectors with the smallest xxhash64(id) (a seedless deterministic
    sample), then every vector is assigned to its nearest centroid by
    cosine. Returns (centroids, assigned) DataFrames.

    At scale the centroid table is tiny and broadcast; the assignment is
    a map-side operation over the corpus scan.
    """
    base = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv")))
    cents = (
        base.withColumn("_h", F.xxhash64(F.col("nid")))
        .orderBy("_h")
        .limit(num_centroids)
        .select(
            F.monotonically_increasing_id().alias("cid"),
            F.col("cv").alias("centroid"),
            F.col("cnorm").alias("centnorm"),
        )
    )
    joined = base.crossJoin(F.broadcast(cents))
    cos = _dot(F.col("cv"), F.col("centroid")) / (F.col("cnorm") * F.col("centnorm"))
    w = Window.partitionBy("nid").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        joined.select("nid", "cv", "cnorm", "cid", cos.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") == 1)
        .select("nid", "cv", "cnorm", "cid")
    )
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
    qcos = _dot(F.col("qv"), F.col("centroid")) / (F.col("qnorm") * F.col("centnorm"))
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qc.select("qid", "qv", "qnorm", "cid", qcos.alias("csim"))
        .withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= nprobe)
        .select("qid", "qv", "qnorm", "cid")
    )
    cand = probes.join(assigned, "cid").where(F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.select("qid", "nid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
