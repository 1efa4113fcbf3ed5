"""Distributed PCA over embedding columns: dimensionality reduction for
the similarity-search / clustering stages of a training-data pipeline
(e.g. project 64-dim embeddings to the top-q principal axes before IVF
bucketing or SemDeDup clustering).

Scale shape — the d x d sufficient-statistics pattern:

1. ONE Arrow pass folds each partition into (sum vector, X^T X matrix,
   count) — d*(d+1) doubles per task regardless of row count. The
   emitted relational partials (i, j, s) merge with a plain
   combiner-friendly SUM; the corpus is never shuffled or collected.
2. The d x d covariance C = E[xx^T] - mean mean^T is assembled
   driver-side (a d^2-row collect), eigendecomposed with LAPACK
   (np.linalg.eigh — symmetric, deterministic), and the top-q
   components are broadcast back.
3. Projection is map-side: one Arrow-batched matmul per batch.

Sign convention: each eigenvector is flipped so its
largest-|magnitude| coordinate is positive (eigenvectors are only
defined up to sign; the convention makes outputs reproducible).

Verification strategy: the covariance statistics are fully
SQL-expressible and value-oracled against DuckDB (emb_covariance);
the eigendecomposition itself cannot be replayed in SQL, so the
projection is pytest-verified through its algebraic invariants instead
(orthonormal components, per-axis projected variance == eigenvalue,
agreement with a single-node numpy PCA of the collected matrix).

No reference counterpart: pyhctsa has no embedding surface (SURVEY
§2.0); pipeline machinery alongside ANN/PQ/SemDeDup.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

_PARTIAL_SCHEMA = "i int, j int, s double, n long"


def _suffstat_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition sufficient statistics as relational rows:
    (i, j>=0, sum of x_i*x_j) for the Gram matrix, (i, -1, sum of x_i)
    for the mean vector, and one (-1, -1, 0, count) row. All merges
    downstream are SUM."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        G = None
        S = None
        n = 0
        for rb in batches:
            col = rb.column(rb.schema.names.index(vec_col))
            if rb.num_rows == 0:
                continue
            flat = col.flatten().to_numpy(zero_copy_only=False)
            d = len(flat) // rb.num_rows
            X = flat.astype(np.float64).reshape(rb.num_rows, d)
            if G is None:
                G = np.zeros((d, d))
                S = np.zeros(d)
            G += X.T @ X
            S += X.sum(axis=0)
            n += rb.num_rows
        if G is None:
            return
        d = G.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        i_col = np.concatenate([ii.ravel(), np.arange(d), [-1]])
        j_col = np.concatenate([jj.ravel(), np.full(d, -1), [-1]])
        s_col = np.concatenate([G.ravel(), S, [0.0]])
        n_col = np.concatenate([np.zeros(d * d + d, np.int64), [n]])
        yield pa.RecordBatch.from_arrays(
            [pa.array(i_col.astype(np.int32)),
             pa.array(j_col.astype(np.int32)),
             pa.array(s_col), pa.array(n_col)],
            names=["i", "j", "s", "n"],
        )

    return df.select(vec_col).mapInArrow(fn, schema=_PARTIAL_SCHEMA)


def covariance_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, cov) rows of the d x d covariance matrix
    C_ij = E[x_i x_j] - mean_i * mean_j — the SQL-oracled surface."""
    parts = _suffstat_partials(df, vec_col)
    # d^2+d+1 rows — materialize once (localCheckpoint: released when
    # the result drops) since three branches below read it
    agg = parts.groupBy("i", "j").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    ).localCheckpoint()
    cnt = agg.where("i = -1 AND j = -1").select("n")
    means = agg.where("j = -1 AND i >= 0").select(
        F.col("i").alias("mi"), F.col("s").alias("ms")
    )
    gram = agg.where("i >= 0 AND j >= 0").select("i", "j", "s")
    out = (
        gram.crossJoin(F.broadcast(cnt))
        .join(F.broadcast(means).withColumnRenamed("mi", "i")
              .withColumnRenamed("ms", "mean_i"), "i")
        .join(F.broadcast(means.select(F.col("mi").alias("j"),
                                       F.col("ms").alias("mean_j"))), "j")
        .select(
            "i", "j",
            (F.col("s") / F.col("n")
             - (F.col("mean_i") / F.col("n"))
             * (F.col("mean_j") / F.col("n"))).alias("cov"),
        )
    )
    return out


def pca_fit(df: DataFrame, vec_col: str = "embedding", q: int = 4):
    """(components (q, d), eigenvalues (q,), mean (d,)) from the
    sufficient statistics — one distributed pass + a d^2 collect."""
    parts = _suffstat_partials(df, vec_col)
    rows = (
        parts.groupBy("i", "j").agg(F.sum("s").alias("s"),
                                    F.sum("n").alias("n"))
        .collect()
    )
    n = sum(r["n"] for r in rows if r["i"] == -1 and r["j"] == -1)
    d = max(r["i"] for r in rows) + 1
    G = np.zeros((d, d))
    S = np.zeros(d)
    for r in rows:
        if r["i"] >= 0 and r["j"] >= 0:
            G[r["i"], r["j"]] = r["s"]
        elif r["i"] >= 0:
            S[r["i"]] = r["s"]
    mean = S / n
    C = G / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(C)          # ascending
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T                 # (q, d)
    evals = evals[order]
    # sign convention: largest-|coordinate| positive
    for r_ in range(comps.shape[0]):
        k = np.argmax(np.abs(comps[r_]))
        if comps[r_, k] < 0:
            comps[r_] = -comps[r_]
    return comps, evals, mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-side projection onto the fitted axes: (id, pc1..pcq). One
    Arrow-batched (rows, d) @ (d, q) matmul per batch, no shuffle."""
    comps = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.ascontiguousarray(mean, dtype=np.float64)
    q = comps.shape[0]
    out_ddl = ", ".join([f"{id_col} long"]
                        + [f"pc{k + 1} double" for k in range(q)])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            ids = rb.column(names.index(id_col))
            col = rb.column(names.index(vec_col))
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64).reshape(rb.num_rows, -1)
            P = (X - mu) @ comps.T
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64())]
                + [pa.array(P[:, k]) for k in range(q)],
                names=[id_col] + [f"pc{k + 1}" for k in range(q)],
            )

    return df.select(id_col, vec_col).mapInArrow(fn, schema=out_ddl)
