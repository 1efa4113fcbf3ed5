"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, arXiv:2303.09540).

Lexical dedup (minhash/simhash, operators/dedup.py) misses paraphrases
and near-translations; SemDeDup catches them by working in embedding
space: cluster the corpus with cosine k-means, then WITHIN each
cluster mark every point whose max cosine similarity to an
earlier-ordered cluster member exceeds ``eps`` as a semantic
duplicate. "Earlier" is the paper's ordering — ascending similarity to
the cluster centroid, so the member of a duplicate group that is
FARTHEST from the centroid survives (it carries the most marginal
information). The prior-member rule is a pure upper-triangular max of
the per-cluster similarity matrix — no sequential/greedy state — which
keeps the semantics one joint-free aggregation and makes the whole
operator expressible as ANSI SQL for the value oracle.

Scale shape (the reason this is not a pairwise self-join):

- centroids come from a deterministic bounded sample (the
  ``train_sample`` vectors with the smallest md5(id), the faiss-style
  train-on-sample pattern shared with operators/similarity.ivf_build);
  ``train_iters=0`` skips Lloyd refinement entirely so the assignment
  is replayable in SQL — the production path passes ``train_iters>0``;
- assignment is MAP-SIDE (one Arrow-batched matmul per batch against
  the broadcast centroid matrix) — the corpus is never shuffled or
  collected for routing;
- the ONLY shuffle is one hash partition on ``cid``; each cluster's
  O(|c|^2) similarity work then runs as a blocked BLAS matmul inside
  ``applyInPandas`` (block rows x |c| memory, never the full |c|^2
  matrix), not as a |c|^2-row join. With sqrt-N clusters |c| ~ sqrt(N),
  so per-cluster flops total ~N^1.5 spread over nlist tasks — the same
  budget the SemDeDup paper runs at 100M+ scale;
- a cluster larger than ``max_cluster_rows`` raises instead of
  silently OOMing a task: an oversized cluster means the quantizer
  collapsed (retrain with more centroids), the same contract as
  similarity.ivf_list_stats' skew diagnostic.

No reference counterpart: pyhctsa has no document-pipeline surface
(SURVEY §2.0); this extends the dedup family (exact, minhash-LSH,
simhash, containment, substring, embedding-LSH) with the
embedding-cluster method used for web-scale training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyhctsa_spark.operators.similarity import (
    _as_double,
    _norm,
    _pick_num_centroids,
    _spherical_kmeans,
)


def semdedup_centroids(
    embeddings: DataFrame,
    num_clusters: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_iters: int = 0,
    train_sample: int | None = None,
):
    """Deterministic cluster centroids as a numpy (k, d) unit-row
    matrix: the ``train_sample`` corpus vectors with the smallest
    (md5(id), id) — md5 so the SQL oracle can replay the choice —
    refined by ``train_iters`` spherical-Lloyd steps (0 = the
    oracle-replayable anchors themselves, normalized)."""
    import numpy as np

    if train_sample is None:
        train_sample = (
            num_clusters if train_iters == 0
            else min(131072, max(4096, 32 * num_clusters))
        )
    rows = (
        embeddings.select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("_h", F.md5(F.col("vid").cast("string").cast("binary")))
        .orderBy("_h", "vid")
        .limit(train_sample)
        .select("v")
        .collect()  # bounded train sample, never the corpus
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    k = min(num_clusters, len(X))
    return _spherical_kmeans(X, k, train_iters)


def semdedup(
    embeddings: DataFrame,
    num_clusters: int | None = None,
    eps: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_iters: int = 0,
    train_sample: int | None = None,
    max_cluster_rows: int = 200_000,
    block_rows: int = 2048,
) -> DataFrame:
    """Per-vector SemDeDup verdicts: ``(id, cid, cent_sim,
    max_prior_sim, keep)``.

    - ``cid``: nearest-centroid cluster by cosine (ties -> smallest
      cid; a zero-norm vector has no defined cosine and lands in
      cluster 0 with NULL cent_sim, excluded from similarity work);
    - ``cent_sim``: cosine to the assigned centroid;
    - ``max_prior_sim``: max cosine to any cluster member ordered
      BEFORE this one under (cent_sim ASC NULLS LAST, id ASC) — NULL
      for each cluster's first member;
    - ``keep``: ``max_prior_sim IS NULL OR max_prior_sim < eps`` — the
      filter ``WHERE keep`` is the deduplicated corpus.

    ``num_clusters=None`` scales sqrt-N like the IVF quantizer. The
    default ``eps=0.95`` is the paper's LAION operating point; lower it
    toward ~0.5 for text encoders with tighter cones.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if num_clusters is None:
        num_clusters = _pick_num_centroids(embeddings.count())
    C = semdedup_centroids(
        embeddings, num_clusters, vec_col, id_col, train_iters, train_sample
    )
    cnorm = np.linalg.norm(C, axis=1)
    # a zero-norm centroid has no defined cosine: never wins assignment
    Cdir = np.where(cnorm[:, None] > 0, C / np.maximum(cnorm, 1e-300)[:, None], 0.0)
    dead = cnorm == 0

    def _assign(v: pd.Series) -> pd.DataFrame:
        M = np.stack(v.to_numpy())
        vn = np.linalg.norm(M, axis=1)
        cos = M @ Cdir.T
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(vn[:, None] > 0, cos / vn[:, None], np.nan)
        cos[:, dead] = np.nan
        # argmax with NaN-safe smallest-cid tie-break: NaN -> -inf so a
        # fully-NaN row (zero-norm vector) falls through to cid 0
        safe = np.where(np.isnan(cos), -np.inf, cos)
        cid = safe.argmax(axis=1)
        best = cos[np.arange(len(cid)), cid]
        return pd.DataFrame({"cid": cid.astype(np.int32), "cent_sim": best})

    _assign.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    assign_udf = pandas_udf(_assign, "struct<cid:int, cent_sim:double>")

    base = embeddings.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    assigned = (
        base.withColumn("_a", assign_udf(F.col("v")))
        .select("vid", "v", F.col("_a.cid").alias("cid"),
                F.col("_a.cent_sim").alias("cent_sim"))
    )

    id_type = dict(base.dtypes)["vid"]
    out_ddl = (
        f"{id_col} {id_type}, cid int, cent_sim double, "
        "max_prior_sim double, keep boolean"
    )

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster {int(pdf['cid'].iloc[0])} has {n} rows "
                f"(> max_cluster_rows={max_cluster_rows}): the quantizer "
                "collapsed — rebuild with more clusters (sqrt-N rule)"
            )
        pdf = pdf.sort_values(
            ["cent_sim", "vid"], ascending=[True, True],
            na_position="last", kind="mergesort",
        ).reset_index(drop=True)
        M = np.stack(pdf["v"].to_numpy())
        vn = np.linalg.norm(M, axis=1)
        ok = vn > 0
        Mhat = np.where(ok[:, None], M / np.maximum(vn, 1e-300)[:, None], 0.0)
        mps = np.full(n, -np.inf)
        for s in range(0, n, block_rows):
            e = min(s + block_rows, n)
            if e == 1:
                continue  # the first member has no prior
            sims = Mhat[s:e] @ Mhat[:e].T           # (e-s, e) block
            cols = np.arange(e)
            mask = cols[None, :] >= np.arange(s, e)[:, None]
            sims[mask] = -np.inf                    # priors only
            sims[:, ~ok[:e]] = -np.inf              # zero-norm: no cosine
            mps[s:e] = sims.max(axis=1)
        mps[~ok] = -np.inf                          # zero-norm member
        out = pdf[["vid", "cid", "cent_sim"]].copy()
        prior = np.where(np.isfinite(mps), mps, np.nan)
        out["max_prior_sim"] = prior
        out["keep"] = np.isnan(prior) | (prior < eps)
        return out.rename(columns={"vid": id_col})

    return assigned.groupBy("cid").applyInPandas(_cluster, schema=out_ddl)
