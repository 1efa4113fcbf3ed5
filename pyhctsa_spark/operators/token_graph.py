"""Token co-occurrence graph analytics: PageRank-style token centrality
over the corpus's skip-gram graph.

The scale shape is aggregate-to-bounded-graph (the same sufficient-
statistics pattern as operators/pca.py): the corpus-sized work is ONE
combiner-friendly edge aggregation — (x, y) ordered skip-gram pairs
within ``max_dist`` offsets, counts summed map-side — after which the
graph is bounded by the VOCABULARY (|V| nodes, <= |V|^2 but practically
O(|V| * window) weighted edges), not the corpus. The power iteration
then runs driver-side on numpy over the collected edge list and the
scores broadcast back if needed. 100 TB of text with a 50k-token vocab
still collects a few-hundred-thousand-row edge list.

Determinism: a FIXED iteration count (no convergence test — a float
threshold would be engine-dependent), weighted out-degree normalization,
dangling mass redistributed uniformly. The DuckDB oracle replays the
iterations as UNROLLED SQL layers; summation-order noise (~1e-13
relative) is absorbed by the shared round(,6), exactly like the PCA
covariance oracle.

No reference counterpart: pyhctsa has no graph surface beyond
visibility graphs of single series (SURVEY §2.8); this is corpus-level
vocabulary analytics for the training-data pipeline (stopword-ness /
hubness scoring, the TextRank building block).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(
    events_series: DataFrame,
    max_dist: int = 4,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Weighted ordered skip-gram edges (x, y, weight) over each key's
    token series: ONE window pass computes all ``max_dist`` leads in a
    single sort (a per-offset union would re-sort the corpus per offset
    — ReuseExchange dedupes the shuffle but not the sorts), then one
    explode + hash aggregation. Map-side partial sums make the shuffle
    O(distinct pairs) regardless of corpus length."""
    tok = F.round(F.col(value_col).cast("double")).cast("long")
    base = events_series.select(
        F.col(key_col).alias("k"), F.col(order_col).alias("o"),
        tok.alias("x"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    leads = base.select(
        "x",
        F.array(
            *[F.lead("x", d).over(w) for d in range(1, max_dist + 1)]
        ).alias("ys"),
    )
    # explode emits null ELEMENTS (it only skips null/empty arrays):
    # trailing positions yield null leads, filtered below
    return (
        leads.select("x", F.explode("ys").alias("y"))
        .where(F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def token_pagerank(
    edges: DataFrame,
    iters: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration weighted PageRank on the collected bounded edge
    list. Nodes = every token appearing as source or target; uniform
    init 1/N; per iteration r' = (1-d)/N + d * (W_norm^T r + dangling/N)
    with W row-normalized by weighted out-degree. Returns (token, rank)
    as a DataFrame (driver-built literal — the graph is vocabulary-
    bounded by contract; the corpus never reaches the driver)."""
    spark = edges.sparkSession
    rows = edges.collect()  # bounded: vocabulary-sized edge list
    if not rows:
        return spark.createDataFrame([], "token long, rank double")
    xs = np.array([r["x"] for r in rows], dtype=np.int64)
    ys = np.array([r["y"] for r in rows], dtype=np.int64)
    ws = np.array([r["weight"] for r in rows], dtype=np.float64)
    nodes = np.unique(np.concatenate([xs, ys]))
    idx = {int(t): i for i, t in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[int(t)] for t in xs])
    dst = np.array([idx[int(t)] for t in ys])
    out_w = np.zeros(n)
    np.add.at(out_w, src, ws)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        # weight-normalized contribution of each edge's source
        np.add.at(contrib, dst, ws * (r[src] / out_w[src]))
        dangling = r[out_w == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    from pyhctsa_spark.operators._local_df import one_slice_df

    return one_slice_df(
        spark,
        [(int(t), float(r[i])) for i, t in enumerate(nodes)],
        "token long, rank double",
    )
