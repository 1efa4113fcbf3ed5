"""Token graph: edge aggregation vs brute pairs, PageRank invariants
and a hand-checkable hub case."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.token_graph import (
    cooccurrence_edges,
    token_pagerank,
)


@pytest.fixture(scope="module")
def ev(spark):
    # two users with known series
    rows = []
    series = {0: [1, 2, 3, 1, 2], 1: [2, 2, 4]}
    eid = 0
    for u, toks in series.items():
        for t in toks:
            rows.append((eid, u, float(t)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, value double"
    ).cache()


def test_edges_match_bruteforce(spark, ev):
    got = {(r["x"], r["y"]): r["weight"]
           for r in cooccurrence_edges(ev, max_dist=2).collect()}
    want: dict = {}
    for toks in ([1, 2, 3, 1, 2], [2, 2, 4]):
        for i in range(len(toks)):
            for d in (1, 2):
                if i + d < len(toks):
                    k = (toks[i], toks[i + d])
                    want[k] = want.get(k, 0) + 1
    assert got == want


def test_pagerank_invariants_and_hub(spark):
    # star graph: every token points at 9 -> 9 is the top-ranked node
    rows = [(x, 9, 5) for x in range(4)]
    edges = spark.createDataFrame(rows, "x long, y long, weight long")
    pr = {r["token"]: r["rank"]
          for r in token_pagerank(edges, iters=8).collect()}
    assert pytest.approx(sum(pr.values()), rel=1e-9) == 1.0  # stochastic
    assert max(pr, key=pr.get) == 9
    # spokes are symmetric
    spoke = {pr[x] for x in range(4)}
    assert len(spoke) == 1


def test_pagerank_matches_numpy_replay(spark, ev):
    edges = cooccurrence_edges(ev, max_dist=2)
    got = {r["token"]: r["rank"]
           for r in token_pagerank(edges, iters=4).collect()}
    rows = edges.collect()
    nodes = sorted({r["x"] for r in rows} | {r["y"] for r in rows})
    idx = {t: i for i, t in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for r in rows:
        out_w[idx[r["x"]]] += r["weight"]
    rank = np.full(n, 1.0 / n)
    for _ in range(4):
        contrib = np.zeros(n)
        for r in rows:
            s = idx[r["x"]]
            contrib[idx[r["y"]]] += r["weight"] * (rank[s] / out_w[s])
        dang = rank[out_w == 0].sum()
        rank = 0.15 / n + 0.85 * (contrib + dang / n)
    for t in nodes:
        assert got[t] == pytest.approx(rank[idx[t]], rel=1e-12)


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "x long, y long, weight long")
    assert token_pagerank(edges).count() == 0
