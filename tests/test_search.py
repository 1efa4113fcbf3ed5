"""Full-text search operators (operators/search.py): BM25 top-k,
batched multi-query BM25, TF-IDF keywords — brute-force verified
against a pure-Python scorer, plus plan-shape gates (broadcast stats,
array-filter before explode, TakeOrderedAndProject / WindowGroupLimit
top-k). The value-level DuckDB oracles are doc_bm25_topk /
doc_tfidf_keywords in plans/oracle_queries.py."""

import math

import pytest

K1, B = 1.2, 0.75

DOCS = [
    (0, "spark shuffle join hash join join", "s0"),
    (1, "dup dup scan table", "s0"),
    (2, "the quick brown fox", "s1"),
    (3, "hash hash hash hash hash hash", "s1"),
    (4, "spark dup", "s2"),
    (5, "join", "s2"),
    (6, "scan filter project scan", "s3"),
]


def _brute_bm25(docs, terms, k1=K1, b=B):
    """Reference scorer: Lucene-variant BM25, raw python floats."""
    toks = {d: t.split(" ") for d, t, _s in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dft = {
        t: sum(1 for w in toks.values() if t in w) for t in set(terms)
    }
    out = {}
    for d, w in toks.items():
        score, hits = 0.0, 0
        for t in set(terms):
            tf = w.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(w) / avgdl)
            )
        if hits:
            out[d] = (round(score, 6), hits)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )


def test_bm25_matches_brute_force(spark, docs_df):
    from pyhctsa_spark.operators.search import bm25_topk

    terms = ["spark", "hash", "dup"]
    got = bm25_topk(docs_df, terms, k=10).collect()
    want = _brute_bm25(DOCS, terms)
    assert {r.doc_id: (r.score6, r.n_terms_hit) for r in got} == want
    # ranks follow (score desc, doc_id asc) exactly
    order = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == [
        d for d, _ in order
    ]


def test_bm25_k_truncates(spark, docs_df):
    from pyhctsa_spark.operators.search import bm25_topk

    got = bm25_topk(docs_df, ["hash", "spark", "dup"], k=2).collect()
    assert len(got) == 2 and sorted(r.rank for r in got) == [1, 2]


def test_bm25_duplicate_query_terms_collapse(spark, docs_df):
    from pyhctsa_spark.operators.search import bm25_topk

    once = bm25_topk(docs_df, ["hash", "dup"], k=10).collect()
    twice = bm25_topk(docs_df, ["hash", "dup", "hash"], k=10).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_bm25_unmatched_terms_and_empty_query(spark, docs_df):
    from pyhctsa_spark.operators.search import bm25_topk

    assert bm25_topk(docs_df, ["zzz"], k=5).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [], k=5)


def test_bm25_multi_agrees_with_single(spark, docs_df):
    from pyhctsa_spark.operators.search import bm25_topk, bm25_topk_multi

    queries = {
        "qa": ["spark", "hash", "dup"],
        "qb": ["join"],
        "qc": ["scan", "filter"],
    }
    qdf = spark.createDataFrame(
        [(q, ts) for q, ts in queries.items()],
        "query_id string, terms array<string>",
    )
    multi = bm25_topk_multi(docs_df, qdf, k=3).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query_id, []).append(
            (r.rank, r.doc_id, r.score6, r.n_terms_hit)
        )
    for q, terms in queries.items():
        single = [
            (r.rank, r.doc_id, r.score6, r.n_terms_hit)
            for r in bm25_topk(docs_df, terms, k=3).collect()
        ]
        assert sorted(by_q.get(q, [])) == sorted(single), q


def test_tfidf_keywords_brute_force(spark, docs_df):
    from pyhctsa_spark.operators.search import tfidf_keywords

    got = tfidf_keywords(docs_df, top_n=2).collect()
    toks = {d: t.split(" ") for d, t, _s in DOCS}
    n = len(DOCS)
    vocab = {t for w in toks.values() for t in w}
    dft = {t: sum(1 for w in toks.values() if t in w) for t in vocab}
    for d, w in toks.items():
        scores = sorted(
            (
                (round(w.count(t) * math.log(n / dft[t]), 6), t)
                for t in set(w)
            ),
            key=lambda st: (-st[0], st[1]),
        )[:2]
        mine = sorted(
            (r.kw_rank, r.term, r.tfidf6) for r in got if r.doc_id == d
        )
        assert mine == [
            (i + 1, t, s) for i, (s, t) in enumerate(scores)
        ], d


def test_inverted_index_postings(spark, docs_df):
    from pyhctsa_spark.operators.search import build_inverted_index

    idx = {
        (r.term, r.doc_id): (r.tf, r.dl)
        for r in build_inverted_index(docs_df).collect()
    }
    assert idx[("join", 0)] == (3, 6)
    assert idx[("hash", 3)] == (6, 6)
    assert ("zzz", 0) not in idx
    # every (term, doc) pair is distinct — grouped, not raw occurrences
    assert len(idx) == len({k for k in idx})


def test_bm25_plan_shape(spark, docs_df):
    """Scale gates: query-term prune on the token array BEFORE the
    explode (scan-side, inside codegen), df_t + corpus stats broadcast,
    and the global top-k as TakeOrderedAndProject — never a
    single-partition global window over all matching docs."""
    from pyhctsa_spark.operators.search import bm25_topk

    plan = (
        bm25_topk(docs_df, ["hash", "dup"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan
    gen = plan.split("Generate explode")[-1]
    assert "filter(" in gen, plan  # array filter below the explode


def test_tfidf_plan_uses_window_group_limit(spark, docs_df):
    from pyhctsa_spark.operators.search import tfidf_keywords

    plan = (
        tfidf_keywords(docs_df, top_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("WindowGroupLimit") >= 2, plan


EMB = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.5, 0.5, 0.0]),
    (4, [-1.0, 0.0, 0.0]),
    (5, [0.8, 0.0, 0.6]),
    (6, [0.0, 0.0, 0.0]),  # zero-norm: NULL cosine, excluded
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def _brute_cos_ranks(emb, qid, pool):
    qe = dict(emb)[qid]
    qn = math.sqrt(sum(x * x for x in qe))
    scored = []
    for vid, e in emb:
        if vid == qid:
            continue
        nrm = math.sqrt(sum(x * x for x in e)) * qn
        if nrm == 0:
            continue
        scored.append(
            (vid, round(sum(x * y for x, y in zip(e, qe)) / nrm, 6))
        )
    scored.sort(key=lambda t: (-t[1], t[0]))
    return {vid: r + 1 for r, (vid, _c) in enumerate(scored[:pool])}


def test_hybrid_rrf_matches_brute_force(spark, docs_df, emb_df):
    """Fused ordering == a pure-python RRF over the brute BM25 and
    brute cosine rank lists, including docs present in only one list
    and the zero-norm vector excluded from the dense side."""
    from pyhctsa_spark.operators.search import hybrid_rrf_topk

    terms = ["spark", "hash", "dup"]
    pool, k_rrf = 4, 60
    bm_scores = _brute_bm25(DOCS, terms)
    bm_order = sorted(bm_scores, key=lambda d: (-bm_scores[d][0], d))
    bm_ranks = {d: r + 1 for r, d in enumerate(bm_order[:pool])}
    cos_ranks = _brute_cos_ranks(EMB, 0, pool)
    fused = {
        d: round(
            (1.0 / (k_rrf + bm_ranks[d]) if d in bm_ranks else 0.0)
            + (1.0 / (k_rrf + cos_ranks[d]) if d in cos_ranks else 0.0),
            6,
        )
        for d in set(bm_ranks) | set(cos_ranks)
    }
    want = sorted(fused, key=lambda d: (-fused[d], d))
    got = hybrid_rrf_topk(
        docs_df, emb_df, terms, query_vec_id=0, k=10, pool=pool
    ).collect()
    assert [r.doc_id for r in got] == want
    for r in got:
        assert r.fused6 == pytest.approx(fused[r.doc_id], abs=0)
        assert r.r_bm25 == bm_ranks.get(r.doc_id)
        assert r.r_cos == cos_ranks.get(r.doc_id)
    assert [r.rank for r in got] == list(range(1, len(want) + 1))


def test_hybrid_rrf_plan_shape(spark, docs_df, emb_df):
    """Both towers end in pool-sized TakeOrderedAndProject and the
    1-row query vector is broadcast — no corpus-sized shuffle feeds
    the fusion join."""
    from pyhctsa_spark.operators.search import hybrid_rrf_topk

    plan = (
        hybrid_rrf_topk(docs_df, emb_df, ["hash", "dup"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row query vec


def test_cosine_multi_agrees_with_single(spark, emb_df):
    """Batched dense tower == the single-query ranker for each query,
    including the exclude-self id and the zero-norm exclusion."""
    from pyhctsa_spark.operators.search import (
        cosine_topk_multi,
        cosine_topk_ranks,
    )

    qtab = spark.createDataFrame(
        [(100, dict(EMB)[0], 0), (101, dict(EMB)[3], 3)],
        "query_id long, qvec array<float>, exclude_vec_id long",
    )
    multi = cosine_topk_multi(emb_df, qtab, k=4).collect()
    for qid, vid in ((100, 0), (101, 3)):
        single = cosine_topk_ranks(emb_df, vid, pool=4).collect()
        got = sorted(
            [
                (r.r_cos, r.vec_id, r.cos6)
                for r in multi
                if r.query_id == qid
            ]
        )
        want = sorted([(r.r_cos, r.vec_id, r.cos6) for r in single])
        assert got == want, (qid, got, want)


def test_hybrid_multi_agrees_with_single(spark, docs_df, emb_df):
    from pyhctsa_spark.operators.search import (
        hybrid_rrf_topk,
        hybrid_rrf_topk_multi,
    )

    specs = [
        (200, ["spark", "hash", "dup"], 0),
        (201, ["join", "scan"], 4),
    ]
    qtab = spark.createDataFrame(
        [(q, t, dict(EMB)[v], v) for q, t, v in specs],
        "query_id long, terms array<string>, qvec array<float>, "
        "exclude_vec_id long",
    )
    multi = hybrid_rrf_topk_multi(
        docs_df, emb_df, qtab, k=10, pool=4
    ).collect()
    for qid, terms, vid in specs:
        single = hybrid_rrf_topk(
            docs_df, emb_df, terms, query_vec_id=vid, k=10, pool=4
        ).collect()
        got = [
            (r.rank, r.doc_id, r.fused6, r.r_bm25, r.r_cos)
            for r in sorted(
                (r for r in multi if r.query_id == qid),
                key=lambda r: r.rank,
            )
        ]
        want = [
            (r.rank, r.doc_id, r.fused6, r.r_bm25, r.r_cos)
            for r in single
        ]
        assert got == want, (qid, got, want)


def test_hybrid_multi_plan_shape(spark, docs_df, emb_df):
    """Per-query WindowGroupLimit partial top-k in both towers (and
    the fusion), query table broadcast — batched probes never turn
    into a per-query corpus scan."""
    from pyhctsa_spark.operators.search import hybrid_rrf_topk_multi

    qtab = spark.createDataFrame(
        [(0, ["hash"], dict(EMB)[0], 0)],
        "query_id long, terms array<string>, qvec array<float>, "
        "exclude_vec_id long",
    )
    plan = (
        hybrid_rrf_topk_multi(docs_df, emb_df, qtab, k=5, pool=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("WindowGroupLimit") >= 4, plan  # partial+final x2+
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_hybrid_indexed_matches_scan(spark, docs_df, emb_df, tmp_path):
    """Index-served hybrid (persistent inverted index + IVF index,
    both built 80/20 with a delta append) == the scan-based hybrid at
    full probe, column for column."""
    from pyhctsa_spark.operators.search import (
        hybrid_rrf_indexed,
        hybrid_rrf_topk,
    )
    from pyhctsa_spark.operators.search_index import (
        append_to_search_index,
        build_search_index,
    )
    from pyhctsa_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_write_index,
        read_ivf_meta,
    )

    sidx = str(tmp_path / "sidx")
    build_search_index(docs_df.where("doc_id % 3 != 0"), sidx, n_buckets=4)
    append_to_search_index(docs_df.where("doc_id % 3 = 0"), sidx)
    vidx = str(tmp_path / "vidx")
    ivf_write_index(emb_df.where("vec_id % 3 != 0"), vidx, num_centroids=2)
    append_to_ivf_index(emb_df.where("vec_id % 3 = 0"), vidx)
    terms = ["spark", "hash", "dup"]
    got = hybrid_rrf_indexed(
        spark, sidx, vidx, terms, emb_df.where("vec_id = 0"),
        k=10, pool=4, nprobe=read_ivf_meta(vidx)["nlist"],
    ).collect()
    want = hybrid_rrf_topk(
        docs_df, emb_df, terms, query_vec_id=0, k=10, pool=4
    ).collect()
    as_t = lambda rows: [
        (r.rank, r.doc_id, r.fused6, r.r_bm25, r.r_cos) for r in rows
    ]
    assert as_t(got) == as_t(want)


def _brute_rm3(docs, terms, fb_docs, fb_terms, a=0.5, k1=K1, b=B):
    toks = {d: t.split(" ") for d, t, _s in docs}
    bm = _brute_bm25(docs, terms, k1, b)
    fb = sorted(bm, key=lambda d: (-bm[d][0], d))[:fb_docs]
    ew = {}
    for d in fb:
        w = toks[d]
        for t in set(w) - set(terms):
            ew[t] = ew.get(t, 0.0) + w.count(t) / len(w) * bm[d][0]
    tot = sum(ew.values())
    exp = {t: round(v / tot, 6) for t, v in ew.items()} if tot else {}
    E = sorted(exp, key=lambda t: (-exp[t], t))[:fb_terms]
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    allt = set(terms) | set(E)
    dft = {t: sum(1 for w in toks.values() if t in w) for t in allt}
    out = {}
    for d, w in toks.items():
        s0, se, nexp = 0.0, 0.0, 0
        for t in allt:
            tf = w.count(t)
            if not tf or not dft[t]:
                continue
            idf = math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            c = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(w) / avgdl)
            )
            if t in terms:
                s0 += c
            elif t in E:
                se += exp[t] * c
                nexp += 1
        sc = round(a * s0 + (1 - a) * se, 6)
        if sc > 0:
            out[d] = (sc, nexp)
    return out


def test_bm25_rm3_matches_brute_force(spark, docs_df):
    """Two-pass RM3 == the pure-python replay: feedback selection,
    weight normalization/rounding/truncation, and the interpolated
    second pass, including docs reached ONLY via expansion terms."""
    from pyhctsa_spark.operators.search import bm25_rm3_topk

    terms = ["spark", "dup"]
    for fb_docs, fb_terms in ((2, 3), (10, 10)):
        want = _brute_rm3(DOCS, terms, fb_docs, fb_terms)
        order = sorted(want, key=lambda d: (-want[d][0], d))
        got = bm25_rm3_topk(
            docs_df, terms, k=10, fb_docs=fb_docs, fb_terms=fb_terms
        ).collect()
        assert [r.doc_id for r in got] == order, (fb_docs, got, order)
        for r in got:
            assert r.score6 == pytest.approx(want[r.doc_id][0], abs=1e-9)
            assert r.n_exp_hit == want[r.doc_id][1]
        # expansion must actually recall docs with NO original term
        if fb_terms >= 10:
            only_exp = [r for r in got if r.n_exp_hit > 0]
            assert only_exp, got


def test_mmr_matches_brute_force(spark, docs_df, emb_df):
    """Greedy MMR == a pure-python replay over the brute BM25 pool and
    pairwise cosines: first pick by relevance, later picks trade
    relevance against max similarity to the selected set; docs without
    similarity rows (zero-norm embedding) contribute max-sim 0."""
    from pyhctsa_spark.operators.search import mmr_topk

    terms = ["spark", "hash", "dup"]
    lam, k, pool = 0.7, 4, 10
    bm = _brute_bm25(DOCS, terms)
    cand = sorted(bm, key=lambda d: (-bm[d][0], d))[:pool]
    relmax = max(bm[d][0] for d in cand)
    rel = {d: round(bm[d][0] / relmax, 6) for d in cand}
    embd = dict(EMB)

    def cos6(a, b):
        ea, eb = embd[a], embd[b]
        nrm = math.sqrt(sum(x * x for x in ea)) * math.sqrt(
            sum(x * x for x in eb)
        )
        return round(sum(x * y for x, y in zip(ea, eb)) / nrm, 6) if nrm else None

    picked = []
    while len(picked) < k and len(picked) < len(rel):
        best = None
        for d in rel:
            if d in picked:
                continue
            sims = [
                c for s in picked
                if d in embd and s in embd and (c := cos6(d, s)) is not None
            ]
            obj = round(lam * rel[d] - (1 - lam) * (max(sims) if sims else 0.0), 6)
            if best is None or (-obj, d) < (-best[1], best[0]):
                best = (d, obj)
        picked.append(best[0])
    got = mmr_topk(docs_df, emb_df, terms, k=k, pool=pool, lam=lam).collect()
    assert [r.doc_id for r in got] == picked, (got, picked)
    assert [r.rank for r in got] == list(range(1, len(picked) + 1))
    # diversification must actually bite: the pure-relevance order and
    # the MMR order differ beyond the first pick on this fixture
    relevance_order = sorted(rel, key=lambda d: (-rel[d], d))[:k]
    assert [r.doc_id for r in got] != relevance_order


def test_tower_rank_correlation_brute_force(spark, docs_df, emb_df):
    """rho/tau == a scipy-free python replay on the shared subset,
    plus the degenerate n<2 contract (NULL correlations)."""
    from pyhctsa_spark.operators.search import (
        bm25_topk,
        cosine_topk_ranks,
        tower_rank_correlation,
    )

    terms = ["spark", "hash", "dup"]
    pool = 5
    bmr = {r.doc_id: r.rank for r in bm25_topk(docs_df, terms, k=pool).collect()}
    csr = {r.vec_id: r.r_cos for r in cosine_topk_ranks(emb_df, 0, pool=pool).collect()}
    shared = sorted(set(bmr) & set(csr))
    ra = {d: i + 1 for i, d in enumerate(sorted(shared, key=lambda d: bmr[d]))}
    rb = {d: i + 1 for i, d in enumerate(sorted(shared, key=lambda d: csr[d]))}
    n = len(shared)
    sd2 = sum((ra[d] - rb[d]) ** 2 for d in shared)
    rho = round(1.0 - 6.0 * sd2 / (n * (n * n - 1)), 6) if n >= 2 else None
    cd = sum(
        1 if (rb[a] < rb[b]) == (ra[a] < ra[b]) else -1
        for a in shared for b in shared if ra[a] < ra[b]
    )
    tau = round(cd / (n * (n - 1) / 2.0), 6) if n >= 2 else None
    row = tower_rank_correlation(
        docs_df, emb_df, terms, query_vec_id=0, pool=pool
    ).collect()[0]
    assert row.n_shared == n and n >= 2, (row, n)
    assert row.spearman6 == pytest.approx(rho, abs=1e-9)
    assert row.kendall6 == pytest.approx(tau, abs=1e-9)
    # degenerate: a pool of 1 shares at most one doc -> NULLs
    row1 = tower_rank_correlation(
        docs_df, emb_df, terms, query_vec_id=0, pool=1
    ).collect()[0]
    assert row1.n_shared <= 1
    assert row1.spearman6 is None and row1.kendall6 is None
