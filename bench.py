"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...extras}

Headline: the flagship 3-tier rollup (read parquet sequences -> single
mapInPandas pass -> write parquet store), on a deterministic synthetic
sequences table sized by the sf dir (cached under .bench_cache/). Also
times representative oracle queries on the driver's sf tables.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyhctsa_spark.plans import oracle_queries as OQ  # noqa: E402
from pyhctsa_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOCS_PER_SF = 80_000  # sf0.1 -> 8k docs (~23M points), sf0.01 -> 800


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_sequences(spark, n_docs: int) -> str:
    """Generate-once parquet cache of the synthetic sequences table."""
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache", f"seqb_{n_docs}"
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        from pyhctsa_spark.sources.synthetic import sequences_df

        (
            sequences_df(spark, n_docs, binary=True)
            .write.mode("overwrite")
            .parquet(cache)
        )
    return cache


def bench_rollup(spark, seq_path: str) -> dict:
    from pyhctsa_spark.operators.rollup import make_counters, rollup_tiers

    # Partition balance comes from input split sizing (set in main()),
    # not a shuffle: the rollup is row-independent, so a repartition
    # would only add an exchange. salted_repartition() is reserved for
    # the skewed groupBy paths (cascade_from_store, source-partitioned
    # writes).
    df = spark.read.parquet(seq_path)
    total_points = df.selectExpr("sum(n_tok)").first()[0]
    # best of 3: the host has noisy neighbors (BENCH.md, ±3x swings
    # measured on identical code) — retries filter interference spikes
    wall = float("inf")
    n_windows = 0
    for _ in range(3):
        out_dir = tempfile.mkdtemp(prefix="rollup_store_")
        counters = make_counters(spark)
        t0 = time.perf_counter()
        rollup_tiers(df, counters=counters).write.mode("overwrite").parquet(out_dir)
        wall_i = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        if wall_i < wall:
            wall = wall_i
            n_windows = counters["windows_emitted"].value
    return {
        "rollup_sec": round(wall, 3),
        "points": int(total_points),
        "windows": int(n_windows),
        "points_per_sec": round(total_points / wall, 1),
        "rolled_windows_per_sec": round(n_windows / wall, 1),
    }


def bench_quantile_rollup(spark, seq_path: str) -> dict:
    """Exact-quantile tier rollup (mergeable sparse token histograms):
    same shuffle-free single-pass plan as the flagship, order-statistics
    outputs instead of moments."""
    from pyhctsa_spark.operators.quantile_rollup import rollup_quantile_tiers

    df = spark.read.parquet(seq_path)
    total_points = df.selectExpr("sum(n_tok)").first()[0]
    wall = float("inf")
    for _ in range(3):
        out_dir = tempfile.mkdtemp(prefix="qrollup_store_")
        t0 = time.perf_counter()
        rollup_quantile_tiers(df).write.mode("overwrite").parquet(out_dir)
        wall = min(wall, time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "qrollup_sec": round(wall, 3),
        "qrollup_points_per_sec": round(total_points / wall, 1),
    }


def bench_fused_rollup(spark, seq_path: str) -> dict:
    """Fused three-family pass (ALG + exact hist + HLL in one scan) vs
    the sum of the three specialized passes. The ratio measures scan
    dominance: if decode + reshape is the real cost, fused ~= the most
    expensive single pass and the three-pass sum is ~3x worse."""
    from pyhctsa_spark.operators.fused_rollup import rollup_fused_tiers
    from pyhctsa_spark.operators.hll_rollup import rollup_hll_tiers

    df = spark.read.parquet(seq_path)
    total_points = df.selectExpr("sum(n_tok)").first()[0]
    fused = float("inf")
    hll = float("inf")
    for _ in range(3):
        out_dir = tempfile.mkdtemp(prefix="fused_store_")
        t0 = time.perf_counter()
        rollup_fused_tiers(df).write.mode("overwrite").parquet(out_dir)
        fused = min(fused, time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
        out_dir = tempfile.mkdtemp(prefix="hllroll_store_")
        t0 = time.perf_counter()
        rollup_hll_tiers(df).write.mode("overwrite").parquet(out_dir)
        hll = min(hll, time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "fused_rollup_sec": round(fused, 3),
        "fused_points_per_sec": round(total_points / fused, 1),
        "hllrollup_sec": round(hll, 3),
    }


def bench_feature_matrix(spark, seq_path: str, n_docs_cap: int = 600) -> dict:
    """hctsa-style feature extraction throughput: a 24-op registry subset
    over whole doc series (the reference's extract() analogue)."""
    from pyhctsa_spark.functions import entropy as E
    from pyhctsa_spark.functions import kernels as K
    from pyhctsa_spark.functions import model as M
    from pyhctsa_spark.operators.features import extract_features
    from pyhctsa_spark.plans.registry import FeatureSet, Operation, expand

    fs = FeatureSet(
        expand(
            [
                Operation(K.mean_, "DN_Mean"),
                Operation(K.spread_std, "DN_Spread_std"),
                Operation(K.spread_iqr, "DN_Spread_iqr"),
                Operation(K.burstiness, "DN_Burstiness"),
                Operation(K.autocorr_fourier, "AC", ["tau"],
                          [{"tau": [1, 2, 3, 5, 10], "zscore": True}]),
                Operation(K.trev, "CO_trev", ["tau"], [{"tau": [1], "zscore": True}]),
                Operation(K.tc3, "CO_tc3", ["tau"], [{"tau": [1], "zscore": True}]),
                Operation(K.first_crossing_ac, "CO_FirstCrossing",
                          configs=[{"zscore": True}]),
                Operation(K.stat_av, "SY_StatAv", ["what_type", "n"],
                          [{"what_type": "seg", "n": [5], "zscore": True}]),
                Operation(K.trend, "SY_Trend", configs=[{"zscore": True}]),
                Operation(K.cid_ce, "EN_CID", configs=[{"zscore": True}]),
                Operation(E.perm_entropy_ref, "EN_PermEn", ["m"],
                          [{"m": [3], "zscore": True}]),
                Operation(E.distribution_entropy, "EN_DistributionEntropy",
                          ["hist_or_ks", "num_bins"],
                          [{"hist_or_ks": "hist", "num_bins": [10], "zscore": True}]),
                Operation(K.motif_two, "SB_MotifTwo", ["binarize_how"],
                          [{"binarize_how": ["diff"], "zscore": True}]),
                Operation(M.hypothesis_test, "HT_HypothesisTest", ["the_test"],
                          [{"the_test": ["jbtest", "lbq"], "zscore": True}]),
            ]
        )
    )
    # pushdown filter instead of .limit(): limit collapses the plan to a
    # single task and serializes the whole extraction (doc ids are
    # zero-padded, so the range predicate prunes at the parquet scan)
    df = spark.read.parquet(seq_path).where(f"doc_id < 'doc{n_docs_cap:010d}'")
    n_docs = df.count()
    t0 = time.perf_counter()
    extract_features(df, fs).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    return {
        "featmat_sec": round(wall, 3),
        "featmat_docs": int(n_docs),
        "featmat_cols": len(fs.columns),
        "featmat_featvals_per_sec": round(n_docs * len(fs.columns) / wall, 1),
    }


def bench_simhash_blocking(spark, n: int = 1_000_000) -> dict:
    """Bucket-fan-out evidence for the SimHash blocking tiers at 1M
    docs: exact candidate-pair counts (sum k*(k-1)/2 over buckets, no
    join) for 4x16-bit vs 8x8-bit chunks, plus the wall-clock of the
    production 4x16 near-pair join on synthetic fingerprints."""
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.dedup import (
        simhash_candidate_count,
        simhash_near_pairs_2x32,
    )

    m32 = (1 << 32) - 1
    fps = spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(m32)).alias("fp_lo"),
        F.xxhash64("id", F.lit(2)).bitwiseAND(F.lit(m32)).alias("fp_hi"),
    )
    fps = fps.persist()
    fps.count()
    cand4 = simhash_candidate_count(fps, n_chunks=4)
    cand8 = simhash_candidate_count(fps, n_chunks=8)
    t0 = time.perf_counter()
    simhash_near_pairs_2x32(fps, max_hamming=3).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    fps.unpersist()
    return {
        "simhash1m_docs": n,
        "simhash1m_cand_4x16": cand4,
        "simhash1m_cand_8x8": cand8,
        "simhash1m_join_4x16_sec": round(wall, 3),
    }


def bench_scale10(spark, seq10_docs: int | None = None) -> dict:
    """10x-scale rows so round-over-round comparisons aren't
    fixed-overhead-dominated: the flagship rollup at 10x the sequence
    count, and minhash/simhash dedup on a 10x documents corpus (each
    doc replicated 10x — 9 exact copies per original, the realistic
    shape of a crawl dedup workload)."""
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.dedup import (
        minhash_verified_pairs,
        simhash_near_pairs_collapsed,
    )
    from pyhctsa_spark.operators.rollup import rollup_tiers

    out: dict = {}
    # rollup at 10x docs (sf1-equivalent point count)
    n10 = seq10_docs or max(400, int(sf_of(SF_DIR) * DOCS_PER_SF) * 10)
    seq10 = ensure_sequences(spark, n10)
    df = spark.read.parquet(seq10)
    pts = df.selectExpr("sum(n_tok)").first()[0]
    wall = float("inf")
    for _ in range(2):  # min-of-reps: noisy host (see BENCH.md protocol)
        t0 = time.perf_counter()
        rollup_tiers(df).write.format("noop").mode("overwrite").save()
        wall = min(wall, time.perf_counter() - t0)
    out["rollup10_sec"] = round(wall, 3)
    out["rollup10_points"] = int(pts)
    out["rollup10_points_per_sec"] = round(pts / wall, 1)

    # 10x documents corpus (cached)
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"docs10_{os.path.basename(SF_DIR.rstrip('/'))}",
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = (
            docs.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
            .withColumn("doc_id", F.col("doc_id") * 100 + F.col("rep"))
            .drop("rep")
        )
        big.write.mode("overwrite").parquet(cache)
    big = spark.read.parquet(cache)
    n_docs10 = big.count()
    out["dedup10_docs"] = int(n_docs10)

    # production clustering path: exact-collapse first, so the 10x
    # duplicate multiplicity never becomes quadratic pair output
    from pyhctsa_spark.operators.dedup import near_dup_clusters

    def _min2(runner) -> float:
        """min-of-2 on the noisy host (one stray neighbor burst
        routinely triples a single-shot number — BENCH.md protocol)."""
        w = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            runner().write.format("noop").mode("overwrite").save()
            w = min(w, time.perf_counter() - t0)
        return w

    out["minhash10_sec"] = round(
        _min2(lambda: minhash_verified_pairs(big, threshold=0.3)), 3
    )
    out["simhash10_sec"] = round(
        _min2(lambda: simhash_near_pairs_collapsed(big, max_hamming=3)), 3
    )
    out["neardup_clusters10_sec"] = round(
        _min2(lambda: near_dup_clusters(big, threshold=0.3)), 3
    )
    # the full curation funnel (quality -> near-dup collapse -> passage
    # dedup -> PII -> mix -> pack -> shuffle) end-to-end on the same 10x
    # corpus — the number a pipeline owner actually plans around
    from jobs.curation_job import curate

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    segments, addresses, cstats = curate(
        spark, big, seq_len=2048, pack_shards=8, shuffle_shards=8
    )
    addresses.write.format("noop").mode("overwrite").save()
    out["curation10_sec"] = round(time.perf_counter() - t0, 3)
    out["curation10_docs_kept"] = int(cstats["after_mix"])
    out["curation10_tokens_packed"] = int(cstats["tokens_packed"])
    out["curation10_sequences"] = int(cstats["sequences"])
    segments.unpersist()
    # LM perplexity gate on the 10x corpus: train on the distinct
    # originals' vocabulary slice + broadcast-score all 10x docs — the
    # skew-proof shape's wall at crawl multiplicity
    from pyspark.sql import functions as F2

    from pyhctsa_spark.operators.lm import lm_perplexity, train_bigram_lm

    wall = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        bi, ctx, v = train_bigram_lm(big.where(F2.col("doc_id") % 100 == 0))
        lm_perplexity(big, bi, ctx, v).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = min(wall, time.perf_counter() - t0)
        bi.unpersist()
    out["lm10_sec"] = round(wall, 3)
    out["lm10_vocab"] = int(v)
    # exact-substring span dedup on the 10x corpus: the exact-collapse
    # fast path keeps the gram table at distinct-content size, so crawl
    # multiplicity costs closed-form member rows, not 10x gram ranking
    from pyhctsa_spark.operators.curation import exact_substring_dedup

    out["substring10_sec"] = round(
        _min2(lambda: exact_substring_dedup(big, span_words=8)), 3
    )
    # HTML->text extraction throughput: web-page-sized documents (the
    # sf docs are ~0.5 KB; a real page is ~5-50 KB, so each doc's text
    # is repeated 12x before wrapping in markup — nav boilerplate +
    # per-sentence <p> tags). The wrapped corpus is CACHED to parquet
    # so the timed pass is scan -> mapInPandas extraction only (the
    # ingestion shape), min of 2 reps.
    from pyhctsa_spark.operators.html_extract import html_extract

    hcache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"html10_{os.path.basename(SF_DIR.rstrip('/'))}",
    )
    if not os.path.exists(os.path.join(hcache, "_SUCCESS")):
        big.select(
            "doc_id",
            F.concat(
                F.lit('<html><head><title>doc</title><style>p{margin:0}'
                      '</style></head><body><nav><a href="/a">home</a> '
                      '&#183; <a href="/b">about</a> &#183; '
                      '<a href="/c">more</a></nav><p>'),
                F.regexp_replace(F.repeat(F.col("text"), 12),
                                 r"\.\s+", ".</p><p>"),
                F.lit("</p></body></html>"),
            ).alias("html"),
        ).write.mode("overwrite").parquet(hcache)
    html10 = spark.read.parquet(hcache)
    mb = html10.select(F.sum(F.length("html"))).first()[0] / 1e6
    wall = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        html_extract(html10).write.format("noop").mode("overwrite").save()
        wall = min(wall, time.perf_counter() - t0)
    out["html10_sec"] = round(wall, 3)
    out["html10_mb"] = round(mb, 1)
    out["html10_mb_per_sec"] = round(mb / wall, 1)
    # incremental dedup: index the 10x corpus ONCE (the amortized
    # one-time cost), then probe a 2% "new crawl batch" against it —
    # the recurring cost a daily pipeline actually pays. The probe's
    # plan never shuffles the index (delta bands broadcast against the
    # bands scan), so probe wall tracks the index SCAN, not a recompute.
    import shutil
    import tempfile

    from pyhctsa_spark.operators.dedup_index import (
        build_minhash_index,
        query_minhash_index,
    )

    idx_root = tempfile.mkdtemp(prefix="bench_mhidx_")
    idx_dir = idx_root + "/idx"
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    build_minhash_index(big, idx_dir, threshold=0.3)
    out["index_build10_sec"] = round(time.perf_counter() - t0, 3)
    delta = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("doc_id % 5 = 0")
        .withColumn("doc_id", F.col("doc_id") * 100 + F.lit(99))
    )
    out["index_probe10_delta_docs"] = int(delta.count())
    wall = float("inf")
    pairs = 0
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = query_minhash_index(delta, idx_dir, big).count()
        wall = min(wall, time.perf_counter() - t0)
    out["index_probe10_sec"] = round(wall, 3)
    out["index_probe10_pairs"] = int(pairs)
    shutil.rmtree(idx_root, ignore_errors=True)
    # full-text search at 10x: ad-hoc corpus-scan BM25 (what a one-off
    # audit pays) vs the persistent inverted index (one-time build,
    # then every query is a partition-pruned probe over ~|q| of the
    # term buckets — the steady-state cost).
    from pyhctsa_spark.operators.search import bm25_topk
    from pyhctsa_spark.operators.search_index import (
        build_search_index,
        query_search_index,
    )

    sq = ["dup", "spark", "hash", "join"]
    wall = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        bm25_topk(big, sq, k=10).count()
        wall = min(wall, time.perf_counter() - t0)
    out["search_scan10_sec"] = round(wall, 3)
    sidx_root = tempfile.mkdtemp(prefix="bench_sidx_")
    sidx = sidx_root + "/idx"
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    build_search_index(big, sidx, n_buckets=64)
    out["search_index_build10_sec"] = round(time.perf_counter() - t0, 3)
    wall = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        query_search_index(spark, sidx, sq, k=10).count()
        wall = min(wall, time.perf_counter() - t0)
    out["search_probe10_sec"] = round(wall, 3)
    shutil.rmtree(sidx_root, ignore_errors=True)
    # steady-state hybrid retrieval: both towers from PREBUILT indexes
    # over the sf-native aligned documents+embeddings tables — one-time
    # build, then every fused query is two partition-pruned probes
    # (term buckets + IVF lists at nprobe=4) and a <= 2*pool-row fusion.
    from pyhctsa_spark.operators.search import hybrid_rrf_indexed
    from pyhctsa_spark.operators.similarity import ivf_write_index

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    h_root = tempfile.mkdtemp(prefix="bench_hybrid_")
    hsidx, hvidx = h_root + "/sidx", h_root + "/vidx"
    t0 = time.perf_counter()
    build_search_index(docs1, hsidx, n_buckets=16)
    ivf_write_index(emb1, hvidx)  # sqrt-N centroids
    out["hybrid_index_build_sec"] = round(time.perf_counter() - t0, 3)
    qv = emb1.where("vec_id = 0")
    wall = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        hybrid_rrf_indexed(
            spark, hsidx, hvidx, sq, qv, k=10, nprobe=4
        ).count()
        wall = min(wall, time.perf_counter() - t0)
    out["hybrid_probe_sec"] = round(wall, 3)
    shutil.rmtree(h_root, ignore_errors=True)
    return out


def bench_streaming_rollup(spark, seq_path: str) -> dict:
    """Structured-Streaming rollup throughput (availableNow drain of the
    same sequences the batch flagship reads) — quantifies the streaming
    tax vs the batch plan each round."""
    import tempfile

    from pyhctsa_spark.operators.rollup import rollup_tiers  # noqa: F401
    from pyhctsa_spark.streaming.rollup_stream import stream_rollup

    base = tempfile.mkdtemp(prefix="stream_bench_")
    sink, ckpt = os.path.join(base, "sink"), os.path.join(base, "ckpt")
    pts = spark.read.parquet(seq_path).selectExpr("sum(n_tok)").first()[0]
    t0 = time.perf_counter()
    q = stream_rollup(spark, seq_path, sink, ckpt, available_now=True)
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    shutil.rmtree(base, ignore_errors=True)
    out = {
        "stream_rollup_sec": round(wall, 3),
        "stream_points_per_sec": round(pts / wall, 1),
    }
    # 10x drain: separates the fixed query-start/commit cost from the
    # steady-state rate (the marginal points/sec is the number that
    # scales — measured ~equal to the batch plan, see BENCH.md r4)
    big = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"seqb_{10 * max(40, int(sf_of(SF_DIR) * DOCS_PER_SF))}",
    )
    if not os.path.exists(os.path.join(big, "_SUCCESS")):
        # first round on a fresh .bench_cache: build it here rather than
        # silently omitting the stream10_* metrics (bench_scale10, which
        # also uses it, runs AFTER this function)
        ensure_sequences(spark, 10 * max(40, int(sf_of(SF_DIR) * DOCS_PER_SF)))
    if os.path.exists(os.path.join(big, "_SUCCESS")):
        pts10 = spark.read.parquet(big).selectExpr("sum(n_tok)").first()[0]
        base2 = tempfile.mkdtemp(prefix="stream_bench10_")
        t0 = time.perf_counter()
        q = stream_rollup(spark, big, os.path.join(base2, "s"),
                          os.path.join(base2, "c"), available_now=True)
        q.awaitTermination(1800)
        wall10 = time.perf_counter() - t0
        shutil.rmtree(base2, ignore_errors=True)
        out["stream10_rollup_sec"] = round(wall10, 3)
        out["stream10_points_per_sec"] = round(pts10 / wall10, 1)
        if wall10 > wall:
            out["stream_marginal_points_per_sec"] = round(
                (pts10 - pts) / (wall10 - wall), 1
            )
    return out


def bench_ann(spark, k: int = 3, n_queries: int = 20, reps: int = 3) -> dict:
    """IVF recall/cost curve vs exact brute force on the sf embeddings:
    the nprobe knob is the scale path (scan ~nprobe/nlist of the
    corpus), so record recall@k and wall at several probe levels.
    Min-of-reps, INTERLEAVED across probe levels (noisy host: a bad
    window must not land entirely on one configuration)."""
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.similarity import knn_bruteforce, knn_ivf

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < n_queries)
    exact = knn_bruteforce(emb, qs, k=k).toPandas()
    truth = {
        qid: set(g.nid) for qid, g in exact.groupby("qid")
    }
    out: dict = {}
    walls = {np_: float("inf") for np_ in (1, 4, 16)}
    for _ in range(reps):
        for nprobe in (1, 4, 16):
            t0 = time.perf_counter()
            approx = knn_ivf(
                emb, qs, k=k, num_centroids=16, nprobe=nprobe
            ).toPandas()
            walls[nprobe] = min(walls[nprobe], time.perf_counter() - t0)
            rec = sum(
                len(truth[qid] & set(g.nid)) / k
                for qid, g in approx.groupby("qid")
            ) / max(1, len(truth))
            out[f"ann_nprobe{nprobe}_recall"] = round(rec, 3)
    for nprobe, w in walls.items():
        out[f"ann_nprobe{nprobe}_sec"] = round(w, 3)
    return out


# --- 1M-vector IVF gate -------------------------------------------------
# Deterministic clustered corpus, identical between the Spark generator
# and the driver-side numpy ground truth: vector(i) = center(i mod C) +
# 0.25 * trig-noise(i). Pure vectorized trig of the row id — no RNG
# state to synchronize across executors.
ANN1M_N = 1_000_000
ANN1M_DIM = 64
ANN1M_CLUSTERS = 256


def _ann_vec_block(ids):
    import numpy as np

    d = np.arange(ANN1M_DIM, dtype=np.float64)
    c = (ids % ANN1M_CLUSTERS).astype(np.float64)
    centers = np.sin(np.outer(c + 1.0, d + 2.0) * 0.7)
    noise = np.sin(np.outer(ids.astype(np.float64) + 1.0, d + 3.0) * 1.3)
    return centers + 0.25 * noise


def _ensure_ann1m(spark, n: int) -> str:
    """Generate-once parquet cache of the 1M-vector corpus."""
    import pyarrow as pa

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache", f"ann_{n}"
    )
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        return cache

    def gen(batches):
        for rb in batches:
            ids = rb.column(0).to_numpy()
            X = _ann_vec_block(ids)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(list(X))],
                names=["vec_id", "embedding"],
            )

    (
        spark.range(n, numPartitions=32)
        .mapInArrow(gen, "vec_id bigint, embedding array<double>")
        .write.mode("overwrite")
        .parquet(cache)
    )
    return cache


def bench_ann_1m(spark, k: int = 10, n_queries: int = 20,
                 reps: int = 3) -> dict:
    """The scale gate the small-sf curve can't provide: 1M vectors,
    sqrt-N (=1000) inverted lists, a MATERIALIZED index (cid-partitioned
    parquet, salted writes), and recall@k vs an exact numpy ground
    truth at nprobe in {1,4,16}. Partition pruning makes the probe scan
    fraction real I/O savings; walls are min-of-reps interleaved."""
    import numpy as np

    from pyhctsa_spark.operators.similarity import (
        ivf_write_index,
        knn_ivf_index,
    )

    corpus_path = _ensure_ann1m(spark, ANN1M_N)
    corpus = spark.read.parquet(corpus_path)

    # exact ground truth, driver-side from the shared generator
    X = _ann_vec_block(np.arange(ANN1M_N, dtype=np.int64))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn[:n_queries].T  # (N, Q)
    truth = {}
    for q in range(n_queries):
        s = sims[:, q].copy()
        s[q] = -np.inf  # engine excludes qid == nid
        idx = np.lexsort((np.arange(ANN1M_N), -s))[:k]
        truth[q] = set(int(i) for i in idx)
    del X, Xn, sims

    out: dict = {}
    idx_dir = tempfile.mkdtemp(prefix="ivf1m_")
    try:
        t0 = time.perf_counter()
        stats = ivf_write_index(corpus, idx_dir, num_centroids=1000)
        out["ann1m_build_sec"] = round(time.perf_counter() - t0, 3)
        out["ann1m_nlist"] = stats["nlist"]
        out["ann1m_list_skew"] = round(stats["skew_ratio"], 2)

        from pyspark.sql import functions as F

        qs = corpus.where(F.col("vec_id") < n_queries)
        walls = {np_: float("inf") for np_ in (1, 4, 16)}
        for _ in range(reps):
            for nprobe in (1, 4, 16):
                t0 = time.perf_counter()
                approx = knn_ivf_index(
                    spark, idx_dir, qs, k=k, nprobe=nprobe
                ).toPandas()
                walls[nprobe] = min(
                    walls[nprobe], time.perf_counter() - t0
                )
                rec = sum(
                    len(truth[qid] & set(int(n) for n in g.nid)) / k
                    for qid, g in approx.groupby("qid")
                ) / max(1, n_queries)
                out[f"ann1m_nprobe{nprobe}_recall"] = round(rec, 3)
        for nprobe, w in walls.items():
            out[f"ann1m_nprobe{nprobe}_sec"] = round(w, 3)

        # index lifecycle at scale: append a 2% "daily batch" (20k new
        # vectors from the same generator, ids past the corpus) — the
        # wall must look like the delta, not like the build (the
        # delta-proportional contract of append_to_ivf_index). Runs
        # AFTER the recall loop so the extra ids can't perturb the
        # ground-truth comparison; probe wall re-measured on the
        # appended index.
        import pyarrow as pa

        from pyhctsa_spark.operators.similarity import append_to_ivf_index

        n_delta = ANN1M_N // 50
        ids = spark.range(ANN1M_N, ANN1M_N + n_delta).toDF("vec_id")

        def _vec_rows(batches):
            for b in batches:
                vid = b.column("vec_id").to_numpy()
                V = _ann_vec_block(vid)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(vid), pa.array(list(V))],
                    names=["vec_id", "embedding"],
                )

        delta = ids.mapInArrow(
            _vec_rows, "vec_id long, embedding array<double>"
        )
        t0 = time.perf_counter()
        counters = append_to_ivf_index(delta, idx_dir)
        out["ann1m_append2pct_sec"] = round(time.perf_counter() - t0, 3)
        out["ann1m_append_cos"] = round(counters["assign_cos_mean"], 4)
        t0 = time.perf_counter()
        knn_ivf_index(spark, idx_dir, qs, k=k, nprobe=16).toPandas()
        out["ann1m_probe16_after_append_sec"] = round(
            time.perf_counter() - t0, 3
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def bench_pq_1m(spark, k: int = 10, n_queries: int = 20,
                reps: int = 3) -> dict:
    """PQ at 1M vectors: trained codebooks (m=8, ksub=256 -> 8 int16
    codes per 64-dim float32 vector, a 16x scan-size cut), encode cost,
    the full ADC scan wall, IVFPQ (nprobe=16 of 1000 lists) wall, and
    recall@10 for both against the exact ground truth. Walls are
    min-of-reps interleaved (noisy host)."""
    import numpy as np

    from pyhctsa_spark.operators.pq import knn_ivfpq, knn_pq, pq_encode, pq_train
    from pyhctsa_spark.operators.similarity import ivf_build

    corpus_path = _ensure_ann1m(spark, ANN1M_N)
    corpus = spark.read.parquet(corpus_path)

    X = _ann_vec_block(np.arange(ANN1M_N, dtype=np.int64))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn[:n_queries].T
    truth = {}
    for q in range(n_queries):
        s = sims[:, q].copy()
        s[q] = -np.inf
        idx = np.lexsort((np.arange(ANN1M_N), -s))[:k]
        truth[q] = set(int(i) for i in idx)
    del X, Xn, sims

    out: dict = {}
    t0 = time.perf_counter()
    books = pq_train(corpus, m=8, ksub=256, train_iters=10)
    out["pq1m_train_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    codes = pq_encode(corpus, books).persist()
    codes.count()
    out["pq1m_encode_sec"] = round(time.perf_counter() - t0, 3)
    out["pq1m_bytes_per_vec"] = 8 * 2  # vs 64 * 4 = 256 raw

    from pyspark.sql import functions as F

    qs = corpus.where(F.col("vec_id") < n_queries)
    cents, assigned = ivf_build(corpus, num_centroids=1000)
    assigned = assigned.persist()
    assigned.count()

    def recall(df):
        pdf = df.toPandas()
        return sum(
            len(truth[qid] & set(int(n) for n in g.nid)) / k
            for qid, g in pdf.groupby("qid")
        ) / max(1, n_queries)

    # the corpus is 256 tight clusters (~3.9k members each): raw ADC
    # tie-collapses inside a quantization cell, so recall@10 needs the
    # refine step (exact re-rank of the ADC shortlist) with R above the
    # cell occupancy — the faiss IndexRefineFlat pattern. Raw-ADC recall
    # is reported too, as the honest floor.
    walls = {"adc": float("inf"), "rerank": float("inf"),
             "ivfpq16": float("inf")}
    for _ in range(reps):
        t0 = time.perf_counter()
        adc = knn_pq(corpus, qs, k=k, prebuilt=(books, codes))
        out["pq1m_adc_recall"] = round(recall(adc), 3)
        walls["adc"] = min(walls["adc"], time.perf_counter() - t0)
        t0 = time.perf_counter()
        ref = knn_pq(corpus, qs, k=k, prebuilt=(books, codes),
                     rerank=4096)
        out["pq1m_rerank_recall"] = round(recall(ref), 3)
        walls["rerank"] = min(walls["rerank"], time.perf_counter() - t0)
        t0 = time.perf_counter()
        ivfpq = knn_ivfpq(corpus, qs, k=k, nprobe=16,
                          prebuilt=(cents, assigned, books, codes),
                          rerank=4096)
        out["pq1m_ivfpq16_recall"] = round(recall(ivfpq), 3)
        walls["ivfpq16"] = min(walls["ivfpq16"], time.perf_counter() - t0)
    out["pq1m_adc_sec"] = round(walls["adc"], 3)
    out["pq1m_rerank_sec"] = round(walls["rerank"], 3)
    out["pq1m_ivfpq16_sec"] = round(walls["ivfpq16"], 3)
    codes.unpersist()
    assigned.unpersist()
    return out


def bench_queries(spark) -> dict:
    OQ.register_views(spark, SF_DIR)
    # doc_ngram_jaccard is deliberately excluded: it is the exhaustive
    # exact-Jaccard ORACLE (quadratic on raw shingle keys — a skew bomb
    # at scale); the headline near-dup number is the production path,
    # minhash_dedup_pairs (LSH banding + pair-local exact verify).
    picks = [
        "win_mean_var_std",
        "win_ac1_td",
        "win_burstiness",
        "user_statav_len16",
        "user_moment_corr",
        "knn_cosine_top3",
        "doc_quality",
        "user_twa_30m",
        "user_anomaly_z",
        "user_hour_profile",
        "user_hist_p90",
        "user_corr_pairs",
        "user_stl_hourly",
        "user_stl_strength",
        "user_stl_anomaly",
    ]
    # min of 3 INTERLEAVED reps per query: the first run pays one-time
    # driver-side whole-stage-codegen compilation (several seconds for
    # the 64-agg minhash plan) that amortizes over a real workload, and
    # the host has noisy neighbors — interleaving spreads a bad window
    # across ALL queries instead of sinking one query's number
    import __spark_entry__ as entrymod

    engine_picks = ("minhash_dedup_pairs", "simhash_near_pairs",
                    "doc_token_count_bpe_real", "media_real_decode",
                    "user_asof_error", "user_counter_30m", "user_lttb_24",
                    "user_ohlc_30m", "user_ewma", "user_cusum",
                    "user_resample_lin_15m", "user_holt",
                    "user_cagg_refresh",
                    # curation family (round 5): packing, mixing,
                    # redaction, shuffle, passage dedup, LM perplexity
                    # gate, hash split, compressed-audio decode
                    "doc_pack_sequences", "doc_source_mix",
                    "doc_pii_redact", "doc_global_shuffle",
                    "doc_passage_dedup", "doc_lm_ppl", "doc_split",
                    "media_audio_compressed", "media_flac_decode",
                    "doc_substring_dedup", "media_jpeg_lossless",
                    "doc_containment_pairs", "media_webp_decode",
                    "doc_semdedup", "knn_pq_top3",
                    "rollup_hll_distinct", "rollup_hll_cascade",
                    "hll_distinct_by_source", "user_hll_30m",
                    "kmv_distinct_by_source", "kmv_source_overlap",
                    "cms_token_freq_by_source", "doc_contamination_bloom",
                    "user_delete_docs", "emb_covariance", "user_pmi_pairs",
                    "rollup_fused", "doc_temperature_mix",
                    "user_token_pagerank", "user_head_mass",
                    "emb_norm_stats", "doc_sample_per_source",
                    "doc_warc_html_extract",
                    # full-text search (round-5 session 8)
                    "doc_bm25_topk", "doc_tfidf_keywords",
                    # hybrid lexical+dense RRF fusion (session 10);
                    # the index-served steady state is benched in
                    # bench_dedup_10x's search block (build once,
                    # probe min-of-3: hybrid_probe_sec)
                    "doc_hybrid_rrf", "doc_bm25_rm3", "doc_mmr_rerank", "doc_corpus_diff",
                    "emb_hard_negatives", "search_tower_rankcorr",
                    "emb_positive_pairs")
    qs = entrymod.queries()
    best: dict = {}
    for _ in range(3):
        for name in picks:
            t0 = time.perf_counter()
            spark.sql(OQ.spark_sql_for(name)).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(
                best.get(name, float("inf")), time.perf_counter() - t0
            )
        # engine-operator queries (not SQL): time via the driver contract
        for name in engine_picks:
            # drop the operators' persisted intermediates so the retry
            # re-does the real work (only codegen amortizes, not data)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best[name] = min(
                best.get(name, float("inf")), time.perf_counter() - t0
            )
    return {name: round(w, 3) for name, w in best.items()}


def main() -> None:
    sf = sf_of(SF_DIR)
    n_docs = max(40, int(sf * DOCS_PER_SF))
    # Local parquet caches are small; size splits so every core gets
    # work (a real cluster gets this for free from 128MB row groups).
    spark = get_spark(
        "bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    seq_path = ensure_sequences(spark, n_docs)
    # warm the JVM/python workers with a tiny pass, then measure
    spark.read.parquet(seq_path).limit(10).count()
    roll = bench_rollup(spark, seq_path)
    qroll = bench_quantile_rollup(spark, seq_path)
    fusedroll = bench_fused_rollup(spark, seq_path)
    featmat = bench_feature_matrix(spark, seq_path)
    queries = bench_queries(spark)
    simblock = bench_simhash_blocking(spark)
    ann = bench_ann(spark)
    ann1m = bench_ann_1m(spark)
    pq1m = bench_pq_1m(spark)
    streamroll = bench_streaming_rollup(spark, seq_path)
    scale10 = bench_scale10(spark)
    result = {
        "metric": "3-tier rollup wall-clock (synthetic token sequences)",
        "value": roll["rollup_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        **roll,
        **qroll,
        **fusedroll,
        **featmat,
        **simblock,
        **ann,
        **ann1m,
        **pq1m,
        **streamroll,
        **scale10,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
