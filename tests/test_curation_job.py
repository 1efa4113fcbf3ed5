"""End-to-end curation funnel (jobs/curation_job.py): stage counts are
monotone, planted junk is removed at the right stage, packing conserves
surviving tokens, and the whole run is deterministic (re-run equals
first run, the resumability contract)."""

import json

from pyspark.sql import functions as F

from jobs.curation_job import curate, main


def _corpus(spark):
    """60 good docs + planted junk: an exact-dup pair, a near-dup pair,
    a too-short doc, a no-stopword doc, and a PII-bearing doc."""
    stop = "the of and to in is that it was for"
    good = [
        (i, f"{stop} item{i} " + " ".join(f"tok{i}x{j}" for j in range(30)),
         f"src{i % 3}")
        for i in range(60)
    ]
    base = f"{stop} shared " + " ".join(f"dup{j}" for j in range(30))
    planted = [
        (100, base, "src0"),                      # exact dup of 101
        (101, base, "src0"),
        (102, base + " tail1 tail2", "src1"),     # near dup of 100/101
        (103, "too short", "src2"),               # quality: too_short
        (104, " ".join(f"z{j}" for j in range(40)), "src0"),  # low_stopword
        (105, f"{stop} mail bob@ex.org ip 10.0.0.1 tel 555-0142 "
              + " ".join(f"p{j}" for j in range(25)), "src1"),
    ]
    return spark.createDataFrame(
        good + planted, "doc_id long, text string, source string"
    )


def test_curation_funnel_stages_and_determinism(spark):
    docs = _corpus(spark)
    seg1, addr1, stats = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4
    )
    assert stats["docs_in"] == 66
    # quality drops 103 (too_short) and 104 (low_stopword)
    assert stats["after_quality"] == 64
    # funnel is monotone
    assert (
        stats["docs_in"]
        >= stats["after_quality"]
        >= stats["after_near_dup"]
        >= stats["after_passage_dedup"]
        >= stats["after_mix"]
    )
    # the exact/near-dup trio collapses to exactly ONE representative
    # (collapse runs BEFORE the passage filter, so duplicated content
    # survives once instead of vanishing entirely)
    survivors = {
        r["doc_id"]
        for r in seg1.select("doc_id").distinct().collect()
    }
    assert len(survivors & {100, 101, 102}) == 1
    assert stats["pii_removed"] >= 3  # email + ip + phone from doc 105
    # packing conserves every surviving token
    seg_tokens = seg1.groupBy("doc_id").agg(F.sum("tok_len").alias("t"))
    joined = (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .join(seg_tokens, "doc_id")
    )
    # redaction can only shrink whitespace token counts (multi-word PII
    # collapses to one placeholder); every other doc must match exactly
    bad = joined.where("t > n").count()
    assert bad == 0
    assert stats["tokens_packed"] == seg1.select(F.sum("tok_len")).first()[0]
    # addresses: a permutation of the packed sequences
    assert addr1.count() == stats["sequences"]
    # determinism: byte-identical on re-run
    seg2, addr2, stats2 = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4
    )
    assert stats2 == {k: v for k, v in stats.items()}
    a = seg1.toPandas().sort_values(["source", "shard", "seq_id", "doc_id",
                                     "tok_start"]).reset_index(drop=True)
    b = seg2.toPandas().sort_values(["source", "shard", "seq_id", "doc_id",
                                     "tok_start"]).reset_index(drop=True)
    assert a.equals(b)


def test_curation_job_cli(spark, tmp_path, capsys):
    docs = _corpus(spark)
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "curated")
    rc = main([
        "--input", inp, "--output", out,
        "--seq-len", "32", "--pack-shards", "2",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 66 and stats["sequences"] > 0
    seg = spark.read.parquet(f"{out}/segments")
    assert seg.count() == stats["segments"]
    # partition layout: shard directories exist for pruned reads
    assert "shard" in seg.columns
    addr = spark.read.parquet(f"{out}/addresses")
    assert addr.count() == stats["sequences"]


def test_curation_funnel_lm_gate(spark):
    # with the LM gate enabled, an out-of-distribution gibberish doc
    # (unique unseen-bigram vocabulary) is dropped between near-dup and
    # passage-dedup; in-distribution docs survive
    docs = _corpus(spark)
    _seg, _addr, stats = curate(
        spark, docs, max_ppl=150.0, seq_len=32, pack_shards=2,
        shuffle_shards=4,
    )
    assert "after_lm_ppl" in stats
    assert stats["after_lm_ppl"] <= stats["after_near_dup"]
    # monotone funnel with the extra stage
    assert stats["after_passage_dedup"] <= stats["after_lm_ppl"]
    # gate disabled -> stage absent, rest of funnel unchanged shape
    _s2, _a2, stats2 = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4
    )
    assert "after_lm_ppl" not in stats2


def test_curation_funnel_substring_stage(spark):
    # plant a shared 12-word boilerplate run inside two otherwise-
    # distinct good docs: the span stage must strip it from the later
    # doc only, and a doc that is nothing but the boilerplate is
    # dropped entirely (left empty after the cut)
    stop = "the of and to in is that it was for"
    boiler = " ".join(f"bp{j}" for j in range(12))
    docs = spark.createDataFrame(
        [
            (i, f"{stop} item{i} "
             + " ".join(f"tok{i}x{j}" for j in range(30)), f"src{i % 3}")
            for i in range(40)
        ]
        + [
            (200, f"{stop} first {boiler} "
             + " ".join(f"a{j}" for j in range(20)), "src0"),
            (201, f"{stop} second {boiler} "
             + " ".join(f"b{j}" for j in range(20)), "src1"),
            (202, f"{stop} {boiler}", "src2"),  # boilerplate-only tail
        ],
        "doc_id long, text string, source string",
    )
    seg, _addr, stats = curate(
        spark, docs, substring_span=8, seq_len=32, pack_shards=2,
        shuffle_shards=4,
    )
    assert stats["substring_tokens_removed"] >= 12
    assert stats["after_substring"] <= stats["after_passage_dedup"]
    # monotone + packing still conserves surviving tokens
    assert stats["tokens_packed"] > 0
    # without the stage, the keys are absent
    _s2, _a2, s2 = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4
    )
    assert "after_substring" not in s2 and "substring_tokens_removed" not in s2


def test_curation_funnel_decontam_stage(spark):
    docs = _corpus(spark)
    # eval set = an 8-gram unique to doc 7 (the shared stopword prefix
    # would legitimately flag EVERY doc): only doc 7 must be removed
    # between quality and near-dup
    ev = spark.createDataFrame(
        [(999, " ".join(f"tok7x{j}" for j in range(5, 13)))],
        "doc_id long, text string",
    )
    _seg, _addr, stats = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4,
        eval_docs=ev,
    )
    assert stats["after_decontam"] == stats["after_quality"] - 1
    # without the stage the key is absent entirely
    _s2, _a2, s2 = curate(
        spark, docs, seq_len=32, pack_shards=2, shuffle_shards=4
    )
    assert "after_decontam" not in s2
