"""Semantic invariants for the corpus-curation operators
(operators/curation.py) — the value-level cross-engine checks live in
the oracle catalog (doc_pack_sequences, doc_source_mix, doc_pii_redact,
doc_global_shuffle, doc_passage_dedup); these tests pin the contracts a
hash comparison can't express: packing completeness, sampling
determinism/monotonicity, permutation validity, and the dup-flag
semantics on planted duplicates.
"""

import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.curation import (
    global_shuffle,
    pack_sequences,
    passage_dedup_stats,
    pii_redact,
    source_mix,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _docs(spark, n=60):
    rows = [
        (
            i,
            " ".join(WORDS[(i + j) % len(WORDS)] + str((i * 7 + j) % 23)
                     for j in range(3 + (i * 5) % 40)),
            f"src{i % 4}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def docs(spark):
    return _docs(spark).persist()


def test_pack_covers_every_token_exactly_once(spark, docs):
    seg = pack_sequences(docs, seq_len=16, n_shards=2).toPandas()
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    # every doc fully covered by contiguous spans
    for doc_id, g in seg.groupby("doc_id"):
        g = g.sort_values("tok_start")
        assert g["tok_len"].sum() == ntok[doc_id]
        assert g["tok_start"].iloc[0] == 0
        ends = (g["tok_start"] + g["tok_len"]).to_numpy()
        assert (ends[:-1] == g["tok_start"].to_numpy()[1:]).all()
    # every sequence except the last of each stream is exactly full,
    # and no segment crosses a sequence boundary
    assert ((seg["offset_in_seq"] + seg["tok_len"]) <= 16).all()
    fill = seg.groupby(["source", "shard", "seq_id"])["tok_len"].sum()
    for (src, sh), g in fill.groupby(level=[0, 1]):
        assert (g.iloc[:-1] == 16).all()
        assert g.iloc[-1] <= 16


def test_pack_is_deterministic_across_partitionings(spark, docs):
    a = pack_sequences(docs, seq_len=16, n_shards=2).toPandas()
    b = pack_sequences(docs.repartition(7), seq_len=16, n_shards=2).toPandas()
    key = ["source", "shard", "seq_id", "doc_id", "tok_start"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_source_mix_rates_and_determinism(spark, docs):
    assert source_mix(docs, F.lit(1.0)).count() == docs.count()
    assert source_mix(docs, F.lit(0.0)).count() == 0
    w = {"src0": 1.0, "src1": 0.5}  # src2/src3 unlisted -> dropped
    kept = source_mix(docs, w).toPandas()
    assert set(kept["source"]) <= {"src0", "src1"}
    assert (kept["source"] == "src0").sum() == 15  # all of src0
    again = source_mix(docs, w).toPandas()
    assert sorted(kept["doc_id"]) == sorted(again["doc_id"])
    # monotone: raising a rate only adds rows
    more = source_mix(docs, {"src0": 1.0, "src1": 0.9}).toPandas()
    assert set(kept["doc_id"]) <= set(more["doc_id"])


def test_pii_redact_counts_and_clean_output(spark):
    rows = [
        (0, "mail bob.smith+x@corp.example.org and carol@ex.io now"),
        (1, "server at 10.1.2.3 and 192.168.0.254 port 80"),
        (2, "call 555-0142 or 555-01999 today"),
        (3, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (2, 0, 0)
    assert "@" not in out[0]["redacted"] and out[0]["redacted"].count("<EMAIL>") == 2
    assert (out[1]["n_ips"], out[1]["n_emails"]) == (2, 0)
    assert "10.1.2.3" not in out[1]["redacted"]
    assert out[2]["n_phones"] == 2 and "<PHONE>" in out[2]["redacted"]
    assert out[3]["redacted"] == rows[3][1]


def test_global_shuffle_is_a_permutation(spark, docs):
    out = global_shuffle(docs, n_shards=4).toPandas()
    assert len(out) == 60 and out["doc_id"].nunique() == 60
    assert set(out["shard"]) <= set(range(4))
    for _sh, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    again = global_shuffle(docs.repartition(5), n_shards=4).toPandas()
    key = ["doc_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_passage_dedup_flags_planted_duplicates(spark):
    base = " ".join(f"w{i}" for i in range(32))  # 4 full 8-word blocks
    uniq = " ".join(f"u{i}" for i in range(32))
    rows = [(0, base), (1, base), (2, uniq), (3, "too short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in passage_dedup_stats(df, 8).collect()}
    assert out[0]["dup_frac"] == 1.0 and not out[0]["keep"]
    assert out[1]["dup_frac"] == 1.0 and not out[1]["keep"]
    assert out[2]["dup_frac"] == 0.0 and out[2]["keep"]
    # short doc: no complete block -> NULL stats, kept
    assert out[3]["n_blocks"] == 0 and out[3]["dup_frac"] is None and out[3]["keep"]


def test_split_thresholds_pin_oracle_literals():
    # the integers embedded in ENGINE_ORACLES["doc_split"] — if the
    # default weights or the threshold arithmetic change, the oracle SQL
    # must change with them
    from pyhctsa_spark.operators.curation import split_thresholds

    ths = split_thresholds((("train", 0.9), ("val", 0.05), ("test", 0.05)))
    assert ths == [
        ("train", 3865470566),
        ("val", 4080218931),
        ("test", 4294967296),
    ]


def test_dataset_split_proportions_and_insertion_stability(spark, docs):
    from pyhctsa_spark.operators.curation import dataset_split

    big = _docs(spark, 400)
    got = dataset_split(big).select("doc_id", "split").toPandas()
    frac = got["split"].value_counts(normalize=True)
    assert 0.84 < frac["train"] < 0.96
    assert set(got["split"]) == {"train", "val", "test"}
    # insertion stability: splitting a SUBSET assigns identical labels
    sub = dataset_split(big.where(F.col("doc_id") < 100)).select(
        "doc_id", "split"
    ).toPandas()
    merged = sub.merge(got, on="doc_id", suffixes=("_sub", "_all"))
    assert (merged["split_sub"] == merged["split_all"]).all()


def test_dataset_split_is_map_side_only(spark, docs):
    from pyhctsa_spark.operators.curation import dataset_split

    plan = dataset_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_weights_must_sum_to_one():
    import pytest

    from pyhctsa_spark.operators.curation import split_thresholds

    with pytest.raises(ValueError, match="sum to 1"):
        split_thresholds((("train", 0.6), ("val", 0.2), ("test", 0.1)))
    with pytest.raises(ValueError, match="sum to 1"):
        split_thresholds((("a", 0.9), ("b", 0.2)))


# -- exact_substring_dedup ---------------------------------------------


def _xs_rows(spark, rows):
    from pyhctsa_spark.operators.curation import exact_substring_dedup

    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = exact_substring_dedup(df, span_words=3)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_substring_dedup_keeps_first_occurrence_only(spark):
    # doc a and doc b share the exact 5-word run "p q r s t"; with
    # span_words=3 every covered word of the SECOND (lexicographically
    # later) occurrence is removed, the first is untouched
    shared = "p q r s t"
    res = _xs_rows(
        spark,
        [("a", f"x1 {shared} x2"), ("b", f"y1 y2 {shared} y3")],
    )
    assert res["a"]["tokens_removed"] == 0
    assert res["a"]["clean_text"] == f"x1 {shared} x2"
    assert res["b"]["tokens_removed"] == 5
    assert res["b"]["clean_text"] == "y1 y2 y3"


def test_substring_dedup_overlapping_spans_merge(spark):
    # two duplicated 3-grams overlapping by 2 words in the same doc
    # cover a 4-word union, not 6
    res = _xs_rows(
        spark,
        [
            ("a", "m n o p filler1 filler2"),   # first occurrence of both grams
            ("b", "z1 m n o p z2"),             # m n o + n o p overlap
        ],
    )
    assert res["b"]["tokens_removed"] == 4
    assert res["b"]["clean_text"] == "z1 z2"


def test_substring_dedup_short_and_unique_docs_pass_through(spark):
    res = _xs_rows(
        spark,
        [("a", "u1 u2"), ("b", "v1 v2 v3 v4"), ("c", "")],
    )
    for k, n in (("a", 2), ("b", 4), ("c", 1)):   # '' splits to ['']
        assert res[k]["tokens_removed"] == 0
        assert res[k]["n_words"] == n
    assert res["b"]["clean_text"] == "v1 v2 v3 v4"
    assert res["b"]["dup_frac"] == 0.0


def test_substring_dedup_fully_duplicated_doc_empties(spark):
    res = _xs_rows(
        spark,
        [("a", "d1 d2 d3 d4"), ("b", "d1 d2 d3 d4")],
    )
    assert res["a"]["clean_text"] == "d1 d2 d3 d4"
    assert res["b"]["clean_text"] == ""
    assert res["b"]["dup_frac"] == 1.0


def test_substring_dedup_null_text_kept_with_null_stats(spark):
    from pyhctsa_spark.operators.curation import exact_substring_dedup

    df = spark.createDataFrame(
        [("a", "w1 w2 w3 w4"), ("b", None)], "doc_id string, text string"
    )
    res = {r["doc_id"]: r.asDict() for r in
           exact_substring_dedup(df, span_words=3).collect()}
    assert res["b"]["n_words"] is None
    assert res["b"]["tokens_removed"] is None
    assert res["b"]["clean_text"] is None
    assert res["a"]["tokens_removed"] == 0


def test_substring_dedup_partitioning_invariance(spark):
    from pyhctsa_spark.operators.curation import exact_substring_dedup

    df = _docs(spark, 40)
    a = exact_substring_dedup(df.repartition(1), span_words=4)
    b = exact_substring_dedup(df.repartition(8), span_words=4)
    pa_ = a.orderBy("doc_id").toPandas()
    pb = b.orderBy("doc_id").toPandas()
    assert pa_.equals(pb)


def test_substring_dedup_collapse_is_invisible(spark):
    from pyhctsa_spark.operators.curation import exact_substring_dedup

    # exact copies at multiplicity 4 (fully removed except the first),
    # a cross-content shared span, a short copy pair (< span_words,
    # pass-through), and a NULL text
    boiler = " ".join(f"s{j}" for j in range(6))
    rows = [(i, f"head{i} " + boiler + f" tail{i} t{i}x", "s")
            for i in range(3)]                    # share a 6-word run
    rows += [(10 + i, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "s") for i in range(4)]
    rows += [(20, "sh or t", "s"), (21, "sh or t", "s")]   # short copies
    rows += [(30, None, "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = exact_substring_dedup(df, span_words=4, collapse_exact=True)
    b = exact_substring_dedup(df, span_words=4, collapse_exact=False)
    pa_ = a.orderBy("doc_id").toPandas().reset_index(drop=True)
    pb = b.orderBy("doc_id").toPandas().reset_index(drop=True)
    assert len(pa_) == len(pb) == len(rows)
    for col in pa_.columns:
        sa, sb = pa_[col].astype(str), pb[col].astype(str)
        assert (sa == sb).all(), (col, pa_[sa != sb], pb[sa != sb])
    # the copies after the first are fully removed; the first is intact
    by_id = {r["doc_id"]: r.asDict() for r in a.collect()}
    assert by_id[10]["tokens_removed"] == 0
    for i in (11, 12, 13):
        assert by_id[i]["dup_frac"] == 1.0 and by_id[i]["clean_text"] == ""
    assert by_id[20]["tokens_removed"] == 0  # short: no grams, untouched
    assert by_id[21]["clean_text"] == "sh or t"
    assert by_id[30]["clean_text"] is None


def test_temperature_mix_rates_and_determinism(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.curation import temperature_mix

    rows = ([(f"a{i}", "big") for i in range(900)]
            + [(f"b{i}", "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = temperature_mix(df, tau=0.5).cache()
    rates = {r["source"]: r["rate"]
             for r in out.select("source", "rate").distinct().collect()}
    assert rates["small"] == 1.0
    assert rates["big"] == float(np.sqrt(100 / 900))
    # smallest source keeps EVERYTHING; big source lands near rate*n
    kept = {r["source"]: r["cnt"] for r in
            out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert kept["small"] == 100
    assert abs(kept["big"] - 300) < 60  # md5-uniform, ~sqrt(1/9)*900
    # deterministic: re-run identical
    again = temperature_mix(df, tau=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())
    # tau=1 keeps natural proportions (rate 1 everywhere)
    assert temperature_mix(df, tau=1.0).count() == 1000
    out.unpersist()


# --- corpus_sample: deterministic uniform / ES-weighted k-per-group ---------

def _md5_u32_py(s: str, salt: str) -> int:
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)


def test_corpus_sample_uniform_matches_bruteforce(spark, docs):
    from pyhctsa_spark.operators.curation import corpus_sample

    got = corpus_sample(docs, k=5).toPandas()
    rows = docs.select("doc_id", "source").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (_md5_u32_py(str(r["doc_id"]), "sample:"), r["doc_id"])
        )
    want = set()
    for src, lst in by_src.items():
        for rn, (u, d) in enumerate(sorted(lst)[:5], start=1):
            want.add((d, src, u, rn))
    assert set(map(tuple, got[["doc_id", "source", "sample_u32", "rn"]]
                   .itertuples(index=False))) == want


def test_corpus_sample_weighted_matches_bruteforce(spark, docs):
    import math

    from pyhctsa_spark.operators.curation import corpus_sample

    wdf = docs.withColumn("wt", (F.col("doc_id") % 7 + 1).cast("double"))
    got = corpus_sample(wdf, k=4, weight_col="wt").toPandas()
    by_src = {}
    for r in wdf.select("doc_id", "source", "wt").collect():
        u = _md5_u32_py(str(r["doc_id"]), "sample:")
        key = -math.log((u + 0.5) / 4294967296.0) / r["wt"]
        by_src.setdefault(r["source"], []).append(
            (round(key, 12), r["doc_id"], u, key)
        )
    want = set()
    for src, lst in by_src.items():
        for rn, (_k12, d, u, key) in enumerate(sorted(lst)[:4], start=1):
            want.add((d, src, u, round(key, 6), rn))
    assert set(map(tuple,
                   got[["doc_id", "source", "sample_u32", "sample_key", "rn"]]
                   .itertuples(index=False))) == want


def test_corpus_sample_exact_k_and_partitioning_invariance(spark, docs):
    from pyhctsa_spark.operators.curation import corpus_sample

    out = corpus_sample(docs, k=7).toPandas()
    assert (out.groupby("source")["rn"].count() == 7).all()
    assert (out.groupby("source")["rn"].max() == 7).all()
    again = corpus_sample(docs.repartition(13), k=7).toPandas()
    a = sorted(map(tuple, out[["doc_id", "rn"]].itertuples(index=False)))
    b = sorted(map(tuple, again[["doc_id", "rn"]].itertuples(index=False)))
    assert a == b


def test_corpus_sample_zero_weight_rows_never_sampled(spark, docs):
    from pyhctsa_spark.operators.curation import corpus_sample

    wdf = docs.withColumn(
        "wt", F.when(F.col("doc_id") % 2 == 0, 0.0).otherwise(1.0)
    )
    out = corpus_sample(wdf, k=100, weight_col="wt").toPandas()
    assert (out["doc_id"] % 2 == 1).all()
    # groups smaller than k return every eligible row, ranked
    eligible = docs.where(F.col("doc_id") % 2 == 1).groupBy("source").count()
    want = {r["source"]: r["count"] for r in eligible.collect()}
    got = out.groupby("source")["rn"].count().to_dict()
    assert got == want


def test_corpus_sample_weighted_inclusion_tracks_weight(spark):
    """Across many salts, a 9x-weight doc must be sampled far more
    often than a 1x doc (ES property; exact probabilities are checked
    by the brute-force test, this pins the direction at scale)."""
    from pyhctsa_spark.operators.curation import corpus_sample

    rows = [(i, "s", 9.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, wt double")
    heavy = light = 0
    for trial in range(30):
        out = corpus_sample(df, k=10, weight_col="wt",
                            salt=f"t{trial}:").toPandas()
        heavy += int((out["doc_id"] < 10).sum())
        light += int((out["doc_id"] >= 10).sum())
    # 10 heavy docs hold 50% of total weight: expect roughly half of
    # each draw despite being 10% of the rows
    assert heavy > 3.0 * (light / 9.0) * 2.0


def test_corpus_sample_plan_uses_window_group_limit(spark, docs):
    """The rn<=k filter must compile to a partial (pre-shuffle) top-k:
    WindowGroupLimit both before and after the Exchange, so the shuffle
    ships O(k) rows per (task, group) at any corpus size."""
    from pyhctsa_spark.operators.curation import corpus_sample

    plan = corpus_sample(docs, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Partial" in plan.split("Exchange")[-1], plan


def test_corpus_diff_statuses(spark):
    """added/removed/changed/unchanged classification and the length
    columns, including a doc present with identical text (unchanged)
    and absent-side NULL lengths."""
    from pyhctsa_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "bb"), (3, "cc changed"), (4, "dd")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in corpus_diff(old, new).collect()}
    assert {d: r.status for d, r in rows.items()} == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added"
    }
    assert rows[1].n_chars_new is None and rows[1].n_chars_old == 2
    assert rows[4].n_chars_old is None and rows[4].n_chars_new == 2
    assert rows[3].n_chars_old == 2 and rows[3].n_chars_new == 10


def test_corpus_diff_null_text(spark):
    """NULL text must not read as an absent row: presence comes from
    the join side, and NULL<->value / NULL<->NULL text transitions
    classify as changed / unchanged."""
    from pyhctsa_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "cc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "aa"), (2, None), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}
