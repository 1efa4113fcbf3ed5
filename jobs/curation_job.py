"""spark-submit entrypoint for the end-to-end corpus-curation funnel:

    documents
      -> quality filter        (operators/text.quality_filter)
      -> near-dup collapse     (operators/dedup.near_dup_clusters,
                                keep the min-id doc per cluster)
      -> LM perplexity gate    (operators/lm.lm_quality_filter,
                                optional: --max-ppl; self-trained on
                                the deduplicated survivors, CCNet-style)
      -> passage-level dedup   (operators/curation.passage_dedup_stats)
      -> substring span dedup  (operators/curation.exact_substring_dedup,
                                optional: --substring-span; Lee et al.
                                2022 span removal — rewrites text,
                                drops docs left empty)
      -> PII redaction         (operators/curation.pii_redact)
      -> weighted source mix   (operators/curation.source_mix)
      -> sequence packing      (operators/curation.pack_sequences)
      -> deterministic shuffle (operators/curation.global_shuffle
                                addresses on the packed sequences)

Usage (cluster):

    scripts/package.py                       # builds dist/pyhctsa_spark.zip
    spark-submit --py-files dist/pyhctsa_spark.zip \\
        jobs/curation_job.py \\
        --input  s3://bucket/documents/ \\
        --output s3://bucket/curated/ \\
        --seq-len 2048 --pack-shards 1024 --mix-rate 1.0

The whole funnel is deterministic (every sampling/shuffle decision is an
md5 of the row key), so re-running the job on the same input produces
byte-identical output — the property that makes a 100 TB curation run
resumable by simple re-execution of failed partitions.

Writes two tables under --output: ``segments/`` (the packed
doc-span-to-sequence map, partitioned by shard) and ``addresses/`` (the
shuffled (seq_key, shard, pos) read order). Prints one JSON line of
per-stage lineage counters on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def curate(
    spark,
    docs,
    *,
    threshold: float = 0.3,
    max_ppl: float | None = None,
    max_dup_frac: float = 0.5,
    substring_span: int | None = None,
    eval_docs=None,
    mix_rate: float = 1.0,
    seq_len: int = 2048,
    pack_shards: int = 4,
    shuffle_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run the curation funnel; returns (segments, addresses, stats).

    Each stage consumes only the survivors of the previous one, and each
    stage's survivor count is recorded — the funnel report a curation
    run is audited by. Intermediate survivor sets are persisted once:
    every stage's output feeds both the next stage and a count.
    """
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.curation import (
        global_shuffle,
        pack_sequences,
        passage_dedup_stats,
        pii_redact,
        source_mix,
    )
    from pyhctsa_spark.operators.dedup import near_dup_clusters
    from pyhctsa_spark.operators.text import quality_filter

    stats: dict = {"docs_in": docs.count()}

    # full_rows: the quality decision is per-document, so filter in
    # place — the former join(kept_q) shuffled the full text payload by
    # doc_id just to attach a keep bit (optimization r6, guide §8)
    docs_q = (
        quality_filter(docs, text_col, id_col, full_rows=True)
        .where("keep = 1")
        .drop("keep", "reason")
        .persist()
    )
    stats["after_quality"] = docs_q.count()

    if eval_docs is not None:
        # benchmark decontamination via the Bloom bitmap screen: the
        # eval set ships as a fixed 128 KB broadcast regardless of its
        # size; one-sided error only quarantines extra training docs
        from pyhctsa_spark.operators.bloom import contamination_check_bloom

        clean = (
            contamination_check_bloom(
                docs_q, eval_docs, text_col=text_col, id_col=id_col
            )
            .where("contaminated = 0")
            .select(id_col)
        )
        docs_q = docs_q.join(clean, id_col).persist()
        stats["after_decontam"] = docs_q.count()

    # near-dup collapse BEFORE passage-level filtering: clustering keeps
    # one representative per duplicate group, while the passage filter
    # drops EVERY doc whose blocks are duplicated — run it first and a
    # document with 1000 crawl copies would vanish entirely instead of
    # surviving once. After the collapse, passage duplication measures
    # genuine cross-document boilerplate among distinct contents.
    clusters = near_dup_clusters(
        docs_q, text_col=text_col, id_col=id_col, threshold=threshold
    )
    reps = clusters.groupBy("cluster_id").agg(F.min(id_col).alias(id_col))
    # localCheckpoint, not persist: the clustering lineage is deep
    # (iterative CC + LSH), and every later stage references docs_d
    # several times (the LM gate alone reads it for training, scoring,
    # and the join-back). persist() caches blocks but keeps the full
    # logical plan, and the multiplied plan tree can OOM the DRIVER
    # just stringifying it; checkpointing truncates the lineage. The
    # checkpoint blocks live as long as the returned segments/addresses
    # plans reference them (they must — cache eviction recomputes from
    # here) and are released by the ContextCleaner when the caller
    # drops the results.
    # materialize the representative-id set (ids only) so the planner
    # sees its REAL size instead of a garbage estimate through the
    # iterative-CC lineage: when it fits the broadcast threshold the
    # join becomes a broadcast join and the text payload is never
    # shuffled (guide §3.1); when the survivor set is genuinely huge it
    # degrades to a plain shuffle join instead of a broadcast OOM
    reps_ids = reps.select(id_col).localCheckpoint()
    docs_d = docs_q.join(reps_ids, id_col).localCheckpoint()
    stats["after_near_dup"] = docs_d.count()
    persisted = [docs_q]

    if max_ppl is not None:
        # CCNet-style LM gate AFTER the dedup collapse: the LM is
        # self-trained on the distinct survivors (a duplicated crawl
        # page would otherwise dominate the counts and score itself
        # fluent), then every survivor above the perplexity ceiling is
        # dropped. Unscoreable docs (NULL ppl) are kept — the gate
        # must not drop what it could not measure. The trained model
        # is unpersisted once the survivor set is materialized, so
        # repeated curate() calls don't accumulate cached LMs.
        from pyhctsa_spark.operators.lm import lm_perplexity, train_bigram_lm

        bi, ctx, v = train_bigram_lm(docs_d, text_col, id_col)
        kept_l = (
            lm_perplexity(docs_d, bi, ctx, v,
                          text_col=text_col, doc_col=id_col)
            .where(F.coalesce(F.col("ppl") <= F.lit(float(max_ppl)),
                              F.lit(True)))
            .select(F.col("doc_id").alias(id_col))
        )
        docs_d = docs_d.join(kept_l, id_col).persist()
        persisted.append(docs_d)
        stats["after_lm_ppl"] = docs_d.count()
        bi.unpersist()

    kept_p = (
        passage_dedup_stats(
            docs_d, text_col=text_col, doc_col=id_col, max_dup_frac=max_dup_frac
        )
        .where("keep")
        .select(F.col("doc_id").alias(id_col))
    )
    docs_p = docs_d.join(kept_p, id_col).persist()
    persisted.append(docs_p)
    stats["after_passage_dedup"] = docs_p.count()

    if substring_span is not None:
        # span-level dedup AFTER the doc-level collapse and passage
        # filter: what remains duplicated now is sub-document
        # boilerplate shared across distinct survivors. This stage
        # REWRITES text (removes every covered word from all but the
        # globally-first occurrence); documents left with no words are
        # dropped, unmeasurable (NULL-text) rows pass through unchanged
        # — the score-every-row contract.
        from pyhctsa_spark.operators.curation import exact_substring_dedup

        cut = exact_substring_dedup(
            docs_p, span_words=substring_span,
            text_col=text_col, doc_col=id_col,
        ).persist()
        persisted.append(cut)
        stats["substring_tokens_removed"] = int(
            cut.select(F.sum("tokens_removed")).first()[0] or 0
        )
        docs_p = (
            docs_p.drop(text_col)
            .join(
                cut.where(
                    F.col("clean_text").isNull()
                    | (F.length("clean_text") > 0)
                ).select(
                    F.col("doc_id").alias(id_col),
                    F.col("clean_text").alias(text_col),
                ),
                id_col,
            )
            .persist()
        )
        persisted.append(docs_p)
        stats["after_substring"] = docs_p.count()

    docs_r = pii_redact(docs_p, text_col)
    stats_cols = docs_r.select(
        F.sum("n_emails").alias("e"),
        F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
    ).first()
    stats["pii_removed"] = int(
        (stats_cols["e"] or 0) + (stats_cols["i"] or 0) + (stats_cols["p"] or 0)
    )
    docs_r = docs_r.drop(text_col).withColumnRenamed("redacted", text_col)

    docs_m = source_mix(docs_r, F.lit(float(mix_rate)), doc_col=id_col).persist()
    persisted.append(docs_m)
    stats["after_mix"] = docs_m.count()

    segments = pack_sequences(
        docs_m,
        seq_len=seq_len,
        n_shards=pack_shards,
        text_col=text_col,
        doc_col=id_col,
    ).persist()
    stats["segments"] = segments.count()
    stats["tokens_packed"] = int(
        segments.select(F.sum("tok_len")).first()[0] or 0
    )
    # one read-order address per packed sequence: key the shuffle on the
    # sequence identity, not the documents inside it
    seqs = segments.select(
        F.concat_ws("|", "source", "shard", "seq_id").alias("seq_key")
    ).distinct()
    addresses = global_shuffle(seqs, n_shards=shuffle_shards, doc_col="seq_key")
    stats["sequences"] = seqs.count()
    for d in persisted:
        d.unpersist()
    return segments, addresses, stats


def parse_args(argv):
    p = argparse.ArgumentParser(description="pyhctsa_spark curation funnel")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--max-ppl", type=float, default=None,
                   help="LM perplexity ceiling (omit to skip the gate)")
    p.add_argument("--max-dup-frac", type=float, default=0.5)
    p.add_argument("--substring-span", type=int, default=None,
                   help="span-dedup window in words (omit to skip the "
                        "Lee-et-al substring removal stage)")
    p.add_argument("--eval-input", default=None,
                   help="parquet of benchmark/eval docs — enables the "
                        "Bloom decontamination stage (omit to skip)")
    p.add_argument("--mix-rate", type=float, default=1.0)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--pack-shards", type=int, default=4,
                   help="packing streams per source — size so one "
                        "stream's rows fit a single task comfortably")
    p.add_argument("--shuffle-shards", type=int, default=8)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pyhctsa-curation").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    segments, addresses, stats = curate(
        spark,
        docs,
        threshold=args.threshold,
        max_ppl=args.max_ppl,
        max_dup_frac=args.max_dup_frac,
        substring_span=args.substring_span,
        eval_docs=(spark.read.parquet(args.eval_input)
                   if args.eval_input else None),
        mix_rate=args.mix_rate,
        seq_len=args.seq_len,
        pack_shards=args.pack_shards,
        shuffle_shards=args.shuffle_shards,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    (
        segments.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{args.output}/segments")
    )
    (
        addresses.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{args.output}/addresses")
    )
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
