"""spark-submit entrypoint for the near-duplicate clustering job.

Usage (cluster):

    scripts/package.py                       # builds dist/pyhctsa_spark.zip
    spark-submit --py-files dist/pyhctsa_spark.zip \\
        jobs/dedup_job.py \\
        --input  s3://bucket/documents/      \\
        --output s3://bucket/dedup_clusters/ \\
        --threshold 0.3 --mode clusters

Modes:
  clusters  (default) near_dup_clusters — one (doc_id, cluster_id) row
            per document: exact-collapse -> MinHash-LSH over
            representatives -> connected components. Linear output.
  pairs     minhash_verified_pairs — the verified near-dup pair table
            (quadratic in duplicate multiplicity; use for audits).
  exact     exact_dedup — content-hash groups with canonical ids.
  index-build  build_minhash_index over --input at --index: the one-time
            corpus pass for the incremental pipeline.
  index-probe  screen --input (the new batch) against --index built over
            --base: writes the (d1 indexed, d2 new, jaccard) pair table
            to --output; with --append-survivors the unmatched batch
            docs are also appended to the index — the complete daily
            incremental-dedup operation in one submit.

No ``--master`` is set here — spark-submit / the cluster manager
decides. The job prints one JSON line of lineage counters on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description="pyhctsa_spark near-dup dedup job")
    p.add_argument("--input", required=True,
                   help="parquet directory of documents (doc_id, text, ...)")
    p.add_argument("--output", required=True, help="output parquet directory")
    p.add_argument("--mode",
                   choices=["clusters", "pairs", "exact",
                            "index-build", "index-probe"],
                   default="clusters")
    p.add_argument("--threshold", type=float, default=0.3,
                   help="verified-Jaccard near-dup threshold")
    p.add_argument("--shingle-k", type=int, default=3)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--index", default=None,
                   help="MinHash index path (index-build / index-probe)")
    p.add_argument("--base", default=None,
                   help="parquet of the indexed corpus (index-probe: "
                        "candidate texts for the exact verify)")
    p.add_argument("--append-survivors", action="store_true",
                   help="index-probe: append unmatched batch docs to "
                        "the index after screening")
    args = p.parse_args(argv)
    if args.mode in ("index-build", "index-probe") and not args.index:
        p.error(f"--index is required for mode {args.mode}")
    if args.mode == "index-probe" and not args.base:
        p.error("--base is required for mode index-probe")
    return args


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from pyhctsa_spark.operators.dedup import (
        exact_dedup,
        minhash_verified_pairs,
        near_dup_clusters,
    )

    from pyhctsa_spark.operators.dedup_index import (
        append_to_minhash_index,
        build_minhash_index,
        query_minhash_index,
    )

    spark = SparkSession.builder.appName("pyhctsa-dedup").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    if args.mode == "index-build":
        meta = build_minhash_index(
            docs, args.index, text_col=args.text_col, id_col=args.id_col,
            shingle_k=args.shingle_k, threshold=args.threshold,
        )
        print(json.dumps({
            "mode": args.mode, "docs_in": docs.count(), "index": args.index,
            **meta, "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0
    if args.mode == "index-probe":
        from pyspark.sql import functions as F

        base = spark.read.parquet(args.base)
        pairs = query_minhash_index(
            docs, args.index, base,
            text_col=args.text_col, id_col=args.id_col,
            threshold=args.threshold,
        ).persist()
        pairs.write.mode("overwrite").parquet(args.output)
        n_pairs = pairs.count()
        appended = 0
        if args.append_survivors:
            matched = pairs.select(
                F.col("d2").alias(args.id_col)
            ).distinct()
            survivors = docs.join(matched, args.id_col, "left_anti")
            appended = survivors.count()
            if appended:
                append_to_minhash_index(
                    survivors, args.index,
                    text_col=args.text_col, id_col=args.id_col,
                )
        pairs.unpersist()
        print(json.dumps({
            "mode": args.mode, "docs_in": docs.count(), "pairs": n_pairs,
            "appended": appended,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0
    if args.mode == "clusters":
        out = near_dup_clusters(
            docs, args.text_col, args.id_col,
            threshold=args.threshold, shingle_k=args.shingle_k,
        )
    elif args.mode == "pairs":
        out = minhash_verified_pairs(
            docs, args.text_col, args.id_col,
            shingle_k=args.shingle_k, threshold=args.threshold,
        )
    else:
        out = exact_dedup(docs, args.text_col, args.id_col)
    out.write.mode("overwrite").parquet(args.output)
    wall = time.perf_counter() - t0
    n_in = docs.count()
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({
        "mode": args.mode, "docs_in": n_in, "rows_out": n_out,
        "wall_sec": round(wall, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
