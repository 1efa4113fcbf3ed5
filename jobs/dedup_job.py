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
    p.add_argument("--mode", choices=["clusters", "pairs", "exact"],
                   default="clusters")
    p.add_argument("--threshold", type=float, default=0.3,
                   help="verified-Jaccard near-dup threshold")
    p.add_argument("--shingle-k", type=int, default=3)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from pyhctsa_spark.operators.dedup import (
        exact_dedup,
        minhash_verified_pairs,
        near_dup_clusters,
    )

    spark = SparkSession.builder.appName("pyhctsa-dedup").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.perf_counter()
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
