"""spark-submit entrypoint for the persistent IVF vector-index
lifecycle (operators/similarity): the daily ANN operation as one
submit each.

Usage (cluster):

    scripts/package.py                       # builds dist/pyhctsa_spark.zip
    spark-submit --py-files dist/pyhctsa_spark.zip \\
        jobs/ann_job.py \\
        --input  s3://bucket/embeddings/     \\
        --index  s3://bucket/ivf_index/      \\
        --mode index-build --num-centroids 0   # 0 -> sqrt-N

Modes:
  index-build   ivf_write_index over --input at --index: the one
                corpus-sized pass (k-means quantizer trained on a
                bounded sample, salted cid-partitioned inverted lists).
                Prints the list-skew stats — gate on skew_ratio before
                trusting partial probes.
  index-append  append_to_ivf_index of --input (the daily embedding
                batch) into --index: delta-proportional (map-side
                assignment, LSM heap write). Prints the quantizer-drift
                counters — a delta assign_cos_mean well below the build
                baseline means rebuild, not append.
  probe         knn_ivf_index: --input is the QUERY table; writes the
                (qid, nid, cosine, rank) top-k to --output. --nprobe 0
                probes every list (exact brute-force answers).
  compact       compact_ivf_index: folds the append heap into the
                partition layout and repairs replayed appends. Erasure
                (drop ids) goes through jobs/erasure_job.py
                --ivf-index, which adds the compliance exit code.

No ``--master`` is set here — spark-submit / the cluster manager
decides. The job prints one JSON line of lineage counters on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description="pyhctsa_spark IVF ANN job")
    p.add_argument("--input", required=True,
                   help="parquet of vectors (index-build/index-append) "
                        "or queries (probe); ignored for compact")
    p.add_argument("--index", required=True, help="IVF index path")
    p.add_argument("--mode",
                   choices=["index-build", "index-append", "probe",
                            "compact"],
                   default="probe")
    p.add_argument("--output", default=None,
                   help="top-k parquet output (probe mode)")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--num-centroids", type=int, default=0,
                   help="index-build list count; 0 -> sqrt-N")
    p.add_argument("--k", type=int, default=10, help="probe: neighbors")
    p.add_argument("--nprobe", type=int, default=4,
                   help="probe: lists per query; 0 -> all (exact)")
    args = p.parse_args(argv)
    if args.mode == "probe" and not args.output:
        p.error("probe mode requires --output")
    return args


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from pyhctsa_spark.operators.similarity import (
        append_to_ivf_index,
        compact_ivf_index,
        ivf_write_index,
        knn_ivf_index,
        read_ivf_meta,
    )

    spark = SparkSession.builder.appName("pyhctsa-ann").getOrCreate()
    t0 = time.perf_counter()
    if args.mode == "index-build":
        df = spark.read.parquet(args.input)
        stats = ivf_write_index(
            df, args.index,
            num_centroids=args.num_centroids or None,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        print(json.dumps({
            "mode": args.mode, "index": args.index, **stats,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0
    if args.mode == "index-append":
        df = spark.read.parquet(args.input)
        counters = append_to_ivf_index(
            df, args.index, vec_col=args.vec_col, id_col=args.id_col
        )
        print(json.dumps({
            "mode": args.mode, "index": args.index, **counters,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0
    if args.mode == "compact":
        stats = compact_ivf_index(spark, args.index)
        print(json.dumps({
            "mode": args.mode, "index": args.index,
            "lists": stats["lists"],
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0
    # probe
    queries = spark.read.parquet(args.input)
    nprobe = args.nprobe or read_ivf_meta(args.index)["nlist"]
    topk = knn_ivf_index(
        spark, args.index, queries, k=args.k, nprobe=nprobe,
        vec_col=args.vec_col, id_col=args.id_col,
    )
    topk.write.mode("overwrite").parquet(args.output)
    n_rows = spark.read.parquet(args.output).count()
    print(json.dumps({
        "mode": args.mode, "queries": queries.count(), "k": args.k,
        "nprobe": nprobe, "rows_out": n_rows,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
