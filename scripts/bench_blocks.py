"""Run individual bench.py blocks in isolation (guide §1.4).

Imports the FROZEN bench.py and calls its block functions with the
identical session conf, so numbers are comparable to the driver's
full run without paying the whole 15-minute sweep.

Usage: python scripts/bench_blocks.py ann1m pq1m scale10 stream ann
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (frozen driver bench)
from pyhctsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    blocks = sys.argv[1:]
    spark = get_spark(
        "bench_blocks",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    n_docs = max(40, int(bench.sf_of(bench.SF_DIR) * bench.DOCS_PER_SF))
    seq_path = bench.ensure_sequences(spark, n_docs)
    spark.read.parquet(seq_path).limit(10).count()
    out: dict = {}
    for b in blocks:
        if b == "queries":
            out["queries"] = bench.bench_queries(spark)
        elif b == "rollup":
            out.update(bench.bench_rollup(spark, seq_path))
        elif b == "qrollup":
            out.update(bench.bench_quantile_rollup(spark, seq_path))
        elif b == "fused":
            out.update(bench.bench_fused_rollup(spark, seq_path))
        elif b == "featmat":
            out.update(bench.bench_feature_matrix(spark, seq_path))
        elif b == "simblock":
            out.update(bench.bench_simhash_blocking(spark))
        elif b == "ann":
            out.update(bench.bench_ann(spark))
        elif b == "ann1m":
            out.update(bench.bench_ann_1m(spark))
        elif b == "pq1m":
            out.update(bench.bench_pq_1m(spark))
        elif b == "stream":
            out.update(bench.bench_streaming_rollup(spark, seq_path))
        elif b == "scale10":
            out.update(bench.bench_scale10(spark))
        else:
            print(f"unknown block: {b}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
