"""Per-query isolation harness for optimization work (guide §1.4).

NOT the driver bench — bench.py is frozen. This mirrors bench.py's
methodology (same session conf, same noop sink, min-of-N interleaved
reps, clearCache between engine-query reps) but runs only the queries
named on the command line, so a single optimization can be measured in
seconds instead of a full 15-minute sweep.

Usage:
    python bench_extra.py emb_positive_pairs doc_mmr_rerank
    REPS=2 python bench_extra.py user_delete_docs
    EXPLAIN=plans/r06 python bench_extra.py doc_mmr_rerank   # also dump
        .explain("formatted") to plans/r06/<name>_<EXPLAIN_TAG>.txt
Scale-10 extras (rollup10, minhash10, ...) are in bench.py's
bench_scale10; pass scale10:<metric> to run just that block's metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyhctsa_spark.plans import oracle_queries as OQ  # noqa: E402
from pyhctsa_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(
        "bench_extra",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    OQ.register_views(spark, SF_DIR)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    explain_dir = os.environ.get("EXPLAIN")
    explain_tag = os.environ.get("EXPLAIN_TAG", "plan")
    best: dict = {}
    for rep in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            if name in qs:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                if explain_dir and rep == 0:
                    os.makedirs(explain_dir, exist_ok=True)
                    with open(
                        os.path.join(explain_dir, f"{name}_{explain_tag}.txt"),
                        "w",
                    ) as f:
                        jvm = df.sparkSession._jvm
                        f.write(jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
            elif name in OQ.QUERIES:
                t0 = time.perf_counter()
                spark.sql(OQ.spark_sql_for(name)).write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.perf_counter() - t0
            else:
                print(f"unknown query: {name}", file=sys.stderr)
                continue
            best[name] = min(best.get(name, float("inf")), w)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({k: round(v, 3) for k, v in best.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
