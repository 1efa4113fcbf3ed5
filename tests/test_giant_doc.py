"""Pathological single-row stress: one 10M-token document through the
flagship rollup at local[4] (SURVEY §7.3 long-arrays risk).

Runs in a SUBPROCESS with its own local[4] session — the shared test
session is local[32], and the point is proving the memory story with
FEW workers: one Python worker must stream a ~40 MB packed token row
(→ 80 MB float64 + ~25.6k output windows across 3 tiers) without its
peak RSS blowing past a small fixed bound. Peak RSS is harvested from
the REUSED Python workers themselves (ru_maxrss probe mapped over every
worker after the rollup), not the driver.
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import json, resource, sys
    import numpy as np
    import pyarrow as pa

    from pyhctsa_spark.session import get_spark
    from pyhctsa_spark.operators.rollup import make_counters, rollup_tiers
    from pyhctsa_spark.sources.synthetic import SEQ_BIN_SCHEMA, token_checksum

    N_TOK = 10_000_000

    spark = get_spark("giantdoc", master="local[4]")

    def gen(batches):
        for rb in batches:
            for _ in range(rb.num_rows):
                toks = (np.arange(N_TOK, dtype=np.int64) % 50_000).astype(
                    np.int32
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(["doc_giant"]),
                        pa.array([toks.tobytes()], type=pa.binary()),
                        pa.array([N_TOK], type=pa.int32()),
                        pa.array(["src00"]),
                        pa.array([token_checksum(toks)], type=pa.int64()),
                    ],
                    names=["doc_id", "tokens_bin", "n_tok", "source",
                           "tok_checksum"],
                )

    df = spark.range(1).mapInArrow(gen, SEQ_BIN_SCHEMA)
    counters = make_counters(spark)
    out = rollup_tiers(df, counters=counters)
    tiers = {
        int(r["tier"]): int(r["cnt"])
        for r in out.groupBy("tier").agg({"*": "count"})
        .withColumnRenamed("count(1)", "cnt").collect()
    }

    # harvest peak RSS from every (reused) Python worker: the worker
    # that chewed the 10M-token row reports its own lifetime maximum
    def probe(batches):
        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        yield pa.RecordBatch.from_arrays(
            [pa.array([int(rss_kb)], type=pa.int64())], names=["rss_kb"]
        )
        for rb in batches:
            pass

    rss = (
        spark.range(0, 64, 1, 64).mapInArrow(probe, "rss_kb long")
        .agg({"rss_kb": "max"}).first()[0]
    )
    print(json.dumps({
        "tiers": tiers,
        "windows": int(counters["windows_emitted"].value),
        "mismatches": int(counters["checksum_mismatches"].value),
        "max_worker_rss_mb": round(rss / 1024.0, 1),
    }))
    spark.stop()
    """
)


def test_giant_doc_rollup_memory_bounded():
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    # default window=32, cascade group=16, 3 tiers: exact whole-window
    # counts (10M // 32, // 512, // 8192)
    assert report["tiers"] == {"0": 312500, "1": 19531, "2": 1220}, report
    assert report["windows"] == 312500 + 19531 + 1220
    assert report["mismatches"] == 0
    # the 10M-token row is ~40 MB packed / 80 MB as float64 and expands
    # to 333k output windows; the worker must stream it with bounded
    # expansion (make_buffer is a view, output flushes at 2^16 rows) —
    # measured ~500 MB peak. 1.5 GB is headroom over interpreter +
    # Arrow + numpy noise while still catching an O(windows x window)
    # copy blowup regression.
    assert report["max_worker_rss_mb"] < 1536, report


_FUSED_SCRIPT = textwrap.dedent(
    """
    import json, resource
    import numpy as np
    import pyarrow as pa

    from pyhctsa_spark.session import get_spark
    from pyhctsa_spark.operators.fused_rollup import rollup_fused_tiers
    from pyhctsa_spark.sources.synthetic import SEQ_BIN_SCHEMA, token_checksum

    N_TOK = 10_000_000

    spark = get_spark("giantdoc_fused", master="local[4]")

    def gen(batches):
        for rb in batches:
            for _ in range(rb.num_rows):
                toks = (np.arange(N_TOK, dtype=np.int64) % 50_000).astype(
                    np.int32
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(["doc_giant"]),
                        pa.array([toks.tobytes()], type=pa.binary()),
                        pa.array([N_TOK], type=pa.int32()),
                        pa.array(["src00"]),
                        pa.array([token_checksum(toks)], type=pa.int64()),
                    ],
                    names=["doc_id", "tokens_bin", "n_tok", "source",
                           "tok_checksum"],
                )

    df = spark.range(1).mapInArrow(gen, SEQ_BIN_SCHEMA)
    out = rollup_fused_tiers(df)
    tiers = {
        int(r["tier"]): int(r["cnt"])
        for r in out.groupBy("tier").agg({"*": "count"})
        .withColumnRenamed("count(1)", "cnt").collect()
    }
    nd = out.where("tier = 2").agg({"n_distinct": "max"}).first()[0]

    def probe(batches):
        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        yield pa.RecordBatch.from_arrays(
            [pa.array([int(rss_kb)], type=pa.int64())], names=["rss_kb"]
        )
        for rb in batches:
            pass

    rss = (
        spark.range(0, 64, 1, 64).mapInArrow(probe, "rss_kb long")
        .agg({"rss_kb": "max"}).first()[0]
    )
    print(json.dumps({
        "tiers": tiers,
        "max_nd_t2": int(nd),
        "max_worker_rss_mb": round(rss / 1024.0, 1),
    }))
    spark.stop()
    """
)


def test_giant_doc_fused_rollup_memory_bounded():
    """Same pathological row through the FUSED three-family pass
    (ALG moments + exact sparse histograms + HLL registers): the
    histogram/HLL states are O(n_tok), not O(windows x window), so the
    10M-token row must still stream under a fixed worker-RSS bound."""
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-c", _FUSED_SCRIPT], capture_output=True,
        text=True, env=env, cwd=REPO, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["tiers"] == {"0": 312500, "1": 19531, "2": 1220}, report
    # tier-2 windows cover 8192 consecutive tokens of (arange % 50000):
    # every value distinct -> exact histogram must report 8192
    assert report["max_nd_t2"] == 8192, report
    # each tier's hist state is ~10M (token,count) pairs for this
    # all-distinct-per-window worst case (arange: 32/512/8192 distinct
    # per tier-0/1/2 window), plus HLL registers and the float64 view;
    # measured 2.37 GB peak = ~30x the 80 MB unpacked row, the
    # documented worst-case constant for the fused pass. 3 GB catches
    # an O(windows x vocab) densify blowup (which would be >100 GB).
    assert report["max_worker_rss_mb"] < 3072, report
