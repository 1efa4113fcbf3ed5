"""Approximate-distinct tier rollup: HyperLogLog register state per
window, carried through the retention cascade.

Same physical strategies as the flagship ALG rollup (operators/rollup.py)
and the exact-quantile rollup (operators/quantile_rollup.py); the new
logical column is an approximate distinct-token count whose per-window
state is FIXED-SIZE (2^p bytes) regardless of window length or
vocabulary — the state to carry when the token domain is open (hashed
n-grams, ids, urls) and the exact histogram's min(n, |vocab|) blobs
would grow without bound at coarse tiers.

1. ``rollup_hll_tiers``: ONE shuffle-free ``mapInArrow`` pass. Tier 0
   registers come from the tokens in hand; tier k+1 is the elementwise
   MAX of tier-k registers — exact, associative, idempotent — so the
   plan stays Scan -> Project -> MapInArrow -> Sink with zero Exchange.

2. ``hll_cascade_from_store``: the retention path — raw tokens are
   gone, only the materialized tier table with its ``hll_bin`` column
   remains. Register max makes the cascaded tier BIT-IDENTICAL to the
   direct computation (asserted in tests), the defining property of the
   sketch: a 100 TB store can be re-tiered forever without raw revisit.

3. ``hll_distinct_by_source``: a cross-document union — registers are
   unioned per source key. Map-side each task emits at most
   |sources| x 2^p sparse (source, register j, value) rows (non-zero
   registers only), the ONE shuffle is those partial rows, and the
   reduce is groupBy(source, j).max — Catalyst's partial aggregation
   makes this the textbook combiner-friendly distributed sketch union:
   shuffle bytes are O(sources x 256) per task, independent of corpus
   size.

Window semantics match the flagship: non-overlapping windows, trailing
partial dropped (make_buffer, reference Utilities/utils.py:292-319),
tier t window length = window * group**t.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

from pyhctsa_spark.functions import hll_state as HLL
from pyhctsa_spark.operators.rollup import _var_width_view

HLL_SCHEMA = (
    "doc_id string, source string, tier int, window_idx long, n long, "
    "hll_zeros int, hll_denom long, est_distinct double, hll_bin binary"
)

_PA_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("source", pa.string()), ("tier", pa.int32()),
    ("window_idx", pa.int64()), ("n", pa.int64()),
    ("hll_zeros", pa.int32()), ("hll_denom", pa.int64()),
    ("est_distinct", pa.float64()), ("hll_bin", pa.binary()),
])


def _blocks_to_batch(blocks: list[dict]) -> pa.RecordBatch:
    cols: list[pa.Array] = []
    for name in (f.name for f in _PA_SCHEMA):
        if name in ("doc_id", "source"):
            vals: list = []
            for b in blocks:
                vals.extend(b[name])
            cols.append(pa.array(vals, type=pa.string()))
        elif name == "hll_bin":
            cols.append(HLL.pack_arrow(
                np.concatenate([b["_regs"] for b in blocks])
            ))
        else:
            cols.append(pa.array(np.concatenate([b[name] for b in blocks])))
    return pa.RecordBatch.from_arrays(cols, schema=_PA_SCHEMA)


def _tier_block(doc_id: str, source: str, tier: int, wlen: int,
                regs: np.ndarray) -> dict:
    fin = HLL.finalize(regs)
    k = regs.shape[0]
    return {
        "doc_id": [doc_id] * k,
        "source": [source] * k,
        "tier": np.full(k, tier, dtype=np.int32),
        "window_idx": np.arange(k, dtype=np.int64),
        "n": np.full(k, wlen, dtype=np.int64),
        "hll_zeros": fin["hll_zeros"].astype(np.int32),
        "hll_denom": fin["hll_denom"],
        "est_distinct": fin["est"],
        "_regs": regs,
    }


def _make_fn(window: int, group: int, n_tiers: int):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            names = rb.schema.names
            doc_ids = rb.column(names.index("doc_id")).to_pylist()
            sources = rb.column(names.index("source")).to_pylist()
            tok_name = "tokens_bin" if "tokens_bin" in names else "tokens"
            flat, offs, is_bin = _var_width_view(rb.column(names.index(tok_name)))
            FLUSH_ROWS = 1 << 16
            blocks: list[dict] = []
            n_acc = 0
            for r in range(rb.num_rows):
                raw = flat[offs[r]: offs[r + 1]]
                toks = (raw.view("<i4") if is_bin else raw).astype(np.int64)
                if len(toks) < window:
                    continue
                k0 = len(toks) // window
                regs = HLL.registers_from_windows(
                    toks[: k0 * window].reshape(k0, window)
                )
                blocks.append(_tier_block(doc_ids[r], sources[r], 0,
                                          window, regs))
                n_acc += k0
                wlen = window
                for tier in range(1, n_tiers):
                    regs = HLL.merge_groups(regs, group)
                    wlen *= group
                    if regs.shape[0] == 0:
                        break
                    blocks.append(_tier_block(doc_ids[r], sources[r],
                                              tier, wlen, regs))
                    n_acc += regs.shape[0]
                if n_acc >= FLUSH_ROWS:
                    yield _blocks_to_batch(blocks)
                    blocks = []
                    n_acc = 0
            if blocks:
                yield _blocks_to_batch(blocks)

    return fn


def rollup_hll_tiers(
    df: DataFrame,
    window: int = 32,
    group: int = 16,
    n_tiers: int = 3,
) -> DataFrame:
    """Single-pass approximate-distinct tier rollup (module docstring)."""
    needed = [c for c in ("doc_id", "source", "tokens_bin", "tokens")
              if c in df.columns]
    return df.select(*needed).mapInArrow(
        _make_fn(window, group, n_tiers), schema=HLL_SCHEMA
    )


def hll_cascade_from_store(tier_df: DataFrame, group: int = 16) -> DataFrame:
    """Tier k+1 from a materialized tier-k HLL table alone — register
    max, BIT-IDENTICAL to the direct computation, no raw revisit.

    Physical shape: repartition(doc_id, tier) -> in-partition sort ->
    ONE Arrow pass over sorted key-runs (operators/seq_runs) — per-key
    ``applyInPandas`` pays ~4 ms of batch assembly per group, which
    measured 6x the total kernel cost at 1,300 groups; the run walker
    amortizes it to one stream. Within a doc all parent windows merge
    in one vectorized ``maximum.reduceat``. A parent is complete iff
    all ``group`` child windows are present (window_idx is unique per
    doc/tier, so presence == count); incomplete or gapped parents emit
    nothing, matching the direct path's trailing-partial drop."""
    from pyhctsa_spark.operators.seq_runs import map_sorted_runs

    def run(tbl: pa.Table) -> pa.Table | None:
        widx = tbl.column("window_idx").to_numpy(zero_copy_only=False)
        parent = widx // group
        cut = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        seg_len = np.diff(np.r_[cut, len(parent)])
        full = seg_len == group
        if not full.any():
            return None
        regs = HLL.unpack_blobs(tbl.column("hll_bin").to_pylist())
        merged = np.maximum.reduceat(regs, cut, axis=0)[full]
        n = np.add.reduceat(
            tbl.column("n").to_numpy(zero_copy_only=False), cut
        )[full]
        fin = HLL.finalize(merged)
        k = merged.shape[0]
        doc = tbl.column("doc_id")[0].as_py()
        src = tbl.column("source")[0].as_py()
        tier = int(tbl.column("tier")[0].as_py()) + 1
        return pa.Table.from_arrays(
            [
                pa.array([doc] * k, type=pa.string()),
                pa.array([src] * k, type=pa.string()),
                pa.array(np.full(k, tier, dtype=np.int32)),
                pa.array(parent[cut][full].astype(np.int64)),
                pa.array(n.astype(np.int64)),
                pa.array(fin["hll_zeros"].astype(np.int32)),
                pa.array(fin["hll_denom"]),
                pa.array(fin["est"]),
                HLL.pack_arrow(merged),
            ],
            schema=_PA_SCHEMA,
        )

    return map_sorted_runs(
        tier_df.select([f.name for f in _PA_SCHEMA]),
        by=["doc_id", "tier"], order=["window_idx"],
        run_fn=run, out_schema=HLL_SCHEMA,
    )


def _hash_struct_udf():
    """Arrow-batched (token -> struct(j, r)): register index and rank
    from one splitmix64 pass. The hash cannot be a JVM expression under
    ANSI mode (64-bit wraparound multiply raises), so this is the one
    vectorized Python hop; everything downstream is JVM aggregation."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def jr(tok):
        t = tok.to_numpy(dtype=np.int64, na_value=0)
        h = HLL.splitmix64(t)
        j = (h >> np.uint64(HLL.Q)).astype(np.int32)
        wlow = h & np.uint64((1 << HLL.Q) - 1)
        rho = (HLL.Q + 1 - HLL.bit_length_u64(wlow)).astype(np.int32)
        return pd.DataFrame({"j": j, "r": rho})

    # real annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf cannot resolve
    jr.__annotations__ = {"tok": pd.Series, "return": pd.DataFrame}
    return pandas_udf(jr, "j int, r int")


def hll_partial(
    events: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    window_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """(by, widx, j, r) occupied-register rows — the relational HLL
    state, one hash-aggregate per batch (same sparse-state shape as
    hist_percentile.hist_partial). Tokens are round(value) as BIGINT.
    merge(partial(A) ∪ partial(B)) == partial(A ∪ B) because max is
    associative, commutative and idempotent — the snapshot store's
    plug contract, and the reason duplicate replays are harmless."""
    by = list(by or ["user_id"])
    tus = F.unix_micros(F.col(on))
    tok = F.round(F.col(value_col).cast("double")).cast("long")
    events = events.where(F.col(value_col).isNotNull())
    hashed = events.select(
        *by,
        F.floor(tus / F.lit(int(window_micros))).alias("widx"),
        _hash_struct_udf()(tok).alias("_jr"),
    )
    return (
        hashed.select(*by, "widx", F.col("_jr.j").alias("j"),
                      F.col("_jr.r").alias("r"))
        .groupBy(*by, "widx", "j")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(states: DataFrame, by: list[str] | None = None) -> DataFrame:
    by = list(by or ["user_id"])
    return states.groupBy(*by, "widx", "j").agg(F.max("r").alias("r"))


def hll_estimates(states: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Per (by, widx): integer register summary + the distinct estimate
    from the relational state rows — all-JVM (one grouped fold + a
    broadcast libm lookup join for the linear-counting branch)."""
    by = list(by or ["user_id"])
    keys = [*by, "widx"]
    denom_expr = (
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {HLL.RSCALE} - least(r, {HLL.RSCALE}))"
        ))
        + (F.lit(HLL.M) - F.count("*")).cast("long")
        * F.lit(int(1) << HLL.RSCALE).cast("long")
    )
    out = states.groupBy(*keys).agg(
        denom_expr.cast("long").alias("hll_denom"),
        (F.lit(HLL.M) - F.count("*")).cast("int").alias("hll_zeros"),
    )
    spark = states.sparkSession
    from pyhctsa_spark.operators._local_df import one_slice_df

    lut = one_slice_df(
        spark,
        [(v, float(HLL.LC_TABLE[v])) for v in range(1, HLL.M + 1)],
        "hll_zeros int, lc double",
    )
    alpha_num = F.lit(HLL.ALPHA * (HLL.M * HLL.M) * (2.0 ** HLL.RSCALE))
    raw_est = alpha_num / F.col("hll_denom").cast("double")
    est = F.when(
        (raw_est <= F.lit(2.5 * HLL.M)) & (F.col("hll_zeros") > 0),
        F.col("lc"),
    ).otherwise(raw_est)
    return (
        out.join(F.broadcast(lut), "hll_zeros", "left")
        .withColumn("est_distinct", est)
        .drop("lc")
    )


def hll_at_resolution(
    tiers: DataFrame,
    bucket_windows: int,
    group: int = 16,
    n_tiers: int = 3,
) -> DataFrame:
    """Distinct-count buckets of B base windows served from the
    COARSEST stored tier that divides B — the continuous-aggregate
    router (operators/rollup.rollup_at_resolution) applied to HLL
    state. Unlike the ALG router, EVERY output column stays exact
    after the residual merge (register max loses nothing), so any
    resolution a tier divides is answered with full fidelity from
    1/group**t of the tier-0 rows.

    Output rows carry ``tier`` = the SERVING tier and ``window_idx`` =
    bucket index at resolution B."""
    if bucket_windows < 1:
        raise ValueError("bucket_windows must be >= 1")
    t = max(
        k for k in range(n_tiers) if bucket_windows % (group ** k) == 0
    )
    residual = bucket_windows // group ** t
    sel = tiers.where(F.col("tier") == t)
    if residual == 1:
        return sel
    return hll_cascade_from_store(sel, group=residual).withColumn(
        "tier", F.lit(t).cast("int")
    )


_SRC_SCHEMA = "source string, n long, j int, r int"


def hll_distinct_by_source(df: DataFrame) -> DataFrame:
    """Approximate distinct tokens per source across ALL documents.

    Map side: each task unions registers per source locally and emits
    only NON-ZERO (source, register j, value r) rows plus the local
    token count — at most |sources| x (2^p + 1) rows per task. Reduce
    side: groupBy(source, j).max(r) with Catalyst partial aggregation
    (map-side combine), then one 2^p-element in-row fold rebuilds the
    integer denominator. Shuffle volume is independent of corpus size —
    the sketch-union shape that makes distinct-count feasible at 100 TB
    (exact distinct would shuffle every unique token).
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[str, np.ndarray] = {}
        counts: dict[str, int] = {}
        for rb in batches:
            names = rb.schema.names
            sources = rb.column(names.index("source")).to_pylist()
            tok_name = "tokens_bin" if "tokens_bin" in names else "tokens"
            flat, offs, is_bin = _var_width_view(rb.column(names.index(tok_name)))
            for r in range(rb.num_rows):
                raw = flat[offs[r]: offs[r + 1]]
                toks = (raw.view("<i4") if is_bin else raw).astype(np.int64)
                if len(toks) == 0:
                    continue
                regs = HLL.registers_from_tokens(toks)
                s = sources[r]
                if s in acc:
                    np.maximum(acc[s], regs, out=acc[s])
                    counts[s] += len(toks)
                else:
                    acc[s] = regs
                    counts[s] = len(toks)
        if acc:
            src_col, n_col, j_col, r_col = [], [], [], []
            for s, regs in acc.items():
                nz = np.nonzero(regs)[0]
                src_col.extend([s] * len(nz))
                # the task-local token count rides on the FIRST register
                # row only (0 elsewhere), so the reduce-side per-source
                # total is a plain sum over rows — exact, no replication
                n_loc = np.zeros(len(nz), dtype=np.int64)
                if len(nz):
                    n_loc[0] = counts[s]
                n_col.append(n_loc)
                j_col.append(nz.astype(np.int32))
                r_col.append(regs[nz].astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [pa.array(src_col, type=pa.string()),
                 pa.array(np.concatenate(n_col)),
                 pa.array(np.concatenate(j_col)),
                 pa.array(np.concatenate(r_col))],
                names=["source", "n", "j", "r"],
            )

    needed = [c for c in ("source", "tokens_bin", "tokens")
              if c in df.columns]
    partial = df.select(*needed).mapInArrow(fn, schema=_SRC_SCHEMA)
    # register value is max'd per (source, j); the piggybacked local
    # counts are summed. Both are combiner-friendly, so the real
    # shuffle is tasks x sources x <=256 pre-combined rows.
    regs = partial.groupBy("source", "j").agg(
        F.max("r").alias("r"), F.sum("n").alias("n_j")
    )
    # pyspark's shiftleft() wrapper only takes a literal int shift;
    # the SQL function accepts an expression
    denom_expr = (
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {HLL.RSCALE} - least(r, {HLL.RSCALE}))"
        ))
        + (F.lit(HLL.M) - F.count("*")).cast("long")
        * F.lit(int(1) << HLL.RSCALE).cast("long")
    )
    out = regs.groupBy("source").agg(
        F.sum("n_j").cast("long").alias("n"),
        denom_expr.cast("long").alias("hll_denom"),
        (F.lit(HLL.M) - F.count("*")).cast("int").alias("hll_zeros"),
    )
    # the float constant is pre-multiplied in Python with the same
    # operation order as hll_state.finalize, so both engines divide the
    # identical double by the identical integer. The linear-counting
    # branch joins a broadcast 256-row libm lookup table instead of
    # calling the JVM's Math.log, which differs from libm (and so from
    # the DuckDB oracle) in the last ulp on dozens of the 256 possible
    # inputs — measured, not hypothetical.
    spark = df.sparkSession
    from pyhctsa_spark.operators._local_df import one_slice_df

    lut = one_slice_df(
        spark,
        [(v, float(HLL.LC_TABLE[v])) for v in range(1, HLL.M + 1)],
        "hll_zeros int, lc double",
    )
    alpha_num = F.lit(HLL.ALPHA * (HLL.M * HLL.M) * (2.0 ** HLL.RSCALE))
    raw_est = alpha_num / F.col("hll_denom").cast("double")
    est = F.when(
        (raw_est <= F.lit(2.5 * HLL.M)) & (F.col("hll_zeros") > 0),
        F.col("lc"),
    ).otherwise(raw_est)
    return (
        out.join(F.broadcast(lut), "hll_zeros", "left")
        .withColumn("est_distinct", est)
        .drop("lc")
    )
