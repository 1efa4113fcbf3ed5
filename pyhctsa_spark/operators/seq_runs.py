"""Sequential per-series kernels over sorted key-runs, Arrow-native.

Several time-series operators are RECURRENCES — each output depends on
the previous one (LTTB's selected-point chain, EWMA smoothing, CUSUM
drift statistics). They cannot be window expressions, but they do NOT
need per-group pandas either: ``applyInPandas`` pays ~1-3 ms of pandas
assembly per group, which measured ~5x the total kernel cost at 1,500
groups (see operators/downsample.py). The pattern here instead:

    repartition(by) -> sortWithinPartitions(by, on) -> mapInArrow

One shuffle, an in-partition sort, then a single Arrow pass per
partition that walks maximal same-key runs and hands each COMPLETE run
(a zero-copy ``pa.Table`` slice) to the kernel. A key's run may
straddle Arrow batches, so the unfinished tail run is carried into the
next batch: peak memory is max(arrow_batch, one key's series) — never
the whole partition — which is exactly the bound the flagship rollup
holds at 10^12 sequences. Skew note: one key = one task at worst, the
same floor any per-key sequential semantics has.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F


def map_sorted_runs(
    df: DataFrame,
    by: list[str],
    order: list[str],
    run_fn: Callable[[pa.Table], pa.Table | None],
    out_schema: str,
) -> DataFrame:
    """Apply ``run_fn`` to each ``by``-key's full run of ``df`` rows,
    sorted by ``order`` within the key.

    ``run_fn`` receives one key's rows as a ``pa.Table`` (all columns of
    ``df``, in sorted order) and returns a ``pa.Table`` matching
    ``out_schema`` (a Spark DDL string), or ``None`` for no output.
    Runs are reassembled across Arrow batch boundaries via a carry
    buffer; see module docstring for the memory bound.
    """
    by = list(by)
    sdf = df.repartition(*[F.col(c) for c in by]).sortWithinPartitions(
        *by, *order
    )

    def _run_bounds(tbl: pa.Table) -> np.ndarray:
        n = tbl.num_rows
        bound = np.zeros(n, dtype=bool)
        for c in by:
            a = tbl.column(c).to_numpy(zero_copy_only=False)
            bound[1:] |= a[1:] != a[:-1]
        return np.flatnonzero(np.r_[True, bound[1:]])

    def _kernel(batches):
        carry: pa.Table | None = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                # concat_tables is zero-copy (chunked table); a
                # combine_chunks here would memcpy the whole carried
                # run EVERY batch — O(B^2) for a run spanning B batches
                tbl = pa.concat_tables([carry, tbl])
            starts = _run_bounds(tbl)
            # hold back the final run — it may continue in the next batch
            carry = tbl.slice(starts[-1])
            outs = [
                run_fn(tbl.slice(a, b - a))
                for a, b in zip(starts[:-1], starts[1:])
            ]
            outs = [o for o in outs if o is not None and o.num_rows]
            if outs:
                yield from pa.concat_tables(outs).to_batches()
        if carry is not None and carry.num_rows:
            out = run_fn(carry)
            if out is not None and out.num_rows:
                yield from out.to_batches()

    return sdf.mapInArrow(_kernel, schema=out_schema)


def key_fields_ddl(df: DataFrame, by: list[str]) -> str:
    """Spark DDL fragment for the ``by`` columns of ``df`` (reuse the
    input key types in the output schema)."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in set(by)
    )
