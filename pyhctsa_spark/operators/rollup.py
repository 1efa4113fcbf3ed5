"""Tiered rollup of pre-tokenized sequences — the engine's flagship.

Two physical strategies for the same logical computation:

1. ``rollup_tiers``: ONE shuffle-free ``mapInPandas`` pass computes tier 0
   AND the 16x / 256x tiers. Every window of a doc lives inside its input
   row, so the tier cascade needs no shuffle at all: tier k+1 is produced
   by MERGING tier-k ALG states (functions/stats_state.py) in-kernel.
   HOL features (hazen IQR, Fourier ACF) are recomputed per tier from the
   raw values, which are still in hand. At 100 TB this plan is
   embarrassingly parallel: scan -> python worker -> write, with
   partition balance set by input splits + optional salted repartition.

2. ``cascade_from_store``: the retention path — raw is gone, only a
   materialized tier table remains. Tier k+1 = groupBy(doc_id,
   parent_window) + applyInPandas merge of stored states. ALG features
   (mean/variance/spread_std/ac*_td/burstiness) are exact; HOL features
   are NULL (documented engine semantics for late cascades).

Feature semantics (reference parity, see functions/kernels.py):
  mean (Distribution.py:240), variance/spread_std ddof=1
  (Distribution.py:87), hazen IQR (Distribution.py:88-91), burstiness
  B/B_Kim (Distribution.py:398-438), ac 'TimeDomain'
  (Correlation.py:1271-1289), ac 'Fourier' (Correlation.py:1241-1259).
Window semantics: non-overlapping, trailing partial dropped
(make_buffer, Utilities/utils.py:292-319); tier t window length =
window * group**t.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.functions import stats_state as S
from pyhctsa_spark.functions.gapfill import gap_fill
from pyhctsa_spark.sources.synthetic import token_checksum

DEFAULT_WINDOW = 32
DEFAULT_GROUP = 16
DEFAULT_LAGS = [1, 2]

ROLLUP_SCHEMA = (
    "doc_id string, source string, tier int, window_idx long, n long, "
    "mean double, variance double, spread_std double, spread_iqr double, "
    "ac1_td double, ac2_td double, ac1_fourier double, "
    "burst_b double, burst_b_kim double, "
    "s1 double, s2 double, sxy array<double>, "
    "head array<double>, tail array<double>"
)

_OUT_COLS = [
    "doc_id", "source", "tier", "window_idx", "n",
    "mean", "variance", "spread_std", "spread_iqr",
    "ac1_td", "ac2_td", "ac1_fourier", "burst_b", "burst_b_kim",
    "s1", "s2", "sxy", "head", "tail",
]


def _tier_frame(
    doc_id: str,
    source: str,
    tier: int,
    state: S.State,
    lags: list[int],
    Y_raw: np.ndarray | None,
) -> pd.DataFrame:
    """Assemble one tier's output rows for one doc (vectorized across
    windows). ``Y_raw`` present -> HOL features computed; else NULL."""
    fin = S.finalize(state, lags)
    k = len(state["n"])
    if Y_raw is not None:
        iqr = K.iqr_hazen_2d(Y_raw)
        ac1_f = K.ac_fourier_2d(Y_raw, [1])[:, 0]
    else:
        iqr = np.full(k, np.nan)
        ac1_f = np.full(k, np.nan)
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "source": source,
            "tier": np.int32(tier),
            "window_idx": np.arange(k, dtype=np.int64),
            "n": state["n"],
            "mean": fin["mean"],
            "variance": fin["variance"],
            "spread_std": fin["spread_std"],
            "spread_iqr": iqr,
            "ac1_td": fin.get("ac1_td", np.full(k, np.nan)),
            "ac2_td": fin.get("ac2_td", np.full(k, np.nan)),
            "ac1_fourier": ac1_f,
            "burst_b": fin["burst_b"],
            "burst_b_kim": fin["burst_b_kim"],
            "s1": state["s1"],
            "s2": state["s2"],
            "sxy": list(state["sxy"]),
            "head": list(state["head"]),
            "tail": list(state["tail"]),
        }
    )


def _make_rollup_fn(
    window: int,
    group: int,
    n_tiers: int,
    lags: list[int],
    gapped: bool,
    counters: dict | None,
):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[pd.DataFrame] = []
            n_rows = len(pdf)
            n_windows = 0
            n_bad = 0
            for row in pdf.itertuples(index=False):
                if gapped:
                    vals = gap_fill(
                        np.asarray(row.offsets, dtype=np.int64),
                        np.asarray(row.values, dtype=np.float64),
                        int(row.n_tok),
                    )
                else:
                    vals = np.asarray(row.tokens, dtype=np.float64)
                    # per-row token-array integrity invariant (null
                    # checksum -> skip; pandas renders SQL NULL as NaN,
                    # so notna() not `is None`)
                    cksum = getattr(row, "tok_checksum", None)
                    if pd.notna(cksum):
                        if token_checksum(np.asarray(row.tokens)) != int(cksum):
                            n_bad += 1
                if len(vals) < window:
                    continue
                Y0 = K.make_buffer(vals, window)
                state = S.states_from_windows(Y0, lags)
                out.append(_tier_frame(row.doc_id, row.source, 0, state, lags, Y0))
                n_windows += len(state["n"])
                for tier in range(1, n_tiers):
                    state = S.merge_groups(state, group, lags)
                    if len(state["n"]) == 0:
                        break
                    wlen = window * group**tier
                    Yt = K.make_buffer(vals, wlen)
                    out.append(
                        _tier_frame(row.doc_id, row.source, tier, state, lags, Yt)
                    )
                    n_windows += len(state["n"])
            if counters is not None:
                counters["rows_read"].add(n_rows)
                counters["windows_emitted"].add(n_windows)
                counters["checksum_mismatches"].add(n_bad)
            if out:
                yield pd.concat(out, ignore_index=True)[_OUT_COLS]

    return fn


def make_counters(spark) -> dict:
    """Lineage accumulators (flushed per task by Spark; surfaced into the
    job snapshot by operators/checkpoint.py)."""
    sc = spark.sparkContext
    return {
        "rows_read": sc.accumulator(0),
        "windows_emitted": sc.accumulator(0),
        "checksum_mismatches": sc.accumulator(0),
    }


def rollup_tiers(
    df: DataFrame,
    window: int = DEFAULT_WINDOW,
    group: int = DEFAULT_GROUP,
    n_tiers: int = 3,
    lags: list[int] | None = None,
    gapped: bool = False,
    counters: dict | None = None,
) -> DataFrame:
    """Single-pass 3-tier rollup (see module docstring).

    Input: sequences table (dense: doc_id/tokens/n_tok/source
    [/tok_checksum]; gapped=True: doc_id/offsets/values/n_tok/source).
    """
    lags = lags or DEFAULT_LAGS
    fn = _make_rollup_fn(window, group, n_tiers, lags, gapped, counters)
    return df.mapInPandas(fn, schema=ROLLUP_SCHEMA)


# ---------------------------------------------------------------------------
# Retention-path cascade over the materialized store (no raw values)
# ---------------------------------------------------------------------------

def _make_cascade_fn(group: int, lags: list[int]):
    tau_max = max(lags)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_idx")
        k = len(pdf)
        state: S.State = {
            "n": pdf["n"].to_numpy(np.int64),
            "s1": pdf["s1"].to_numpy(np.float64),
            "s2": pdf["s2"].to_numpy(np.float64),
            "sxy": np.stack(pdf["sxy"].to_numpy()),
            "head": np.stack(pdf["head"].to_numpy()),
            "tail": np.stack(pdf["tail"].to_numpy()),
        }
        # child windows must be contiguous and complete
        widx = pdf["window_idx"].to_numpy(np.int64)
        if k != group or np.any(np.diff(widx) != 1):
            return pd.DataFrame(columns=_OUT_COLS)
        merged = S.merge_groups(state, group, lags)
        out = _tier_frame(
            pdf["doc_id"].iloc[0],
            pdf["source"].iloc[0],
            int(pdf["tier"].iloc[0]) + 1,
            merged,
            lags,
            None,
        )
        out["window_idx"] = widx[0] // group
        return out[_OUT_COLS]

    return fn


def cascade_from_store(
    tier_df: DataFrame, group: int = DEFAULT_GROUP, lags: list[int] | None = None
) -> DataFrame:
    """Compute tier k+1 from a materialized tier-k table alone.

    Exact for ALG features; HOL columns (spread_iqr, ac1_fourier) are
    NULL. This is the continuous-aggregate/retention path: groupBy
    (doc_id, window_idx // group) — one shuffle keyed on fine-grained doc
    ids, so no source-level skew; AQE handles stragglers.
    """
    lags = lags or DEFAULT_LAGS
    keyed = tier_df.withColumn(
        "parent_idx", (F.col("window_idx") / F.lit(group)).cast("long")
    )
    return (
        keyed.groupBy("doc_id", "parent_idx")
        .applyInPandas(_make_cascade_fn(group, lags), schema=ROLLUP_SCHEMA)
    )
