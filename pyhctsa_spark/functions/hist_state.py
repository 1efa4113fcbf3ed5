"""Sparse token-histogram merge state for EXACT quantile rollups.

The ALG state (stats_state.py) makes moments/lag-products mergeable but
cannot answer order statistics, so the retention cascade leaves HOL
columns (hazen IQR) NULL. Over an INTEGER token domain, however, the
full order-statistics surface IS algebraic: a sparse histogram
{token -> count} per window is a bounded, associatively-mergeable state
from which any quantile, the mode, and the distinct count are exact.

    state size per window <= min(n, |vocab|)

so tier-0 windows carry at most W entries and coarser tiers saturate at
the vocabulary size — at 100 TB the state stays small while the raw
tokens can be dropped (TimescaleDB-style percentile rollups need
approximate sketches for this; an integer domain makes it exact).

Quantile definition: inverted CDF (type 1) — the smallest token value v
whose cumulative count reaches ceil(q*n). Thresholds are computed in
integer arithmetic (den*cum >= num*n) so engine and SQL oracle can never
disagree on a float boundary. Mode tie-break: smallest token value.

Layout (vectorized across k windows, mirroring stats_state):
    vals : int64[m]   entry token values, ascending within each window
    cnts : int64[m]   entry counts (>= 1)
    offs : int64[k+1] window w owns entries offs[w]:offs[w+1]
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HistState = dict[str, np.ndarray]

# (numerator, denominator, output name) — inverted-CDF quantile points
QUANTILES = [(25, 100, "p25"), (50, 100, "p50"), (75, 100, "p75"),
             (90, 100, "p90")]


def hist_from_windows(Y: np.ndarray) -> HistState:
    """Per-window sparse histograms from a (k, L) integer token matrix."""
    Y = np.asarray(Y, dtype=np.int64)
    k, L = Y.shape
    if k == 0:
        return _empty()
    flat = np.sort(Y, axis=1).ravel()
    row = np.repeat(np.arange(k, dtype=np.int64), L)
    change = np.empty(k * L, dtype=bool)
    change[0] = True
    change[1:] = (flat[1:] != flat[:-1]) | (row[1:] != row[:-1])
    starts = np.flatnonzero(change)
    vals = flat[starts]
    cnts = np.diff(np.append(starts, k * L)).astype(np.int64)
    offs = np.searchsorted(row[starts], np.arange(k + 1)).astype(np.int64)
    return {"vals": vals, "cnts": cnts, "offs": offs}


def _empty() -> HistState:
    return {
        "vals": np.empty(0, np.int64),
        "cnts": np.empty(0, np.int64),
        "offs": np.zeros(1, np.int64),
    }


def entry_rows(state: HistState) -> np.ndarray:
    """Window index of each entry."""
    return np.repeat(
        np.arange(len(state["offs"]) - 1, dtype=np.int64),
        np.diff(state["offs"]),
    )


def merge_groups(state: HistState, group: int) -> HistState:
    """Merge every ``group`` consecutive windows into one histogram.

    Trailing windows that don't fill a complete group are dropped
    (make_buffer trailing-drop semantics), matching the ALG cascade.
    Pure integer addition — exact and associative, so any merge tree
    (in-kernel cascade, store-side groupBy, streaming state) agrees.
    """
    offs = state["offs"]
    k = len(offs) - 1
    p = k // group
    if p == 0:
        return _empty()
    cut = offs[p * group]
    vals = state["vals"][:cut]
    cnts = state["cnts"][:cut]
    parent = entry_rows(state)[:cut] // group
    order = np.lexsort((vals, parent))
    pv, vv, cc = parent[order], vals[order], cnts[order]
    m = len(vv)
    change = np.empty(m, dtype=bool)
    change[0] = True
    change[1:] = (vv[1:] != vv[:-1]) | (pv[1:] != pv[:-1])
    starts = np.flatnonzero(change)
    return {
        "vals": vv[starts],
        "cnts": np.add.reduceat(cc, starts).astype(np.int64),
        "offs": np.searchsorted(pv[starts], np.arange(p + 1)).astype(np.int64),
    }


def merge_stack(states: list[HistState]) -> HistState:
    """SEQUENTIAL concatenation: the output's windows are state 0's
    windows, then state 1's, and so on (NOT an elementwise interleave by
    window index). Used by the store cascade where each input state
    carries its own run of windows and the caller wants them stacked in
    input order."""
    vals = np.concatenate([s["vals"] for s in states])
    cnts = np.concatenate([s["cnts"] for s in states])
    lens = np.concatenate([np.diff(s["offs"]) for s in states])
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return {"vals": vals, "cnts": cnts, "offs": offs}


def finalize(state: HistState) -> dict[str, np.ndarray]:
    """Exact order statistics from merged state alone.

    n / n_distinct / mode_tok / mode_count / p25 / p50 / p75 / p90.
    """
    vals, cnts, offs = state["vals"], state["cnts"], state["offs"]
    k = len(offs) - 1
    if k == 0:
        z = np.empty(0, np.int64)
        return {key: z for key in
                ("n", "n_distinct", "mode_tok", "mode_count",
                 *[q[2] for q in QUANTILES])}
    nd = np.diff(offs)
    gcum = np.cumsum(cnts)
    cum0 = np.concatenate([[0], gcum])
    base = cum0[offs[:-1]]
    n = cum0[offs[1:]] - base
    out = {"n": n, "n_distinct": nd}
    for num, den, name in QUANTILES:
        # first entry whose within-window cum count reaches ceil(q*n):
        # integer ceiling division, no float boundary
        thr = -(-(num * n) // den)
        pos = np.searchsorted(gcum, base + thr, side="left")
        out[name] = vals[pos]
    maxc = np.maximum.reduceat(cnts, offs[:-1])
    rows = entry_rows(state)
    is_max = cnts == np.repeat(maxc, nd)
    cand = np.flatnonzero(is_max)
    first = cand[np.searchsorted(rows[cand], np.arange(k))]
    out["mode_tok"] = vals[first]
    out["mode_count"] = maxc.astype(np.int64)
    return out


def topk(state: HistState, k: int) -> dict[str, np.ndarray]:
    """Top-k heavy-hitter tokens per window, exploded.

    Deterministic order: count descending, token ascending on ties.
    Returns flat arrays (row, rank, token, count) — row is the window
    index, rank is 1-based; windows with fewer than k distinct tokens
    emit fewer rows. The histogram is exact, so unlike SpaceSaving /
    Count-Min heavy hitters there is no error bound to carry."""
    vals, cnts, offs = state["vals"], state["cnts"], state["offs"]
    nd = np.diff(offs)
    rows = entry_rows(state)
    # primary key rows keeps each window's entries contiguous after the
    # sort, so position-in-window at sorted index i is i - offs[row]
    order = np.lexsort((vals, -cnts, rows))
    within = np.arange(len(vals)) - np.repeat(offs[:-1], nd)
    keep = within < k
    sel = order[keep]
    return {
        "row": rows[keep],
        "rank": (within[keep] + 1).astype(np.int64),
        "token": vals[sel],
        "count": cnts[sel],
    }


# ---------------------------------------------------------------------------
# Binary store format: packed little-endian (value:int32, count:int64)
# entries, 12 bytes each, per window — the materialized-tier column the
# cascade reads. Counts are int64 ON DISK as well as in memory: a
# coarse tier's dominant-token count can exceed 2^31 (window * group^t
# tokens per parent window at 10^12 scale), and a silent int32 wrap
# would corrupt the exact quantiles this store exists to guarantee.
# ---------------------------------------------------------------------------

_ENTRY = np.dtype({"names": ["v", "c"], "formats": ["<i4", "<i8"],
                   "offsets": [0, 4], "itemsize": 12})


def _pack_buf(vals: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    buf = np.empty(len(vals), dtype=_ENTRY)
    buf["v"] = vals
    buf["c"] = cnts  # int64 -> int64: no truncation possible
    return buf


def pack_arrow(state: HistState) -> pa.Array:
    """State -> Arrow binary column (one blob per window), built from
    raw buffers with no per-row bytes objects."""
    vals, cnts, offs = state["vals"], state["cnts"], state["offs"]
    buf = _pack_buf(vals, cnts)
    offs_b = (offs * 12).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(offs) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offs_b)),
         pa.py_buffer(buf)],
    )


def pack_bytes(state: HistState) -> list[bytes]:
    """State -> python bytes blobs (pandas cascade path)."""
    vals, cnts, offs = state["vals"], state["cnts"], state["offs"]
    raw = _pack_buf(vals, cnts).tobytes()
    return [raw[offs[i] * 12: offs[i + 1] * 12]
            for i in range(len(offs) - 1)]


def unpack_blobs(blobs: list[bytes]) -> HistState:
    """Binary blobs (one per window) -> HistState."""
    if not blobs:
        return _empty()
    lens = np.array([len(b) // 12 for b in blobs], dtype=np.int64)
    flat = np.frombuffer(b"".join(blobs), dtype=_ENTRY)
    return {
        "vals": flat["v"].astype(np.int64),
        "cnts": flat["c"].astype(np.int64),
        "offs": np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
    }
