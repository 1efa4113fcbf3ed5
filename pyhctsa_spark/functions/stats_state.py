"""Algebraic (ALG) merge states for tiered continuous aggregates.

A tier-k window's state is a fixed-size summary from which tier-(k+1)
features are computed by MERGING — never by revisiting raw values:

    n      : point count
    s1     : sum(v)
    s2     : sum(v^2)
    sxy[t] : sum_{i} v_i * v_{i+t}   (within-window lag products, per lag)
    head   : first tau_max raw values (for cross-boundary lag products)
    tail   : last  tau_max raw values

Merging state A (earlier) with state B (later) for lag t adds the
boundary cross terms sum_j tailA[-t+j] * headB[j], which is exactly the
set of (i, i+t) pairs that straddle the A|B boundary. This makes the
lag-product sum — and therefore the reference's 'TimeDomain'
autocorrelation (CO_AutoCorr, Correlation.py:1271-1289) — exactly
mergeable: finalize() reconstructs the two slice means/stds of the
merged window from (n, s1, s2, head, tail) alone.

Everything is vectorized across windows: a state is a dict of numpy
arrays with leading dimension = number of windows.
"""

from __future__ import annotations

import numpy as np

State = dict[str, np.ndarray]


def states_from_windows(Y: np.ndarray, lags: list[int]) -> State:
    """Build per-window states from a (num_windows, W) matrix."""
    Y = np.asarray(Y, dtype=np.float64)
    k, w = Y.shape
    tau_max = max(lags)
    if w < 2 * tau_max:
        raise ValueError(f"window length {w} must be >= 2*tau_max ({2 * tau_max})")
    sxy = np.empty((k, len(lags)), dtype=np.float64)
    for j, t in enumerate(lags):
        sxy[:, j] = np.einsum("ij,ij->i", Y[:, : w - t], Y[:, t:])
    return {
        "n": np.full(k, w, dtype=np.int64),
        "s1": Y.sum(axis=1),
        "s2": np.einsum("ij,ij->i", Y, Y),
        "sxy": sxy,
        "head": Y[:, :tau_max].copy(),
        "tail": Y[:, w - tau_max :].copy(),
    }


def merge_pair(a: State, b: State, lags: list[int]) -> State:
    """Merge elementwise-aligned states (a precedes b in time)."""
    tau_max = max(lags)
    sxy = a["sxy"] + b["sxy"]
    for j, t in enumerate(lags):
        # pairs straddling the boundary: last t of a × first t of b
        sxy[:, j] += np.einsum(
            "ij,ij->i", a["tail"][:, tau_max - t :], b["head"][:, :t]
        )
    return {
        "n": a["n"] + b["n"],
        "s1": a["s1"] + b["s1"],
        "s2": a["s2"] + b["s2"],
        "sxy": sxy,
        "head": a["head"],  # prefix length always >= tau_max
        "tail": b["tail"],
    }


def merge_groups(state: State, group: int, lags: list[int]) -> State:
    """Merge every ``group`` consecutive windows into one state.

    Trailing windows that don't fill a complete group are dropped —
    matching make_buffer trailing-drop semantics (utils.py:292-319), so a
    merged tier equals the direct computation on raw windows of length
    ``group * W``.
    """
    k = len(state["n"])
    p = k // group
    if p == 0:
        return {key: val[:0] for key, val in state.items()}

    def part(key, j):
        v = state[key][: p * group]
        return v.reshape((p, group) + v.shape[1:])[:, j]

    acc = {key: part(key, 0) for key in state}
    for j in range(1, group):
        child = {key: part(key, j) for key in state}
        acc = merge_pair(acc, child, lags)
    return acc


def finalize(state: State, lags: list[int]) -> dict[str, np.ndarray]:
    """Features from merged state alone (no raw values).

    mean / variance(ddof=1) / spread_std(ddof=1): DN_Mean
    (Distribution.py:240), DN_Spread 'std' (Distribution.py:87).
    ac_{t}: CO_AutoCorr 'TimeDomain' (Correlation.py:1271-1289) — slice
    means and population stds reconstructed via head/tail strip sums.
    burst_b / burst_b_kim: DN_Burstiness (Distribution.py:398-438).
    """
    n = state["n"].astype(np.float64)
    s1, s2 = state["s1"], state["s2"]
    tau_max = max(lags)
    mean = s1 / n
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (s2 - n * mean**2) / (n - 1.0)
        var = np.maximum(var, 0.0)
        std = np.sqrt(var)
        r = std / mean
        b = (r - 1.0) / (r + 1.0)
        bk = (np.sqrt(n + 1) * r - np.sqrt(n - 1)) / (
            (np.sqrt(n + 1) - 2.0) * r + np.sqrt(n - 1)
        )
    out = {
        "n": state["n"],
        "mean": mean,
        "variance": var,
        "spread_std": std,
        "burst_b": b,
        "burst_b_kim": bk,
    }
    # Fourier-estimator ACF at lag 1 (CO_AutoCorr 'Fourier',
    # Correlation.py:1241-1259). The padded Wiener-Khinchin transform
    # computes exactly acf[t] = sum_i yc_i yc_{i+t} / sum_i yc_i^2 with
    # yc = y - mean; at lag 1 every term is in the merge state, so the
    # "HOL" feature collapses to algebra (no FFT, no raw pass — this
    # halved kernel memory traffic at scale). Differs from the FFT
    # result only in float summation order (~1e-12 relative).
    if 1 in lags:
        j1 = lags.index(1)
        y0 = state["head"][:, 0]
        ylast = state["tail"][:, -1]
        num = state["sxy"][:, j1] - mean * (2.0 * s1 - y0 - ylast) + (n - 1.0) * mean**2
        den = s2 - n * mean**2
        with np.errstate(invalid="ignore", divide="ignore"):
            out["ac1_fourier"] = np.where(den > 0.0, num / den, np.nan)
    for j, t in enumerate(lags):
        m = n - t
        tail_t = state["tail"][:, tau_max - t :]
        head_t = state["head"][:, :t]
        s1a = s1 - tail_t.sum(axis=1)           # sum of y[:-t]
        s2a = s2 - (tail_t**2).sum(axis=1)
        s1b = s1 - head_t.sum(axis=1)           # sum of y[t:]
        s2b = s2 - (head_t**2).sum(axis=1)
        mu1, mu2 = s1a / m, s1b / m
        with np.errstate(invalid="ignore", divide="ignore"):
            sig1 = np.sqrt(np.maximum(s2a / m - mu1**2, 0.0))
            sig2 = np.sqrt(np.maximum(s2b / m - mu2**2, 0.0))
            out[f"ac{t}_td"] = (state["sxy"][:, j] / m - mu1 * mu2) / (sig1 * sig2)
    return out
