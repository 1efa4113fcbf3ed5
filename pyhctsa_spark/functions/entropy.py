"""Entropy-family kernels (reference module Operations/Entropy.py).

All C-extension-backed reference ops (physionet sampen.c, MS_shannon.c,
ML_close_ret.c) are re-implemented in vectorized numpy from their
published algorithms — no native code on executors.
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import binpicker, gaussian_kde_eval, histc
from pyhctsa_spark.functions.kernels import make_buffer, zscore

__all__ = [
    "sample_entropy",
    "approximate_entropy",
    "perm_entropy_ref",
    "multiscale_entropy",
    "shannon_entropy_ms",
    "distribution_entropy",
    "lz_complexity",
    "rpde",
]


def _embed(x: np.ndarray, order: int, delay: int = 1) -> np.ndarray:
    n = len(x) - (order - 1) * delay
    if n <= 0:
        raise ValueError("series too short to embed")
    idx = np.arange(n)[:, None] + delay * np.arange(order)[None, :]
    return x[idx]


def sample_entropy(y: np.ndarray, M: int = 2, r: float | None = None,
                   pre_process: str | None = None) -> dict:
    """SampEn for m = 0..M (physionet sampen semantics: template matches
    with Chebyshev distance, i < j pairs, no self-matches;
    sampen[m] = -ln(A_m / B_m) with B_0 = N(N-1)/2).

    Parity: EN_SampEn (Entropy.py:263-308); quadSampEn adds ln(2r).
    """
    y = np.asarray(y, dtype=np.float64)
    if r is None:
        r = 0.1 * np.std(y, ddof=1)
    if pre_process == "diff1":
        y = np.diff(y)
    n = len(y)
    if n > 3000:
        # O(N^2) memory/time guard (mirrors the reference's maxL=5000 cap
        # on its O(N^2) graph op, Graph.py:74-78; 3000^2 bool matrices
        # keep a full-catalog pass per doc under ~100ms)
        y = y[:3000]
        n = 3000
    # D_m[i, j] = templates of length m starting at i, j match
    # (Chebyshev <= r). D_{m+1} = D_m[:-1, :-1] & close[m:, m:].
    close = np.abs(y[:, None] - y[None, :]) <= r
    D = close
    sampen = np.empty(M + 1)

    def _triu_sum(mat, upto):
        sub = mat[:upto, :upto]
        return (np.triu(sub, k=1)).sum()

    for m in range(M + 1):
        if m == 0:
            B = n * (n - 1) / 2.0
            A = float(np.triu(close, k=1).sum())
        else:
            # restrict both A and B to the n-m templates that admit a
            # length-(m+1) continuation (Richman-Moorman index set)
            B = float(_triu_sum(D, n - m))
            D = D[:-1, :-1] & close[m:, m:]
            A = float(np.triu(D, k=1).sum())
        sampen[m] = -math.log(A / B) if A > 0 and B > 0 else math.inf
    out = {}
    for m in range(M + 1):
        out[f"sampen{m}"] = float(sampen[m])
        out[f"quadSampEn{m}"] = float(sampen[m] + np.log(2 * r)) if np.isfinite(sampen[m]) else float("nan")
    if M > 1:
        fin = sampen[np.isfinite(sampen)]
        out["meanchsampen"] = float(np.mean(np.diff(sampen))) if np.isfinite(sampen).all() else float("nan")
    return out


def approximate_entropy(x: np.ndarray, m: int = 1, rth: float = 0.2) -> float:
    """ApEn(m, r*sigma) with Chebyshev radius counts INCLUDING
    self-matches (KDTree.query_radius semantics). Parity: EN_ApEn
    (Entropy.py:407-470)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) > 2000:
        # the reference uses a KDTree (O(N log N)); this numpy broadcast
        # is O(N^2) memory, so cap the series (engine O(N^2) policy)
        x = x[:2000]
    r = rth * np.std(x, ddof=1)
    phis = []
    for order in (m, m + 1):
        E = _embed(x, order)
        d = np.max(np.abs(E[:, None, :] - E[None, :, :]), axis=2)
        cnt = (d <= r).sum(axis=1).astype(np.float64)
        phis.append(np.mean(np.log(cnt / E.shape[0])))
    return float(phis[0] - phis[1])


def perm_entropy_ref(y: np.ndarray, m: int = 2, tau: int = 1) -> dict:
    """Permutation entropy, reference flavor (EN_PermEn,
    Entropy.py:309-348): ordinal patterns from argsort, Shannon entropy
    in BITS, normalized by log2(m!)."""
    y = np.asarray(y, dtype=np.float64)
    E = _embed(y, m, tau)
    if E.shape[0] <= 5:
        raise ValueError("series too short")
    sorted_idx = E.argsort(kind="quicksort", axis=1)
    hashval = (sorted_idx * (m ** np.arange(m))).sum(axis=1)
    _, c = np.unique(hashval, return_counts=True)
    p = c / c.sum()
    pe = float(-(p * np.log2(p)).sum())
    return {"permEn": pe, "normPermEn": pe / math.log2(math.factorial(m))}


def multiscale_entropy(y: np.ndarray, scales: list[int] | None = None,
                       m: int = 2, r: float = 0.15) -> dict:
    """Multiscale entropy: coarse-grain by non-overlapping means (the
    same downsampling as the engine's tier cascade) then SampEn per
    scale. Parity: EN_mse / MultiScaleEntropy (Entropy.py:166-262),
    bug-for-bug: r = 0.15 is the ABSOLUTE similarity threshold (the
    reference never rescales it by the coarse-grained std), the minimum
    usable series length is 20, and the summary block is the reference's
    nan-aware max/min (+ their scales), mean, std, cv, and mean change.
    """
    y = np.asarray(y, dtype=np.float64)
    scales = list(scales) if scales is not None else list(range(1, 10))
    ents: dict = {}
    vals = np.full(len(scales), np.nan)
    for i, s in enumerate(scales):
        cg = make_buffer(y, s).mean(axis=1) if s > 1 else y
        if len(cg) >= 20:
            vals[i] = sample_entropy(cg, M=m, r=r)[f"sampen{m}"]
        ents[f"sampen_s{s}"] = float(vals[i])
    if np.all(np.isnan(vals)):
        for k in ("maxSampEn", "maxScale", "minSampEn", "minScale",
                  "meanSampEn", "stdSampEn", "cvSampEn", "meanch"):
            ents[k] = float("nan")
        return ents
    with np.errstate(invalid="ignore"):
        ents["maxSampEn"] = float(np.nanmax(vals))
        ents["maxScale"] = float(scales[int(np.nanargmax(vals))])
        ents["minSampEn"] = float(np.nanmin(vals))
        ents["minScale"] = float(scales[int(np.nanargmin(vals))])
        ents["meanSampEn"] = float(np.nanmean(vals))
        ents["stdSampEn"] = float(np.nanstd(vals, ddof=1))
        ents["cvSampEn"] = float(ents["stdSampEn"] / ents["meanSampEn"])
        ents["meanch"] = float(np.nanmean(np.diff(vals)))
    return ents


def shannon_entropy_ms(y: np.ndarray, num_bins: int = 2, depth: int = 3) -> float:
    """Equipopulated-bin symbolization + depth-word Shannon entropy,
    normalized by depth (the EN_MS_shannon wrapper divides by depth,
    Entropy.py:15-86; MS_shannon.c algorithm re-implemented: rank-based
    equiprobable alphabet, overlapping words, natural log)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < depth + 1:
        return float("nan")
    # equipopulated bins via rank
    order = np.argsort(y, kind="mergesort")
    sym = np.empty(n, dtype=np.int64)
    sym[order] = (np.arange(n) * num_bins) // n
    # overlapping depth-words
    idx = np.arange(n - depth + 1)[:, None] + np.arange(depth)[None, :]
    words = (sym[idx] * (num_bins ** np.arange(depth))).sum(axis=1)
    _, c = np.unique(words, return_counts=True)
    p = c / c.sum()
    H = float(-(p * np.log(p)).sum())
    return H / depth


def distribution_entropy(y: np.ndarray, hist_or_ks: str = "hist",
                         num_bins: int | float = 10, olremp: float = 0.0) -> float:
    """Entropy of the estimated distribution (histogram via binpicker
    'nice' edges, or gaussian KDE), with optional outlier-trimmed
    difference. Parity: EN_DistributionEntropy (Entropy.py:87-165)."""
    y = np.asarray(y, dtype=np.float64)
    if olremp != 0.0:
        lo = np.quantile(y, olremp, method="hazen")
        hi = np.quantile(y, 1 - olremp, method="hazen")
        yhat = y[(y >= lo) & (y <= hi)]
        if yhat.size == 0:
            return float("nan")
        return distribution_entropy(y, hist_or_ks, num_bins) - distribution_entropy(
            yhat, hist_or_ks, num_bins
        )
    if hist_or_ks == "hist":
        if isinstance(num_bins, str):
            # reference Entropy.py:135-139: rule-named bins use numpy
            # bin edges and normalize AFTER dropping the histc tail
            edges = np.histogram_bin_edges(y, bins=num_bins)
            px = histc(y, edges).astype(np.float64)[:-1]
            px = px / px.sum()
        else:
            edges = binpicker(float(y.min()), float(y.max()), int(num_bins))
            px = histc(y, edges).astype(np.float64)
            px = (px / px.sum())[:-1]
        bwz = np.diff(edges)
        nz = px > 0
        # reference Entropy.py:162-165: -sum(P * log(P / binWidth)),
        # NO binWidth multiplier on the sum
        return float(-(px[nz] * np.log(px[nz] / bwz[nz])).sum())
    if hist_or_ks == "ks":
        # reference Entropy.py:143-160, bug-for-bug: a float num_bins is
        # the scipy kde FACTOR (scales the sample std into the bandwidth)
        # but the grid padding treats it as an absolute width; default
        # path uses the silverman factor and pads by 3*factor*std_pop.
        n = len(y)
        sd_samp = float(np.std(y, ddof=1))
        if num_bins:
            factor = float(num_bins)
            pad = 3.0 * factor
        else:
            factor = (n * 3.0 / 4.0) ** (-0.2)  # silverman, 1-D
            pad = 3.0 * factor * float(np.std(y))
        h = factor * sd_samp
        xr = np.linspace(y.min() - pad, y.max() + pad, 100)
        z = (xr[:, None] - y[None, :]) / h
        px = np.exp(-0.5 * z * z).sum(axis=1) / (n * h * math.sqrt(2 * math.pi))
        dxr = xr[1] - xr[0]
        nz = px > 0
        # reference: -sum(px * log(px / dx)) over RAW density values
        return float(-(px[nz] * np.log(px[nz] / dxr)).sum())
    raise ValueError(hist_or_ks)


def _lz_phrase_count(symbols: np.ndarray) -> int:
    """LZ76-style phrase counting with the reference's exact scan
    semantics (Entropy.py:583-620): phrases grow while the current
    phrase appears earlier; counter increments otherwise."""
    n = symbols.size
    if n == 0:
        return 0
    sym = symbols.tolist()
    c = 1
    phrase_start = 1
    phrase_len = 1
    k = 2
    while k < n:
        found = False
        for i in range(phrase_start - phrase_len + 1):
            if sym[i : i + phrase_len] == sym[phrase_start : phrase_start + phrase_len]:
                found = True
                break
        if found:
            phrase_len += 1
        else:
            c += 1
            phrase_start += phrase_len
            phrase_len = 1
        k += 1
    return c


def lz_complexity(x: np.ndarray, nbits: int = 2, pre_proc: str | None = None,
                  rng_seed: int = 0) -> float:
    """Normalized Lempel-Ziv complexity of an n-bit rank encoding.

    Parity: EN_LZcomplexity (Entropy.py:542-631): seeded eps-noise
    tie-break (legacy RandomState for bit-compatible noise), mergesort
    ranks, symbols 1..nbits, phrase count normalized by n log(nbits)/log(n).
    """
    rng = np.random.RandomState(rng_seed)
    x = np.asarray(x, dtype=np.float64).ravel()
    if pre_proc == "diff":
        x = zscore(np.diff(x))
    if x.size > 4000:
        x = x[:4000]  # phrase counting is O(N^2) worst-case in pure python
    if x.size == 0 or nbits < 2:
        return 0.0
    n = x.size
    noisy = x + np.finfo(np.float64).eps * rng.randn(n)
    order = np.argsort(noisy, kind="mergesort")
    sym = np.empty(n, dtype=np.int64)
    sym[order] = np.floor(np.arange(1, n + 1) * (nbits / (n + 1))).astype(np.int64) + 1
    c = _lz_phrase_count(sym)
    return float(c * np.log(n) / (n * np.log(nbits)))


def rpde(y: np.ndarray, m: int = 2, tau: int = 1, epsilon: float = 0.12,
         t_max: int = -1) -> dict:
    """Recurrence period density entropy (Max Little's close-returns
    algorithm re-implemented: for each embedded point, wait to exit the
    epsilon-ball, record the time of first return). Parity: EN_rpde
    (Entropy.py:349-406)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) > 3000:
        y = y[:3000]  # O(N^2) close-returns guard
    E = _embed(y, m, tau)
    ne = E.shape[0]
    rt_counts = np.zeros(ne + 1, dtype=np.float64)
    for i in range(ne - 1):
        d = np.max(np.abs(E[i + 1 :] - E[i]), axis=1)
        outside = np.flatnonzero(d > epsilon)
        if outside.size == 0:
            continue
        j0 = outside[0]
        back = np.flatnonzero(d[j0:] <= epsilon)
        if back.size:
            T = j0 + back[0] + 1
            rt_counts[T] += 1
    if t_max > -1:
        rt_counts = rt_counts[:t_max]
    s = rt_counts.sum()
    if s == 0:
        return {"H": float("nan"), "H_norm": float("nan"),
                "propNonZero": 0.0, "meanNonZero": float("nan"), "maxRPD": 0.0}
    rpd = rt_counts / s
    N = len(rpd)
    ip = rpd > 0
    H = float(-(rpd[ip] * np.log(rpd[ip])).sum())
    return {
        "H": H,
        "H_norm": H / math.log(N),
        "propNonZero": float(np.mean(ip)),
        "meanNonZero": float(np.mean(rpd[ip]) * N),
        "maxRPD": float(rpd.max() * N),
    }
