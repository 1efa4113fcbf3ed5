"""Physics-inspired / scaling / graph kernels (reference modules
Operations/Physics.py, ExtremeEvents.py, Scaling.py, Graph.py).

Sequential recurrences (walker, forced particle, moving threshold) are
literal ports of the published update rules; DFA re-implements Max
Little's fastdfa (dyadic-interval DFA-1) in numpy; the visibility graph
ports the reference's nearest-taller-neighbor variant bug-for-bug.
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.entropy import distribution_entropy
from pyhctsa_spark.functions.helpers import gaussian_kde_eval, norm_cdf
from pyhctsa_spark.functions.kernels import (
    acf_fourier_full,
    autocorr_fourier,
    point_of_crossing,
    quantile_hazen,
    sliding_window,
)
from pyhctsa_spark.functions.model import hypothesis_test

__all__ = [
    "walker",
    "force_potential",
    "moving_threshold",
    "fast_dfa",
    "visibility_graph",
    "ansari_bradley_p",
]


def _tau_continuous(x: np.ndarray) -> float:
    return point_of_crossing(acf_fourier_full(x), 0.0)[1] - 1.0


def ansari_bradley_p(x: np.ndarray, y: np.ndarray) -> float:
    """Ansari-Bradley two-sample scale test, normal approximation with
    tie-averaged ranks (scipy.stats.ansari large-sample semantics)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, m = len(x), len(y)
    both = np.concatenate([x, y])
    N = n + m
    order = np.argsort(both, kind="mergesort")
    ranks = np.empty(N)
    ranks[order] = np.arange(1, N + 1)
    # Ansari scores: rank from the nearer end, ties averaged
    scores = np.minimum(ranks, N + 1 - ranks)
    # tie correction via averaging scores of equal values
    sorted_vals = both[order]
    sc_sorted = scores[order]
    i = 0
    while i < N:
        j = i
        while j + 1 < N and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        if j > i:
            sc_sorted[i : j + 1] = sc_sorted[i : j + 1].mean()
        i = j + 1
    scores[order] = sc_sorted
    AB = float(scores[:n].sum())
    if N % 2 == 0:
        mu = n * (N + 2) / 4.0
        var = n * m * (N + 2) * (N - 2) / (48.0 * (N - 1))
    else:
        mu = n * (N + 1) ** 2 / (4.0 * N)
        var = n * m * (N + 1) * (3 + N**2) / (48.0 * N**2)
    if var <= 0:
        return float("nan")
    z = (AB - mu) / math.sqrt(var)
    return float(min(1.0, 2.0 * (1.0 - norm_cdf(abs(z)))))


def walker(y: np.ndarray, walker_rule: str = "prop", walker_params=None) -> dict:
    """Hypothetical walker driven by the series. Parity: PH_Walker
    (Physics.py:10-174): 'prop' / 'biasprop' / 'momentum' update rules,
    trajectory stats, Ansari-Bradley + KDE distribution comparison, and
    residual diagnostics."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if walker_params is None:
        walker_params = {"prop": 0.5, "biasprop": [0.1, 0.2], "momentum": 2}[
            walker_rule
        ]
    w = np.zeros(N)
    if walker_rule == "prop":
        p = float(walker_params)
        for i in range(1, N):
            w[i] = w[i - 1] + p * (y[i - 1] - w[i - 1])
    elif walker_rule == "biasprop":
        pup, pdown = walker_params
        for i in range(1, N):
            gain = pup if y[i] > y[i - 1] else pdown
            w[i] = w[i - 1] + gain * (y[i - 1] - w[i - 1])
    elif walker_rule == "momentum":
        m = float(walker_params)
        w[0], w[1] = y[0], y[1]
        for i in range(2, N):
            w_inert = w[i - 1] + (w[i - 1] - w[i - 2])
            w[i] = w_inert + (y[i] - w_inert) / m
    else:
        raise ValueError(walker_rule)

    out = {
        "w_mean": float(w.mean()),
        "w_median": float(np.median(w)),
        "w_std": float(w.std(ddof=1)),
        "w_ac1": autocorr_fourier(w, 1),
        "w_ac2": autocorr_fourier(w, 2),
        "w_tau": _tau_continuous(w),
        "w_min": float(w.min()),
        "w_max": float(w.max()),
        "w_propzcross": float(np.sum(w[:-1] * w[1:] < 0) / (N - 1)),
        "sw_meanabsdiff": float(np.mean(np.abs(y - w))),
        "sw_taudiff": _tau_continuous(y) - _tau_continuous(w),
        "sw_stdrat": float(w.std(ddof=1) / y.std(ddof=1)),
        "sw_minrat": float(w.min() / y.min()) if y.min() != 0 else float("nan"),
        "sw_maxrat": float(w.max() / y.max()) if y.max() != 0 else float("nan"),
        "sw_propcross": float(
            np.sum((w[:-1] - y[:-1]) * (w[1:] - y[1:]) < 0) / (N - 1)
        ),
    }
    ac1y = autocorr_fourier(y, 1)
    out["sw_ac1rat"] = out["w_ac1"] / ac1y if ac1y != 0 else float("nan")
    out["sw_ansarib_pval"] = ansari_bradley_p(w, y)
    r = np.linspace(min(y.min(), w.min()), max(y.max(), w.max()), 200)
    dy = gaussian_kde_eval(y, r)
    dw = gaussian_kde_eval(w, r)
    out["sw_distdiff"] = float(np.sum(np.abs(dy - dw)))
    res = w - y
    out["res_runstest"] = hypothesis_test(res, "runstest")
    out["res_swss5_1"] = sliding_window(res, "std", "std", 5, 1)
    out["res_ac1"] = autocorr_fourier(res, 1)
    return out


def force_potential(y: np.ndarray, what_potential: str = "dblwell",
                    params: list | None = None) -> dict:
    """Particle in a double-well / sinusoidal potential forced by the
    series. Parity: PH_ForcePotential (Physics.py:175-300) including the
    literal Euler integration and divergence guard."""
    y = np.asarray(y, dtype=np.float64)
    if params is None:
        params = [2, 0.1, 0.1] if what_potential == "dblwell" else [1, 1, 1]
    alpha, kappa, deltat = params
    if what_potential == "sine":
        F = lambda x: np.sin(x / alpha) / alpha  # noqa: E731
    elif what_potential == "dblwell":
        F = lambda x: -(x**3) + alpha**2 * x  # noqa: E731
    else:
        raise ValueError(what_potential)
    N = len(y)
    x = np.zeros(N)
    v = np.zeros(N)
    for i in range(1, N):
        acc = F(x[i - 1]) + y[i - 1] - kappa * v[i - 1]
        x[i] = x[i - 1] + v[i - 1] * deltat + acc * deltat**2
        v[i] = v[i - 1] + acc * deltat
    if not np.isfinite(x[-1]) or abs(x[-1]) > 1e10:
        return {"mean": float("nan")}
    out = {
        "mean": float(x.mean()),
        "median": float(np.median(x)),
        "std": float(x.std(ddof=1)),
        "range": float(np.ptp(x)),
        "proppos": float(np.sum(x > 0) / N),
        "pcross": float(np.sum(x[:-1] * x[1:] < 0) / (N - 1)),
        "ac1": abs(autocorr_fourier(x, 1)),
        "ac10": abs(autocorr_fourier(x, 10)),
        "ac50": abs(autocorr_fourier(x, 50)),
        "tau": _tau_continuous(x),
        "finaldev": float(abs(x[-1])),
    }
    if what_potential == "dblwell":
        out["pcrossup"] = float(
            np.sum((x[:-1] - alpha) * (x[1:] - alpha) < 0) / (N - 1)
        )
        out["pcrossdown"] = float(
            np.sum((x[:-1] + alpha) * (x[1:] + alpha) < 0) / (N - 1)
        )
    return out


def moving_threshold(y: np.ndarray, a: float = 1.0, b: float = 0.1) -> dict:
    """Adaptive extreme-event barrier. Parity: EX_MovingThreshold
    (ExtremeEvents.py:5-78): barrier kicks above extremes by factor a,
    decays by proportion b; stats of barrier and kick intervals."""
    y = np.abs(np.asarray(y, dtype=np.float64))
    if not 0 <= b <= 1:
        raise ValueError("decay proportion b must be in [0, 1]")
    N = len(y)
    q = np.zeros(N)
    kicks = np.zeros(N)
    q[0] = 1.0
    for i in range(1, N):
        if y[i] > q[i - 1]:
            q[i] = (1 + a) * y[i]
            kicks[i] = q[i] - q[i - 1]
        else:
            q[i] = (1 - b) * q[i - 1]
    out = {
        "meanq": float(q.mean()),
        "medianq": float(np.median(q)),
        "iqrq": quantile_hazen(q, 0.75) - quantile_hazen(q, 0.25),
        "maxq": float(q.max()),
        "minq": float(q.min()),
        "stdq": float(q.std(ddof=1)),
        "meanqover": float(np.mean(q - y)),
        "pkick": float(kicks.sum() / (N - 1)),
    }
    fk = np.flatnonzero(kicks > 0)
    ik = np.diff(fk)
    out["stdkicks"] = float(np.std(ik, ddof=1)) if ik.size > 1 else float("nan")
    out["meankickf"] = float(ik.mean()) if ik.size else float("nan")
    out["mediankicksf"] = float(np.median(ik)) if ik.size else float("nan")
    return out


def fast_dfa(y: np.ndarray) -> float:
    """DFA-1 scaling exponent over dyadic intervals (Max Little's
    fastdfa semantics: interval sizes N/2^k >= 4 points, per-window
    linear detrend of the cumulative sum, log-log slope). Parity:
    SC_fastdfa (Scaling.py:6-34; C core re-implemented)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    prof = np.cumsum(y - y.mean())
    intervals = []
    flucts = []
    scale = N
    while scale >= 4:
        nwin = N // scale
        if nwin >= 1:
            seg = prof[: nwin * scale].reshape(nwin, scale)
            t = np.arange(scale, dtype=np.float64)
            tm = t.mean()
            denom = np.sum((t - tm) ** 2)
            slope = ((seg - seg.mean(axis=1, keepdims=True)) @ (t - tm)) / denom
            resid = (
                seg
                - seg.mean(axis=1, keepdims=True)
                - slope[:, None] * (t - tm)[None, :]
            )
            flucts.append(math.sqrt(float(np.mean(resid**2))))
            intervals.append(scale)
        scale //= 2
    iv = np.array(intervals, dtype=np.float64)
    fl = np.array(flucts, dtype=np.float64)
    order = np.argsort(iv)
    coef = np.polyfit(np.log10(iv[order]), np.log10(fl[order]), 1)
    return float(coef[0])


def _natural_vg_degrees(y: np.ndarray) -> np.ndarray:
    """Degrees of the natural visibility graph (Lacasa et al. 2008):
    i sees j>i iff every m between them lies strictly below the line
    from (i, y_i) to (j, y_j) — equivalently slope(i->j) strictly
    exceeds the running max of slope(i->m) for m<j. One O(N) vectorized
    sweep per source node (O(N^2) total, within the reference's
    5000-sample cap)."""
    N = len(y)
    deg = np.zeros(N, dtype=np.int64)
    for i in range(N - 1):
        d = np.arange(1, N - i, dtype=np.float64)
        slopes = (y[i + 1 :] - y[i]) / d
        run = np.maximum.accumulate(slopes)
        vis = np.empty(len(slopes), dtype=bool)
        vis[0] = True  # immediate neighbor always visible
        vis[1:] = slopes[1:] > run[:-1]
        deg[i] += int(vis.sum())
        deg[i + 1 :][vis] += 1
    return deg


def visibility_graph(y: np.ndarray, meth: str = "horiz", max_l: int = 5000) -> dict:
    """Degree-distribution statistics of a visibility graph.
    Parity: NW_VisibilityGraph (Graph.py:9-125), both methods:
    'horiz' — the reference's nearest-taller-neighbor construction,
    ported bug-for-bug (each node links only to its nearest taller
    neighbor on each side, then symmetrized), O(N) via stacks;
    'norm' — the natural visibility graph (ts2vg NaturalVG semantics,
    reimplemented as a running-max-slope sweep)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) > max_l:
        y = y[:max_l]
    N = len(y)
    y = y - y.min()
    if meth == "norm":
        deg = _natural_vg_degrees(y)
    elif meth == "horiz":
        # degrees of the nearest-taller-neighbor graph, O(N) via stacks
        fwd = np.full(N, -1, dtype=np.int64)   # nearest taller to the right
        stack: list[int] = []
        for i in range(N):
            while stack and y[i] > y[stack[-1]]:
                fwd[stack.pop()] = i
            stack.append(i)
        bwd = np.full(N, -1, dtype=np.int64)   # nearest taller to the left
        stack = []
        for i in range(N - 1, -1, -1):
            while stack and y[i] > y[stack[-1]]:
                bwd[stack.pop()] = i
            stack.append(i)
        deg = np.zeros(N, dtype=np.int64)
        edges = set()
        for i in range(N):
            if fwd[i] >= 0:
                edges.add((i, fwd[i]))
            if bwd[i] >= 0:
                edges.add((bwd[i], i))
        for a_, b_ in edges:
            deg[a_] += 1
            deg[b_] += 1
    else:
        raise ValueError(meth)
    k = deg.astype(np.float64)
    vals, counts = np.unique(k, return_counts=True)
    mode = float(vals[np.argmax(counts)])
    sd = k.std(ddof=1)
    out = {
        "mode": mode,
        "propmode": float(np.sum(k == mode) / k.sum()),
        "meank": float(k.mean()),
        "mediank": float(np.median(k)),
        "stdk": float(sd),
        "maxk": float(k.max()),
        "mink": float(k.min()),
        "rangek": float(np.ptp(k)),
        "iqrk": quantile_hazen(k, 0.75) - quantile_hazen(k, 0.25),
        "maxonmedian": float(k.max() / np.median(k)),
    }
    kc = k - k.mean()
    m2 = np.mean(kc**2)
    out["skewnessk"] = float(np.mean(kc**3) / m2**1.5) if m2 > 0 else float("nan")
    q05 = quantile_hazen(k, 0.05)
    q95 = quantile_hazen(k, 0.95)
    mid = k[(k >= q05) & (k <= q95)]
    out["ol90"] = float(mid.mean() / k.mean())
    out["olu90"] = float(np.mean(k[k >= q95] - k.mean()) / sd) if sd > 0 else float("nan")
    # reference Graph.py:111: DistributionEntropy(k, 'hist', 'sqrt')
    out["entropy"] = distribution_entropy(k, "hist", "sqrt")
    mu, sig = k.mean(), k.std(ddof=1)
    out["gaussnlogL"] = float(
        np.sum(0.5 * ((k - mu) / sig) ** 2 + math.log(sig * math.sqrt(2 * math.pi)))
    )
    out["expnlogL"] = float(np.sum(k / mu + math.log(mu)))
    out["kac1"] = autocorr_fourier(k, 1)
    out["kac2"] = autocorr_fourier(k, 2)
    out["kac3"] = autocorr_fourier(k, 3)
    out["ktau"] = _tau_continuous(k)
    return out
