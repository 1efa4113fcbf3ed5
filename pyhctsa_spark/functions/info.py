"""Information-theoretic kernels (reference Operations/Information.py and
the histogram-AMI ops in Operations/Correlation.py).

The reference's kraskov/kernel estimators call Java JIDT through JPype
(Information.py:411-487) — a JVM-in-Python-worker dependency this engine
deliberately avoids. Policy (SURVEY.md §2.6): the 'gaussian' estimator
is exact (-0.5 ln(1 - rho^2)); 'kraskov1'/'kraskov2' are native numpy
KSG-1/KSG-2 ports; 'kernel' is a native box-kernel estimator with
JIDT's default 0.5-sigma width (best-effort parity; the reference
itself needs a JVM to run it).
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import histc
from pyhctsa_spark.functions.kernels import (
    acf_fourier_full,
    autocorr_fourier,
    first_crossing_ac,
)

__all__ = [
    "digamma",
    "mutual_info",
    "auto_mutual_info",
    "histogram_ami",
    "ami_stats",
    "compare_min_ami",
    "first_min",
    "rm_information",
]


def digamma(x: float) -> float:
    """Psi function via recurrence + asymptotic series (|err| < 1e-12)."""
    r = 0.0
    while x < 6.0:
        r -= 1.0 / x
        x += 1.0
    f = 1.0 / (x * x)
    return r + math.log(x) - 0.5 / x - f * (
        1.0 / 12.0 - f * (1.0 / 120.0 - f * (1.0 / 252.0 - f * (1.0 / 240.0 - f / 132.0)))
    )


def _mi_gaussian(x: np.ndarray, y: np.ndarray) -> float:
    """Exact for gaussian variables: -0.5 ln(1 - rho^2)
    (Information.py:336-338)."""
    rho = np.corrcoef(x, y)[0, 1]
    if abs(rho) >= 1.0:
        return float("inf")
    return float(-0.5 * math.log(1.0 - rho * rho))


def _mi_kernel(x: np.ndarray, y: np.ndarray, width: float = 0.5) -> float:
    """Box-kernel MI (JIDT KernelEstimator semantics: radius = width *
    std in each dimension, mean over points of log(N * n_xy / (n_x n_y)))."""
    n = len(x)
    rx = width * np.std(x, ddof=1)
    ry = width * np.std(y, ddof=1)
    cx = np.abs(x[:, None] - x[None, :]) <= rx
    cy = np.abs(y[:, None] - y[None, :]) <= ry
    nx = cx.sum(axis=1).astype(np.float64)
    ny = cy.sum(axis=1).astype(np.float64)
    nxy = (cx & cy).sum(axis=1).astype(np.float64)
    return float(np.mean(np.log(n * nxy / (nx * ny))))


def _mi_ksg1(x: np.ndarray, y: np.ndarray, k: int = 3) -> float:
    """Kraskov-Stoegbauer-Grassberger estimator 1 (max-norm), numpy O(N^2)."""
    n = len(x)
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])
    dz = np.maximum(dx, dy)
    np.fill_diagonal(dz, np.inf)
    eps = np.partition(dz, k - 1, axis=1)[:, k - 1]  # k-th NN distance
    nx = (dx < eps[:, None]).sum(axis=1) - 1
    ny = (dy < eps[:, None]).sum(axis=1) - 1
    return float(
        digamma(k)
        + digamma(n)
        - np.mean([digamma(a + 1) + digamma(b + 1) for a, b in zip(nx, ny)])
    )


def _mi_ksg2(x: np.ndarray, y: np.ndarray, k: int = 3,
             deterministic: bool = False) -> float:
    """Kraskov-Stoegbauer-Grassberger estimator 2 (max-norm), numpy
    O(N^2). Per KSG eq. 9: eps_x/eps_y are the marginal extents of the
    k joint-space nearest neighbors, counts use <= (closed ball), and
    the bias terms are psi(k) - 1/k and psi(n_x)/psi(n_y) without +1
    (the reference exposes this as IN_AutoMutualInfo 'kraskov2',
    Information.py:411-487, via JIDT).

    ``deterministic=True`` breaks joint-distance ties by neighbor index
    (stable sort) instead of argpartition's arbitrary pick — the
    estimator's marginal extents depend on WHICH k neighbors are chosen
    when distances tie at the k-th rank (pair-difference collisions are
    common on quantized data), so this variant is reproducible across
    implementations (the SQL oracle orders by (distance, index))."""
    n = len(x)
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])
    dz = np.maximum(dx, dy)
    np.fill_diagonal(dz, np.inf)
    if deterministic:
        idx = np.argsort(dz, axis=1, kind="stable")[:, :k]
    else:
        idx = np.argpartition(dz, k - 1, axis=1)[:, :k]  # k joint-space NNs
    rows = np.arange(n)[:, None]
    eps_x = dx[rows, idx].max(axis=1)
    eps_y = dy[rows, idx].max(axis=1)
    nx = (dx <= eps_x[:, None]).sum(axis=1) - 1
    ny = (dy <= eps_y[:, None]).sum(axis=1) - 1
    return float(
        digamma(k)
        - 1.0 / k
        + digamma(n)
        - np.mean([digamma(a) + digamma(b) for a, b in zip(nx, ny)])
    )


_ESTIMATORS = {
    "gaussian": _mi_gaussian,
    "kernel": _mi_kernel,
    "kraskov1": _mi_ksg1,
    "kraskov2": _mi_ksg2,
}


def mutual_info(x: np.ndarray, y: np.ndarray, est_method: str = "gaussian",
                extra_param=None) -> float:
    """MI between two series. Parity: IN_MutualInfo (Information.py:358-409)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    fn = _ESTIMATORS[est_method]
    if est_method in ("kraskov1", "kraskov2") and extra_param:
        return fn(x, y, k=int(extra_param))
    return fn(x, y)


def auto_mutual_info(y: np.ndarray, time_delay=1, est_method: str = "gaussian",
                     extra_param=None):
    """Time-delayed AMI. Parity: IN_AutoMutualInfo (Information.py:258-357):
    'ac'/'tau' -> first ACF zero-crossing lag; list -> dict ami{delay}."""
    y = np.asarray(y, dtype=np.float64).ravel()
    if isinstance(time_delay, str) and time_delay in ("ac", "tau"):
        time_delay = int(first_crossing_ac(y)["firstCrossing"])
    delays = time_delay if isinstance(time_delay, list) else [time_delay]
    out = {}
    for d in sorted(delays):
        if len(y) - d < 5:
            out[f"ami{d}"] = float("nan")
            continue
        y1, y2 = (y, y) if d == 0 else (y[:-d], y[d:])
        out[f"ami{d}"] = mutual_info(y1, y2, est_method, extra_param)
    if len(delays) == 1:
        return out[f"ami{delays[0]}"]
    return out


def _ami_bins(y: np.ndarray, meth: str, num_bins: int) -> np.ndarray:
    if meth == "even":
        b = np.linspace(y.min(), y.max(), num_bins + 1)
        b[0] -= 0.1
        b[-1] += 0.1
    elif meth in ("std1", "std2"):
        s = 1.0 if meth == "std1" else 2.0
        b = np.linspace(-s, s, num_bins + 1)
        if y.min() < -s:
            b = np.concatenate(([y.min() - 0.1], b))
        if y.max() > s:
            b = np.concatenate((b, [y.max() + 0.1]))
    elif meth == "quantiles":
        b = np.quantile(y, np.linspace(0, 1, num_bins + 1), method="hazen")
        b[0] -= 0.1
        b[-1] += 0.1
    else:
        raise ValueError(meth)
    return b


def histogram_ami(y: np.ndarray, tau=1, meth: str = "even", num_bins: int = 10):
    """Histogram-estimated AMI. Parity: CO_HistogramAMI
    (Correlation.py:434-529): bin methods even/std1/std2/quantiles,
    joint 2-D histogram, nats."""
    y = np.asarray(y, dtype=np.float64)
    if isinstance(tau, str) and tau in ("ac", "tau"):
        tau = int(first_crossing_ac(y)["firstCrossing"])
    b = _ami_bins(y, meth, num_bins)
    nb = len(b) - 1
    taus = tau if isinstance(tau, (list, np.ndarray)) else [tau]
    amis = np.zeros(len(taus))
    for i, t in enumerate(taus):
        y1, y2 = (y, y) if t == 0 else (y[:-t], y[t:])
        pij, _, _ = np.histogram2d(y1, y2, bins=(b, b))
        pij = pij[:nb, :nb]
        pij = pij / pij.sum()
        pi = pij.sum(axis=1)
        pj = pij.sum(axis=0)
        r = pij > 0
        denom = np.outer(pi, pj)
        amis[i] = np.sum(pij[r] * np.log(pij[r] / denom[r]))
    if len(taus) == 1:
        return float(amis[0])
    return {f"ami{i+1}": float(a) for i, a in enumerate(amis)}


def _mode_smallest(v: np.ndarray) -> tuple[float, int]:
    vals, counts = np.unique(v, return_counts=True)
    i = int(np.argmax(counts))  # unique() sorts -> ties take smallest
    return float(vals[i]), int(counts[i])


def ami_stats(y: np.ndarray, max_tau: int | None = None,
              est_method: str = "gaussian") -> dict:
    """Statistics of the AMI(tau) curve. Parity: IN_AutoMutualInfoStats
    (Information.py:155-257): extrema fractions, first minimum,
    periodicities of local maxima/minima (mode of spacings), level
    crossings, lag-1 ACF of the AMI curve."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    max_tau0 = int(max_tau if max_tau is not None else math.ceil(N / 4))
    mt = min(max_tau0, int(math.ceil(N / 2)))
    ami = np.array([
        auto_mutual_info(y, d, est_method) for d in range(1, mt + 1)
    ])
    out = {}
    for i in range(1, max_tau0 + 1):
        out[f"ami{i}"] = float(ami[i - 1]) if i <= mt else float("nan")
    lami = len(ami)
    out["mami"] = float(np.mean(ami))
    out["stdami"] = float(np.std(ami, ddof=1))
    dami = np.diff(ami)
    extremai = np.flatnonzero(dami[:-1] * dami[1:] < 0)
    out["pextrema"] = len(extremai) / (lami - 1)
    out["fmmi"] = float(extremai.min() + 1) if extremai.size else float(lami)
    maximai = np.flatnonzero((dami[:-1] > 0) & (dami[1:] < 0)) + 1
    dmax = np.diff(maximai)
    out["pmaxima"] = len(dmax) / (lami // 2)
    if dmax.size == 0:
        out["modeperiodmax"] = out["pmodeperiodmax"] = float("nan")
    else:
        m, c = _mode_smallest(dmax)
        out["modeperiodmax"] = m
        out["pmodeperiodmax"] = float(np.sum(dmax == m) / len(dmax))
    minimai = np.flatnonzero((dami[:-1] < 0) & (dami[1:] > 0)) + 1
    dmin = np.diff(minimai)
    out["pminima"] = len(dmin) / (lami // 2)
    if dmin.size == 0:
        out["modeperiodmin"] = out["pmodeperiodmin"] = float("nan")
    else:
        m, c = _mode_smallest(dmin)
        out["modeperiodmin"] = m
        out["pmodeperiodmin"] = float(np.sum(dmin == m) / len(dmin))
    out["pcrossmean"] = float(np.mean(np.diff(np.sign(ami - ami.mean())) != 0))
    out["pcrossmedian"] = float(np.mean(np.diff(np.sign(ami - np.median(ami))) != 0))
    q10 = np.percentile(ami, 10, method="hazen")
    q90 = np.percentile(ami, 90, method="hazen")
    out["pcrossq10"] = float(np.mean((ami - q10)[1:] * (ami - q10)[:-1] < 0))
    out["pcrossq90"] = float(np.mean((ami - q90)[1:] * (ami - q90)[:-1] < 0))
    out["amiac1"] = autocorr_fourier(ami, 1)
    return out


def compare_min_ami(y: np.ndarray, bin_method: str = "std1",
                    num_bins=10) -> dict:
    """Variability of the first AMI minimum across bin counts. Parity:
    CO_CompareMinAMI (Correlation.py:356-433): scan tau = 0..ceil(N/2),
    stop at the first turning point; stats over bin counts."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    tau_range = np.arange(0, int(math.ceil(N / 2)) + 1)
    bins = [num_bins] if isinstance(num_bins, int) else list(num_bins)
    ami_mins = np.zeros(len(bins))
    for i, nb in enumerate(bins):
        amis = np.zeros(len(tau_range))
        for j, t in enumerate(tau_range):
            amis[j] = histogram_ami(y, int(t), bin_method, nb)
            if j > 1 and (amis[j] - amis[j - 1]) * (amis[j - 1] - amis[j - 2]) < 0:
                ami_mins[i] = tau_range[j - 1]
                break
        if ami_mins[i] == 0:
            ami_mins[i] = tau_range[-1]
    out = {
        "min": float(ami_mins.min()),
        "max": float(ami_mins.max()),
        "range": float(np.ptp(ami_mins)),
        "median": float(np.median(ami_mins)),
        "mean": float(np.mean(ami_mins)),
        "std": float(np.std(ami_mins, ddof=1)),
        "nunique": float(len(np.unique(ami_mins))),
    }
    m, c = _mode_smallest(ami_mins)
    out["mode"] = m
    out["modef"] = c / len(bins)
    out["conv4"] = float(np.mean(ami_mins[-5:]))
    d = np.diff(ami_mins[:-1])
    pos = np.flatnonzero(d > 0)
    sc = np.flatnonzero(d[1:] * d[:-1] < 0)
    loc_extr = np.intersect1d(pos, sc) + 1
    above = np.flatnonzero(ami_mins > out["mean"] + out["std"])
    out["nlocmax"] = float(len(np.intersect1d(above, loc_extr)))
    return out


def _mi_bin_range(x: np.ndarray, z: np.ndarray, num_bins: int = 10) -> float:
    """Binned MI with 'range' partitioning (reference _mi_bin +
    _give_me_edges, Information.py:92-153): equal-width edges over
    [min, max + 1e-6], joint histogram2d, nats."""
    n = len(x)
    ee = 1e-6
    ex = np.linspace(x.min(), x.max() + ee, num_bins + 1)
    ez = np.linspace(z.min(), z.max() + ee, num_bins + 1)
    ni, _ = np.histogram(x, ex)
    nj, _ = np.histogram(z, ez)
    pij, _, _ = np.histogram2d(x, z, [ex, ez])
    pi = ni[:num_bins] / n
    pj = nj[:num_bins] / n
    pij = pij / n
    pxp = np.outer(pi, pj)
    mask = (pxp > 0) & (pij > 0)
    if not np.any(mask):
        return float("nan")
    return float(np.sum(pij[mask] * np.log(pij[mask] / pxp[mask])))


def first_min(y: np.ndarray, what: str = "ac", max_tau: int | None = None,
              est_method: str = "gaussian", num_bins: int = 10,
              min_not_max: bool = True) -> float:
    """Lag of the first local minimum of the ACF ('ac'), the gaussian
    AMI curve ('mi'/'mi-gaussian'), or the range-binned histogram AMI
    ('mi-hist'); ``min_not_max=False`` finds the first local MAXIMUM
    instead (the reference's falsy-minNotMax branch, which can never
    return lag 1 — its pattern needs i > 2). Parity: CO_FirstMin
    (Information.py:11-89), including the NaN fallback when no extremum
    exists in the search horizon (max_tau bounds the search for the
    engine's O(N tau) cost control; None = the reference's full-series
    sweep)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    mt = min(max_tau or n - 2, n - 2)
    if what == "ac":
        curve = acf_fourier_full(y)[: mt + 2]
        # reference early-exits with NaN at the FIRST NaN lag — an
        # extremum found past a NaN must not be returned
        # (Information.py:66-68/:82-84). Extremum at t needs lags
        # 1..t+1 all computed, so the NaN test leads each step.
        if np.isnan(curve[1]):
            return float("nan")
        if min_not_max:
            for t in range(1, mt + 1):
                if np.isnan(curve[t + 1]):
                    return float("nan")
                if curve[t] < curve[t - 1] and curve[t] < curve[t + 1]:
                    return float(t)
        else:
            for t in range(1, mt + 1):
                if np.isnan(curve[t + 1]):
                    return float("nan")
                if t >= 2 and curve[t] > curve[t - 1] and curve[t] > curve[t + 1]:
                    return float(t)
        return float("nan")
    if what in ("mi", "mi-gaussian"):
        def corrfn(tau: int) -> float:
            return auto_mutual_info(y, tau, est_method)
    elif what == "mi-hist":
        def corrfn(tau: int) -> float:
            return _mi_bin_range(y[:-tau], y[tau:], num_bins)
    else:
        raise ValueError(what)
    # lazy curve with early exit: evaluate lags incrementally, stop at
    # the first local extremum (the common case is tau < 20). prev2
    # starts at +inf, which for the max path also encodes the
    # reference's can't-return-lag-1 rule for free.
    prev2 = np.inf
    prev1 = corrfn(1)
    if np.isnan(prev1):
        return float("nan")  # reference NaN early-exit (see 'ac' note)
    for t in range(1, mt + 1):
        cur = corrfn(t + 1)
        if np.isnan(cur):
            return float("nan")
        if min_not_max:
            if prev1 < prev2 and prev1 < cur:
                return float(t)
        else:
            if prev1 > prev2 and prev1 > cur:
                return float(t)
        prev2, prev1 = prev1, cur
    return float("nan")


def rm_information(y: np.ndarray, tau: int = 1) -> float:
    """Moddemeijer histogram MI with automatic descriptor
    (ncell = ceil(n^(1/3)), half-delta-expanded bounds) and the
    unbiased correction. Parity: rm_information / _rm_info
    (Information.py:490-688, RM_histogram2 utils.py:455-566)."""
    y = np.asarray(y, dtype=np.float64)
    if tau >= len(y):
        return float("nan")
    x, z = (y, y) if tau == 0 else (y[:-tau], y[tau:])
    n = len(x)
    ncell = int(math.ceil(n ** (1.0 / 3.0)))
    # RM_histogram2 cell assignment (utils.py:551-553): banker's-rounded
    # round(f*ncell + 1/2) with half-delta-expanded bounds; out-of-range
    # points are DROPPED (possible with quantized data on cell edges)
    dx = (x.max() - x.min()) / (n - 1)
    dz = (z.max() - z.min()) / (n - 1)
    lox, hix = x.min() - dx / 2, x.max() + dx / 2
    loz, hiz = z.min() - dz / 2, z.max() + dz / 2
    xx = np.around((x - lox) / (hix - lox) * ncell + 0.5).astype(int) - 1
    zz = np.around((z - loz) / (hiz - loz) * ncell + 0.5).astype(int) - 1
    ok = (xx >= 0) & (xx < ncell) & (zz >= 0) & (zz < ncell)
    h = np.zeros((ncell, ncell))
    np.add.at(h, (xx[ok], zz[ok]), 1.0)
    count = h.sum()
    hx = h.sum(axis=1)
    hy = h.sum(axis=0)
    nz = h > 0
    est = (
        np.sum(h[nz] * np.log(h[nz]))
        - np.sum(hx[hx > 0] * np.log(hx[hx > 0]))
        - np.sum(hy[hy > 0] * np.log(hy[hy > 0]))
    ) / count + math.log(count)
    # unbiased (Moddemeijer / reference Information.py:663): N-bias uses
    # the TOTAL cell grid, (ncellx-1)(ncelly-1)/(2 count)
    nbias = (ncell - 1) * (ncell - 1) / (2.0 * count)
    return float(est - nbias)
