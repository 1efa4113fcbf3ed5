"""Pure-numpy feature kernels, reference-faithful to pyhctsa.

Every function here is importable and unit-testable WITHOUT Spark; the
Spark operators wrap them in Arrow-batched pandas UDFs. Two flavors:

- ``*_1d``-style scalar kernels: ``f(y: 1-D float64 array, **params)`` →
  float or dict, matching the reference definition cited in the docstring
  (semantics only — the code is written fresh for vectorized numpy).
- ``*_2d`` batched kernels: operate on a ``(num_windows, window_len)``
  matrix at once, axis=1. These are the production hot path — one numpy
  call covers every window in an Arrow batch.

Reference citations are `file:line` into /root/reference (pyhctsa
snapshot @ 2025-07-25); they document WHICH published definition each
kernel matches, for parity checking.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "zscore",
    "make_buffer",
    "mean_",
    "variance",
    "spread_std",
    "spread_iqr",
    "spread_mad",
    "spread_mead",
    "quantile_hazen",
    "burstiness",
    "autocorr_timedomain",
    "autocorr_fourier",
    "acf_fourier_full",
    "mean_2d",
    "variance_2d",
    "std_2d",
    "iqr_hazen_2d",
    "burstiness_2d",
    "ac_timedomain_2d",
    "ac_fourier_2d",
    "trev",
    "tc3",
    "theiler_q",
    "crinkle",
    "timerev_kaplan",
    "std_nth_der",
    "moments",
    "cv",
    "minmax",
    "proportion_values",
    "high_low_mu",
    "withinp",
    "unique_fraction",
    "trimmed_mean",
    "histogram_mode",
    "stat_av",
    "sliding_window",
    "trend",
    "cid_ce",
    "pnn",
    "simple_stats",
    "local_simple",
    "glscf",
    "fzcglscf",
    "nonlinear_autocorr",
    "embed2_basic",
    "perm_entropy",
    "distribution_entropy_hist",
    "first_crossing_ac",
    "first_min_ac",
    "point_of_crossing",
    "motif_two",
    "binary_stats",
    "rad",
    "custom_skewness",
    "fit_polynomial",
    "local_global",
    "range_evolve",
    "drifting_mean",
    "dyn_win_basic",
    "moment_corr",
]


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------

def zscore(x: np.ndarray) -> np.ndarray:
    """Double z-score (applied twice, ddof=1) with finite/constant guards.

    Parity: pyhctsa ``ZScore`` (Utilities/utils.py:55-103) — z-scoring twice
    reduces floating-point error in the second moment.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("empty input")
    if not np.isfinite(x).all():
        raise ValueError("non-finite values in input")
    if np.var(x, ddof=1) < 1e-10 or np.ptp(x) < 1e-10:
        raise ValueError("constant input")
    z = (x - x.mean()) / x.std(ddof=1)
    z = (z - z.mean()) / z.std(ddof=1)
    return z


def zscore_2d(Y: np.ndarray) -> np.ndarray:
    """Row-wise double z-score of a (num_windows, W) matrix.

    Constant rows produce NaN rows (caller decides null policy) instead of
    raising, since one bad window must not fail a whole Arrow batch.
    """
    Y = np.asarray(Y, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        s = Y.std(axis=1, ddof=1, keepdims=True)
        Z = (Y - Y.mean(axis=1, keepdims=True)) / s
        Z = (Z - Z.mean(axis=1, keepdims=True)) / Z.std(axis=1, ddof=1, keepdims=True)
    return Z


def make_buffer(y: np.ndarray, buffer_size: int) -> np.ndarray:
    """Non-overlapping windows of length ``buffer_size``; trailing partial
    window dropped. This defines the engine's window semantics.

    Parity: pyhctsa ``make_buffer`` (Utilities/utils.py:292-319).
    """
    y = np.asarray(y)
    nwin = len(y) // buffer_size
    return y[: nwin * buffer_size].reshape(nwin, buffer_size)


# ---------------------------------------------------------------------------
# North-star scalar kernels (per 1-D window)
# ---------------------------------------------------------------------------

def mean_(y: np.ndarray) -> float:
    """Arithmetic mean. Parity: DN_Mean 'arithmetic' (Distribution.py:240)."""
    return float(np.mean(y))


def variance(y: np.ndarray) -> float:
    """Sample variance (ddof=1). Parity: DN_Spread 'std' squared
    (Distribution.py:87)."""
    return float(np.var(y, ddof=1))


def spread_std(y: np.ndarray) -> float:
    """Sample std (ddof=1). Parity: DN_Spread 'std' (Distribution.py:87)."""
    return float(np.std(y, ddof=1))


def quantile_hazen(y: np.ndarray, p: float) -> float:
    """Hazen quantile. Parity: DN_Quantile (Distribution.py:102) and the
    ~30 hazen call sites across the reference."""
    return float(np.quantile(np.asarray(y, dtype=np.float64), p, method="hazen"))


def spread_iqr(y: np.ndarray) -> float:
    """Hazen interquartile range. Parity: DN_Spread 'iqr'
    (Distribution.py:88-91)."""
    return quantile_hazen(y, 0.75) - quantile_hazen(y, 0.25)


def spread_mad(y: np.ndarray) -> float:
    """Mean absolute deviation. Parity: DN_Spread 'mad' (Distribution.py:92-94)."""
    y = np.asarray(y, dtype=np.float64)
    return float(np.mean(np.abs(y - y.mean())))


def spread_mead(y: np.ndarray) -> float:
    """Median absolute deviation. Parity: DN_Spread 'mead'
    (Distribution.py:95-97)."""
    y = np.asarray(y, dtype=np.float64)
    return float(np.median(np.abs(y - np.median(y))))


def burstiness(y: np.ndarray) -> dict:
    """Goh–Barabási B and Kim–Jo finite-size B_Kim.

    Parity: DN_Burstiness (Distribution.py:398-438): r = std(ddof=1)/mean,
    B=(r-1)/(r+1); B_Kim = (sqrt(N+1)r - sqrt(N-1)) /
    ((sqrt(N+1)-2)r + sqrt(N-1)).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    mu = y.mean()
    sd = y.std(ddof=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = sd / mu
        b = (r - 1.0) / (r + 1.0)
        bk = (np.sqrt(n + 1) * r - np.sqrt(n - 1)) / (
            (np.sqrt(n + 1) - 2.0) * r + np.sqrt(n - 1)
        )
    return {"B": float(b), "B_Kim": float(bk)}


def autocorr_timedomain(y: np.ndarray, tau: int) -> float:
    """ACF at lag tau, 'TimeDomain' estimator.

    Parity: CO_AutoCorr method='TimeDomain' (Correlation.py:1271-1289):
    mean-centered product of the two lag slices, normalized by their
    population (ddof=0) stds.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if tau >= n:
        return float("nan")
    y1 = y[: n - tau]
    y2 = y[tau:]
    d1 = y1.std(ddof=0)
    d2 = y2.std(ddof=0)
    if d1 == 0.0 or d2 == 0.0:
        return float("nan")
    return float(np.mean((y1 - y1.mean()) * (y2 - y2.mean())) / d1 / d2)


def acf_fourier_full(y: np.ndarray) -> np.ndarray:
    """Full ACF via Wiener–Khinchin with 2^(ceil(log2 N)+1) zero padding,
    normalized by lag 0, truncated to N lags.

    Parity: CO_AutoCorr method='Fourier' (Correlation.py:1241-1259).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    nfft = 2 ** (int(np.ceil(np.log2(n))) + 1)
    f = np.fft.rfft(y - y.mean(), nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)
    if acov[0] == 0.0:
        return np.full(n, np.nan)
    return (acov / acov[0])[:n].real


def autocorr_fourier(y: np.ndarray, tau: int) -> float:
    """ACF at a single lag via the Fourier estimator."""
    acf = acf_fourier_full(y)
    if tau < 0 or tau > len(acf) - 1:
        return float("nan")
    return float(acf[tau])


# ---------------------------------------------------------------------------
# North-star batched kernels over (num_windows, W)
# ---------------------------------------------------------------------------

def mean_2d(Y: np.ndarray) -> np.ndarray:
    return Y.mean(axis=1)


def variance_2d(Y: np.ndarray) -> np.ndarray:
    return Y.var(axis=1, ddof=1)


def std_2d(Y: np.ndarray) -> np.ndarray:
    return Y.std(axis=1, ddof=1)


def iqr_hazen_2d(Y: np.ndarray) -> np.ndarray:
    q = np.quantile(Y, [0.25, 0.75], axis=1, method="hazen")
    return q[1] - q[0]


def burstiness_2d(Y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Goh–Barabási B and Kim–Jo B_Kim per row."""
    n = Y.shape[1]
    mu = Y.mean(axis=1)
    sd = Y.std(axis=1, ddof=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = sd / mu
        b = (r - 1.0) / (r + 1.0)
        bk = (np.sqrt(n + 1) * r - np.sqrt(n - 1)) / (
            (np.sqrt(n + 1) - 2.0) * r + np.sqrt(n - 1)
        )
    return b, bk


def ac_timedomain_2d(Y: np.ndarray, tau: int) -> np.ndarray:
    """Vectorized 'TimeDomain' ACF-at-lag per row of (num_windows, W)."""
    n = Y.shape[1]
    if tau >= n:
        return np.full(Y.shape[0], np.nan)
    y1 = Y[:, : n - tau]
    y2 = Y[:, tau:]
    m1 = y1.mean(axis=1, keepdims=True)
    m2 = y2.mean(axis=1, keepdims=True)
    num = np.mean((y1 - m1) * (y2 - m2), axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / y1.std(axis=1, ddof=0) / y2.std(axis=1, ddof=0)
    return out


def ac_fourier_2d(Y: np.ndarray, taus: list[int]) -> np.ndarray:
    """Vectorized Fourier-estimator ACF at multiple lags.

    Returns array of shape (num_windows, len(taus)). One rfft covers the
    whole Arrow batch (axis=1), matching the reference's padding and
    normalization per window.
    """
    nw, n = Y.shape
    nfft = 2 ** (int(np.ceil(np.log2(n))) + 1)
    F = np.fft.rfft(Y - Y.mean(axis=1, keepdims=True), nfft, axis=1)
    acov = np.fft.irfft(F * np.conj(F), nfft, axis=1)[:, :n]
    a0 = acov[:, 0:1].copy()
    bad = a0[:, 0] == 0.0
    a0[bad, 0] = np.nan
    acf = acov / a0
    out = np.empty((nw, len(taus)))
    for j, t in enumerate(taus):
        out[:, j] = acf[:, t] if 0 <= t < n else np.nan
    return out


# ---------------------------------------------------------------------------
# Wider kernel library (SURVEY.md §2 inventory)
# ---------------------------------------------------------------------------

def trev(y: np.ndarray, tau: int = 1) -> dict:
    """Time-reversal asymmetry. Parity: CO_trev (Correlation.py:1645-1704):
    d = y_{t+tau} - y_t; raw = <d^3>/<d^2>^(3/2); plus abs and num/denom."""
    y = np.asarray(y, dtype=np.float64)
    d = y[tau:] - y[:-tau]
    num = float(np.mean(d**3))
    denom = float(np.mean(d**2) ** 1.5)
    return {
        "raw": num / denom if denom != 0 else float("nan"),
        "abs": abs(num) / denom if denom != 0 else float("nan"),
        "num": num,
        "absnum": abs(num),
        "denom": denom,
    }


def tc3(y: np.ndarray, tau: int = 1) -> dict:
    """Normalized third-order autocovariance. Parity: CO_tc3
    (Correlation.py:1707-1772): <yn·yn1·yn2> / |<yn·yn1>|^(3/2) where
    yn/yn1/yn2 are the TRUNCATED (length N-2tau) lag views — the
    denominator uses the same truncated arrays as the numerator."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if 2 * tau >= n:
        return {"raw": float("nan"), "abs": float("nan"), "num": float("nan"), "absnum": float("nan"), "denom": float("nan")}
    a = y[: n - 2 * tau]
    b = y[tau : n - tau]
    c = y[2 * tau :]
    num = float(np.mean(a * b * c))
    denom = float(np.abs(np.mean(a * b)) ** 1.5)
    return {
        "raw": num / denom if denom != 0 else float("nan"),
        "abs": abs(num) / denom if denom != 0 else float("nan"),
        "num": num,
        "absnum": abs(num),
        "denom": denom,
    }


def theiler_q(y: np.ndarray) -> float:
    """Theiler Q statistic. Parity: DK_theilerQ (Correlation.py:14-46):
    <(x_t + x_{t+1})^3> / <x^2>^(3/2)."""
    y = np.asarray(y, dtype=np.float64)
    s = y[:-1] + y[1:]
    denom = float(np.mean(y**2) ** 1.5)
    return float(np.mean(s**3) / denom) if denom != 0 else float("nan")


def crinkle(y: np.ndarray) -> float:
    """Crinkle statistic. Parity: DK_crinkle (Correlation.py:47-83):
    center y, then <(2y_t - y_{t-1} - y_{t+1})^4> / <y^2>^2."""
    y = np.asarray(y, dtype=np.float64)
    y = y - y.mean()
    d = 2.0 * y[1:-1] - y[:-2] - y[2:]
    denom = float(np.mean(y**2) ** 2)
    return float(np.mean(d**4) / denom) if denom != 0 else float("nan")


def timerev_kaplan(y: np.ndarray, tau: int = 1) -> float:
    """Kaplan time-reversal statistic. Parity: DK_timerev
    (Correlation.py:84-132): 3-point lag embedding (a,b,c) =
    (y_{t+2tau}, y_{t+tau}, y_t); <a^2 b - b c^2>."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    a = y[2 * tau :]
    b = y[tau : n - tau]
    c = y[: n - 2 * tau]
    return float(np.mean(a * a * b - b * c * c))


def std_nth_der(y: np.ndarray, n: int = 1) -> float:
    """Std (ddof=1) of the n-th difference. Parity: SY_StdNthDer
    (Stationarity.py:748-786)."""
    d = np.diff(np.asarray(y, dtype=np.float64), n=n)
    return float(np.std(d, ddof=1))


def moments(y: np.ndarray, k: int) -> float:
    """k-th central moment divided by sample std. Parity: DN_Moments
    (Distribution.py:440-459)."""
    y = np.asarray(y, dtype=np.float64)
    sd = y.std(ddof=1)
    if sd == 0:
        return float("nan")
    return float(np.mean((y - y.mean()) ** k) / sd)


def cv(y: np.ndarray, k: int = 1) -> float:
    """Coefficient of variation^k. Parity: DN_cv (Distribution.py:336-361):
    (std ddof=1 / mean)^k."""
    y = np.asarray(y, dtype=np.float64)
    mu = y.mean()
    if mu == 0:
        return float("nan")
    return float((y.std(ddof=1) / mu) ** k)


def minmax(y: np.ndarray, which: str = "max") -> float:
    """Parity: DN_MinMax (Distribution.py:185-211)."""
    y = np.asarray(y, dtype=np.float64)
    return float(y.max() if which == "max" else y.min())


def proportion_values(y: np.ndarray, which: str = "positive") -> float:
    """Fraction of zeros / positive / >=0 values. Parity:
    DN_ProportionValues (Distribution.py:125-158)."""
    y = np.asarray(y, dtype=np.float64)
    if which == "zeros":
        return float(np.mean(y == 0.0))
    if which == "positive":
        return float(np.mean(y > 0.0))
    if which == "geq0":
        return float(np.mean(y >= 0.0))
    raise ValueError(which)


def high_low_mu(y: np.ndarray) -> float:
    """(mean above mean - mu) / (mu - mean below mean). Parity:
    DN_HighLowMu (Distribution.py:260-284)."""
    y = np.asarray(y, dtype=np.float64)
    mu = y.mean()
    hi = y[y > mu]
    lo = y[y < mu]
    if hi.size == 0 or lo.size == 0:
        return float("nan")
    denom = mu - lo.mean()
    return float((hi.mean() - mu) / denom) if denom != 0 else float("nan")


def withinp(y: np.ndarray, p: float = 1.0, mean_or_median: str = "mean") -> float:
    """Fraction of values within p sigma of the mean (or p*iqr-scaled
    spread of the median). Parity: DN_Withinp (Distribution.py:10-43)."""
    y = np.asarray(y, dtype=np.float64)
    if mean_or_median == "mean":
        mu, sig = y.mean(), y.std(ddof=1)
    else:
        mu, sig = np.median(y), 1.35 * spread_iqr(y)
    return float(np.mean((y >= mu - p * sig) & (y <= mu + p * sig)))


def unique_fraction(y: np.ndarray) -> float:
    """Fraction of distinct values. Parity: DN_Unique (Distribution.py:44-61)."""
    y = np.asarray(y)
    return float(len(np.unique(y)) / len(y))


def trimmed_mean(y: np.ndarray, p_exclude: float = 0.0) -> float:
    """Mean of the middle (100-p)% by value. Parity: DN_TrimmedMean
    (Distribution.py:632-682): excludes p/2 percent from each tail,
    keeping ceil-count semantics of the reference (sorted trim)."""
    y = np.sort(np.asarray(y, dtype=np.float64))
    n = len(y)
    # reference trim count: lowercut = ceil(k - 0.5) of k = n*p/200
    # (round-half-down, NOT banker's rounding)
    k = int(np.ceil(n * p_exclude / 100.0 / 2.0 - 0.5))
    if 2 * k >= n:
        return float("nan")
    return float(y[k : n - k].mean())


def histogram_mode(y: np.ndarray, num_bins: int = 10) -> float:
    """Mode location of an equal-width histogram — the MEAN of the bin
    centers over ALL tied maxima (reference Distribution.py:770:
    mean(binCenters[N == max(N)]), relevant for quantized data).
    Parity: DN_HistogramMode (Distribution.py:741-774)."""
    y = np.asarray(y, dtype=np.float64)
    counts, edges = np.histogram(y, bins=num_bins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return float(np.mean(centers[counts == counts.max()]))


def stat_av(y: np.ndarray, what_type: str = "seg", n: int = 5) -> float:
    """StatAv: std of per-segment means over global std (ddof=1).

    Parity: SY_StatAv (Stationarity.py:838-896). 'seg': n equal segments
    (floor split); 'len': non-overlapping length-n buffers.
    """
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if what_type == "seg":
        # n equal segments of length floor(N/n); trailing remainder dropped
        p = N // n
        if p == 0:
            return float("nan")
        M = y[: p * n].reshape(n, p).mean(axis=1)
    elif what_type == "len":
        if N <= 2 * n:
            return float("nan")
        M = make_buffer(y, n).mean(axis=1)
    else:
        raise ValueError(what_type)
    sd = y.std(ddof=1)
    return float(M.std(ddof=1) / sd) if sd != 0 else float("nan")


def sliding_window(
    y: np.ndarray,
    window_stat: str = "mean",
    across_stat: str = "std",
    num_seg: int = 5,
    inc_move: int = 1,
) -> float:
    """Sliding-window stationarity: compute ``window_stat`` in sliding
    windows (length N//num_seg, increment length//inc_move), then
    ``across_stat`` across windows, normalized by std(y).

    Parity: SY_SlidingWindow (Stationarity.py:897-1006); the reference's
    own rollup loop. SlidingWindow(y,'mean','std',X,1) == StatAv(y,'seg',X).
    """
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    wlen = int(np.floor(N / num_seg))
    if wlen < 2:
        return float("nan")
    inc = max(1, int(np.floor(wlen / inc_move)))
    starts = np.arange(0, N - wlen + 1, inc)
    # Stride-tricks view: every sliding window as a row, no copies.
    W = np.lib.stride_tricks.sliding_window_view(y, wlen)[starts]
    if window_stat == "mean":
        qs = W.mean(axis=1)
    elif window_stat == "std":
        qs = W.std(axis=1, ddof=1)
    elif window_stat == "ent":
        from pyhctsa_spark.functions.entropy import distribution_entropy

        qs = np.array([distribution_entropy(w, "ks", 0) for w in W])
    elif window_stat == "apen":
        from pyhctsa_spark.functions.entropy import approximate_entropy

        qs = np.array([approximate_entropy(w, 1, 0.2) for w in W])
    elif window_stat == "sampen":
        from pyhctsa_spark.functions.entropy import sample_entropy

        qs = np.array([sample_entropy(w, 1, 0.1)["sampen1"] for w in W])
    elif window_stat.startswith("mom"):
        k = int(window_stat[3:])
        qs = np.array([moments(w, k) for w in W])
    elif window_stat == "AC1":
        # reference uses the Fourier estimator inside windows
        qs = ac_fourier_2d(W, [1])[:, 0]
    else:
        raise ValueError(window_stat)
    sdy = y.std(ddof=1)
    if sdy == 0:
        return float("nan")
    if across_stat == "std":
        return float(qs.std(ddof=1) / sdy)
    if across_stat == "apen":
        from pyhctsa_spark.functions.entropy import approximate_entropy

        return approximate_entropy(qs, 1, 0.2)
    if across_stat == "sampen":
        from pyhctsa_spark.functions.entropy import sample_entropy

        return sample_entropy(qs, 2, 0.15)["quadSampEn1"]
    if across_stat == "ent":
        # the reference logs 'not yet implemented' and returns NaN
        return float("nan")
    raise ValueError(across_stat)


def trend(y: np.ndarray) -> dict:
    """Linear-trend stats. Parity: SY_Trend (Stationarity.py:787-837),
    complete: std ratio after linear detrend, OLS fit against the
    MATLAB-style 1..N axis (intercept convention matters), and stats of
    the RAW cumulative sum — its mean/std, its own linear fit, and the
    first/second-half means."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    t = np.arange(1, N + 1, dtype=np.float64)

    def _fit(v: np.ndarray) -> tuple[float, float]:
        tm = t.mean()
        vm = v.mean()
        denom = np.sum((t - tm) ** 2)
        if denom == 0:
            return float("nan"), float("nan")
        slope = float(np.sum((t - tm) * (v - vm)) / denom)
        return slope, float(vm - slope * tm)

    slope, intercept = _fit(y)
    resid = y - (intercept + slope * t)
    sdy = y.std(ddof=1)
    yc = np.cumsum(y)
    slope_c, intercept_c = _fit(yc)
    return {
        "stdRatio": float(resid.std(ddof=1) / sdy) if sdy != 0 else float("nan"),
        "gradient": slope,
        "intercept": intercept,
        "meanYC": float(yc.mean()),
        "stdYC": float(yc.std(ddof=1)),
        "gradientYC": slope_c,
        "interceptYC": intercept_c,
        "meanYC12": float(np.mean(yc[: int(np.floor(N / 2))])),
        "meanYC22": float(np.mean(yc[int(np.floor(N / 2)) :])),
    }


def cid_ce(y: np.ndarray) -> dict:
    """Complexity-invariant distance components. Parity: EN_CID
    (Entropy.py:470-541): CE1 = sqrt(mean(diff^2)),
    CE2 = mean(sqrt(1+diff^2)); each normalized by the same measure on the
    sorted series (minCE)."""
    y = np.asarray(y, dtype=np.float64)
    d = np.diff(y)
    ce1 = float(np.sqrt(np.mean(d**2)))
    ce2 = float(np.mean(np.sqrt(1.0 + d**2)))
    ys = np.sort(y)
    ds = np.diff(ys)
    min_ce1 = float(np.sqrt(np.mean(ds**2)))
    min_ce2 = float(np.mean(np.sqrt(1.0 + ds**2)))
    return {
        "CE1": ce1,
        "CE2": ce2,
        "minCE1": min_ce1,
        "minCE2": min_ce2,
        "CE1_norm": ce1 / min_ce1 if min_ce1 != 0 else float("nan"),
        "CE2_norm": ce2 / min_ce2 if min_ce2 != 0 else float("nan"),
    }


def pnn(y: np.ndarray, threshold: float) -> float:
    """pNNx: fraction of successive differences with |diff| > threshold.
    Parity: MD_pNN (Medical.py:284-337) / pNNx in MD_hrv_classic."""
    y = np.asarray(y, dtype=np.float64)
    return float(np.mean(np.abs(np.diff(y)) > threshold))


def simple_stats(y: np.ndarray, what_stat: str = "zcross") -> float:
    """Parity: SY_SimpleStats (Stationarity.py:271-338), complete:
    'zcross' = proportion of zero crossings of the (assumed z-scored)
    series; 'maxima'/'minima' = proportion of local extrema over N-1;
    'pmcross' = ratio of +1-level to -1-level crossings;
    'zsczcross' = ratio of zero crossings of the linearly-detrended
    z-scored series to the raw z-scored series."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if what_stat == "zcross":
        return float(np.sum(y[:-1] * y[1:] < 0) / N)
    if what_stat == "maxima":
        d = np.diff(y)
        return float(np.sum((d[:-1] > 0) & (d[1:] < 0)) / (N - 1))
    if what_stat == "minima":
        d = np.diff(y)
        return float(np.sum((d[:-1] < 0) & (d[1:] > 0)) / (N - 1))
    if what_stat == "pmcross":
        up = y - 1.0
        dn = y + 1.0
        c1 = float(np.sum(up[:-1] * up[1:] < 0))
        c2 = float(np.sum(dn[:-1] * dn[1:] < 0))
        return float(c1 / c2) if c2 else float("nan")
    if what_stat == "zsczcross":
        z = zscore(y)
        h1 = float(np.sum(z[:-1] * z[1:] < 0))
        t = np.arange(N, dtype=np.float64)
        dz = z - np.polyval(np.polyfit(t, z, 1), t)
        h2 = float(np.sum(dz[:-1] * dz[1:] < 0))
        return float(h2 / h1) if h1 else float("nan")
    raise ValueError(what_stat)


def local_simple(y: np.ndarray, forecast_meth: str = "mean", train_length=4) -> dict:
    """Rolling local forecast residual stats. Parity: FC_LocalSimple
    (ModelFit.py:78-123), complete: forecast each point from the previous
    ``train_length`` points (mean / median / linear fit; 'ac' sets the
    train length to the first ACF zero crossing), residuals are
    prediction - value; outputs mean/std/absmean of residuals, their
    5-segment sliding-window stationarity (sws/swm), Fourier ac1/ac2,
    and the residual-vs-series interpolated ACF-crossing timescales
    (taures, tauresrat)."""
    y = np.asarray(y, dtype=np.float64)
    if train_length == "ac":
        lp = int(first_crossing_ac(y)["firstCrossing"])
    else:
        lp = int(train_length)
    nan_out = {k: float("nan") for k in
               ("meanerr", "stderr", "meanabserr", "sws", "swm", "ac1",
                "ac2", "taures", "tauresrat")}
    if lp < 1 or len(y) <= lp:
        return nan_out
    W = np.lib.stride_tricks.sliding_window_view(y[:-1], lp)
    if forecast_meth == "mean":
        fc = W.mean(axis=1)
    elif forecast_meth == "median":
        fc = np.median(W, axis=1)
    elif forecast_meth == "lfit":
        # linear fit over x = 1..lp, predict at x = lp+1
        t = np.arange(1, lp + 1, dtype=np.float64)
        tm = t.mean()
        denom = np.sum((t - tm) ** 2)
        if denom == 0:
            fc = W.mean(axis=1)
        else:
            slope = (W - W.mean(axis=1, keepdims=True)) @ (t - tm) / denom
            fc = W.mean(axis=1) + slope * (lp + 1 - tm)
    else:
        raise ValueError(forecast_meth)
    res = fc - y[lp:]  # prediction - value (reference convention)
    out = {
        "meanerr": float(np.mean(res)),
        "stderr": float(np.std(res, ddof=1)),
        "meanabserr": float(np.mean(np.abs(res))),
        "sws": sliding_window(res, "std", "std", 5, 1),
        "swm": sliding_window(res, "mean", "std", 5, 1),
        "ac1": autocorr_fourier(res, 1),
        "ac2": autocorr_fourier(res, 2),
    }
    taures = first_crossing_ac(res)["pointOfCrossing"]
    tauy = first_crossing_ac(y)["pointOfCrossing"]
    out["taures"] = float(taures)
    out["tauresrat"] = float(taures / tauy) if tauy else float("nan")
    return out


def glscf(y: np.ndarray, alpha: float, beta: float, tau: int) -> float:
    """Generalized linear self-correlation of |x|^alpha vs |x|^beta at lag
    tau. Parity: CO_glscf (Correlation.py:1153-1208)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if tau >= n:
        return float("nan")
    y1 = np.abs(y[: n - tau])
    y2 = np.abs(y[tau:])
    a1 = y1**alpha
    b2 = y2**beta
    p1 = np.mean(a1 * b2)
    p2 = np.mean(a1) * np.mean(b2)
    p3 = np.sqrt(np.mean(y1 ** (2 * alpha)) - np.mean(a1) ** 2)
    p4 = np.sqrt(np.mean(y2 ** (2 * beta)) - np.mean(b2) ** 2)
    if p3 == 0 or p4 == 0:
        return float("nan")
    return float((p1 - p2) / (p3 * p4))


def fzcglscf(y: np.ndarray, alpha: float, beta: float, max_tau: int | None = None) -> float:
    """First zero crossing of GLSCF(alpha,beta,tau) over tau = 1..maxtau.
    Parity: CO_fzcglscf (Correlation.py:1100-1152): linear interpolation
    between the bracketing taus; maxtau if never crossed."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    max_tau = max_tau or N
    prev = None
    for tau in range(1, max_tau + 1):
        g = glscf(y, alpha, beta, tau)
        if prev is not None and g * prev < 0:
            # the reference's MIRRORED interpolation (Correlation.py:1148:
            # i-1 + g_i/(g_i - g_{i-1}), not the true linear zero at
            # i-1 + g_{i-1}/(g_{i-1} - g_i)) — bug-for-bug parity
            return float(tau - 1 + g / (g - prev))
        prev = g
    return float(max_tau)


def nonlinear_autocorr(
    y: np.ndarray, taus: list[int], do_abs: bool | None = None
) -> float:
    """Higher-order lag-product autocorrelation <x_i prod_j x_{i-tau_j}>.
    Parity: CO_NonlinearAutocorr (Correlation.py:751-804): the product
    starts from the implicit leading x_i factor (y[tmax:N]); do_abs=None
    auto-resolves to True for even-length taus, False for odd (the
    reference's parity rule), and takes |product| BEFORE the mean."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    tmax = int(np.max(taus))
    if tmax >= N:
        return float("nan")
    if do_abs is None:
        do_abs = len(taus) % 2 == 0
    acc = y[tmax:N].copy()
    for t in taus:
        acc = acc * y[tmax - t : N - t]
    return float(np.mean(np.abs(acc))) if do_abs else float(np.mean(acc))


def embed2_basic(y: np.ndarray, tau: int = 1) -> dict:
    """Point-density predicates in the (y_t, y_{t+tau}) embedding.

    Parity: CO_Embed2_Basic (Correlation.py:923-1010), complete: thick
    up/down diagonals (widths 0.1/0.5) + their ratios, concave-up/down
    parabolas at shifts 0/+1/-1, unit rings (widths 0.1/0.2/0.5),
    circles (r^2 thresholds 0.1..3) plus median/std of the circle
    densities — reference output names."""
    y = np.asarray(y, dtype=np.float64)
    xt = y[:-tau]
    xtp = y[tau:]
    n = float(len(xt))
    r2 = xtp**2 + xt**2
    out: dict = {}
    out["updiag01"] = float(np.sum(np.abs(xtp - xt) < 0.1) / n)
    out["updiag05"] = float(np.sum(np.abs(xtp - xt) < 0.5) / n)
    out["downdiag01"] = float(np.sum(np.abs(xtp + xt) < 0.1) / n)
    out["downdiag05"] = float(np.sum(np.abs(xtp + xt) < 0.5) / n)
    with np.errstate(invalid="ignore", divide="ignore"):
        out["ratdiag01"] = float(np.divide(out["updiag01"], out["downdiag01"]))
        out["ratdiag05"] = float(np.divide(out["updiag05"], out["downdiag05"]))
    for w, lbl in ((0.1, "01"), (0.5, "05")):
        out[f"parabup{lbl}"] = float(np.sum(np.abs(xtp - xt**2) < w) / n)
        out[f"parabdown{lbl}"] = float(np.sum(np.abs(xtp + xt**2) < w) / n)
        out[f"parabup{lbl}_1"] = float(np.sum(np.abs(xtp - (xt**2 + 1)) < w) / n)
        out[f"parabdown{lbl}_1"] = float(np.sum(np.abs(xtp + (xt**2 - 1)) < w) / n)
        out[f"parabup{lbl}_n1"] = float(np.sum(np.abs(xtp - (xt**2 - 1)) < w) / n)
        out[f"parabdown{lbl}_n1"] = float(np.sum(np.abs(xtp + (xt**2 + 1)) < w) / n)
    for w, lbl in ((0.1, "01"), (0.2, "02"), (0.5, "05")):
        out[f"ring1_{lbl}"] = float(np.sum(np.abs(r2 - 1.0) < w) / n)
    for rad, lbl in ((0.1, "01"), (0.2, "02"), (0.5, "05"), (1.0, "1"), (2.0, "2"), (3.0, "3")):
        out[f"incircle_{lbl}"] = float(np.sum(r2 < rad) / n)
    circ = np.array([out[f"incircle_{lb}"] for lb in ("01", "02", "05", "1", "2", "3")])
    out["medianincircle"] = float(np.median(circ))
    out["stdincircle"] = float(np.std(circ, ddof=1))
    return out


def perm_entropy(y: np.ndarray, m: int = 3, tau: int = 1) -> float:
    """Normalized permutation entropy of order m, delay tau.

    Parity: EN_PermEn (Entropy.py:309-348): ordinal-pattern frequencies,
    Shannon entropy normalized by log(m!).
    """
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    L = N - (m - 1) * tau
    if L <= 0:
        return float("nan")
    # embed: rows are (y_i, y_{i+tau}, ..., y_{i+(m-1)tau})
    idx = np.arange(L)[:, None] + tau * np.arange(m)[None, :]
    E = y[idx]
    ranks = np.argsort(np.argsort(E, axis=1, kind="stable"), axis=1)
    # hash each ordinal pattern to a single int
    code = (ranks * (m ** np.arange(m))).sum(axis=1)
    _, counts = np.unique(code, return_counts=True)
    p = counts / counts.sum()
    h = -np.sum(p * np.log(p))
    return float(h / np.log(float(math.factorial(m))))


def distribution_entropy_hist(y: np.ndarray, num_bins: int = 10) -> float:
    """EN_DistributionEntropy 'hist' with integer bins (Entropy.py:87-165):
    binpicker 'nice' edges, exact-max catch bin dropped, differential
    form -sum(P*ln(P/binWidth)). Delegates to the reference-faithful
    entropy.distribution_entropy (local import avoids a module cycle)."""
    from pyhctsa_spark.functions.entropy import distribution_entropy

    return distribution_entropy(y, "hist", num_bins)


def point_of_crossing(x: np.ndarray, threshold: float) -> tuple[float, float]:
    """First crossing index and linearly-interpolated crossing point
    (one-indexed). Parity: pointOfCrossing (Utilities/utils.py:242-281)."""
    x = np.asarray(x, dtype=np.float64)
    if x[0] > threshold:
        idx = np.flatnonzero(x < threshold)
    else:
        idx = np.flatnonzero(x > threshold)
    if idx.size == 0:
        n = float(len(x))
        return n, n
    i = int(idx[0])
    before, after = x[i - 1], x[i]
    interp = i - 1 + (threshold - before) / (after - before)
    return float(i + 1), float(interp + 1)


def first_crossing_ac(y: np.ndarray, threshold: float = 0.0) -> dict:
    """First crossing of the (Fourier) ACF through ``threshold``.

    Parity: CO_FirstCrossing (Correlation.py:1296-1343) with corrFun='ac':
    full Fourier ACF then pointOfCrossing; returns both the discrete and
    interpolated crossing (zero-based lag units, i.e. one-indexed
    positions minus 1 as in the reference output).
    """
    acf = acf_fourier_full(y)
    first, interp = point_of_crossing(acf, threshold)
    return {"firstCrossing": first - 1.0, "pointOfCrossing": interp - 1.0}


def first_min_ac(y: np.ndarray, max_tau: int | None = None) -> float:
    """Lag of the first local minimum of the ACF. Parity: CO_FirstMin
    'ac' branch (Information.py:11-89)."""
    acf = acf_fourier_full(y)
    n = len(acf)
    max_tau = min(max_tau or n - 1, n - 2)
    for t in range(1, max_tau + 1):
        if acf[t] < acf[t - 1] and acf[t] < acf[t + 1]:
            return float(t)
    return float(max_tau + 1)


def motif_two(y: np.ndarray, binarize_how: str = "diff") -> dict:
    """Binary motif probabilities/entropies for words of length 1-4.

    Parity: SB_MotifTwo (Symbolic.py:138-295), complete: binarize by
    'diff' (stepBinary of successive change, utils.py:396-398), 'mean',
    or 'median'; word names use d=0, u=1 most-significant-first
    ('uud' = 110). Word-length-k probabilities are normalized by N-k+1
    (the reference's shrinking logical-and masks keep full length N-k+1
    per word start); entropies are -sum p ln p over nonzero probs
    (_f_entropy, Symbolic.py:396-398). Series with binarized length < 5
    raise (the reference returns NaN; the registry maps errors to NaN).
    """
    y = np.asarray(y, dtype=np.float64)
    if binarize_how == "diff":
        b = (np.diff(y) > 0).astype(np.int64)
    elif binarize_how == "mean":
        b = (y > y.mean()).astype(np.int64)
    elif binarize_how == "median":
        b = (y > np.median(y)).astype(np.int64)
    else:
        raise ValueError(binarize_how)
    n = len(b)
    if n < 5:
        raise ValueError("time series too short for SB_MotifTwo")

    def _h(ps: np.ndarray) -> float:
        nz = ps[ps > 0]
        return float(-np.sum(nz * np.log(nz)))

    out = {}
    p1 = float(np.mean(b))
    out["u"] = p1
    out["d"] = 1.0 - p1
    out["h"] = _h(np.array([1.0 - p1, p1]))
    # length-2..4 words: base-2 codes, names d=0 / u=1, MSB first
    codes = b.copy()
    for k, hname in ((2, "hh"), (3, "hhh"), (4, "hhhh")):
        codes = codes[:-1] * 2 + b[k - 1 :]
        probs = np.bincount(codes, minlength=2**k) / (n - k + 1)
        for i in range(2**k):
            name = format(i, f"0{k}b").replace("0", "d").replace("1", "u")
            out[name] = float(probs[i])
        out[hname] = _h(probs)
    return out


def binary_stats(y: np.ndarray, binarize_how: str = "diff") -> dict:
    """Run-length statistics of the binarized series.

    Parity: SB_BinaryStats (Symbolic.py:458-540), complete: stepBinary
    binarization ('diff': diff > 0; 'mean'/'median': above; 'iqr':
    inside the hazen interquartile range), second-half/first-half ones
    ratio (pupstat2), stretch counts/extremes/means/stds raw and /N
    (the reference's empty-stretch1 branch omits stdstretch1norm —
    surfaced as NaN by the registry — and its diff-binarized N is
    len(y)-1; both preserved).
    """
    y = np.asarray(y, dtype=np.float64)
    if binarize_how == "diff":
        b = (np.diff(y) > 0).astype(np.int8)
    elif binarize_how == "mean":
        b = (y > y.mean()).astype(np.int8)
    elif binarize_how == "median":
        b = (y > np.median(y)).astype(np.int8)
    elif binarize_how == "iqr":
        lo, hi = quantile_hazen(y, 0.25), quantile_hazen(y, 0.75)
        b = ((y > lo) & (y < hi)).astype(np.int8)
    else:
        raise ValueError(binarize_how)
    N = len(b)
    out: dict = {}
    first_ones = float(np.sum(b[: N // 2] == 1))
    second_ones = float(np.sum(b[N // 2 :] == 1))
    with np.errstate(invalid="ignore", divide="ignore"):
        out["pupstat2"] = float(np.divide(second_ones, first_ones))
    # run lengths via the reference's padded-index-gap trick
    d0 = np.diff(np.flatnonzero(np.concatenate(([1], b, [1]))))
    stretch0 = d0[d0 != 1] - 1
    d1 = np.diff(np.flatnonzero(np.concatenate(([0], b, [0])) == 0))
    stretch1 = d1[d1 != 1] - 1
    out["pstretch1"] = float(len(stretch1) / N)
    if len(stretch0) == 0:
        out["longstretch0"] = 0.0
        out["longstretch0norm"] = 0.0
        out["meanstretch0"] = 0.0
        out["meanstretch0norm"] = 0.0
        out["stdstretch0"] = float("nan")
        out["stdstretch0norm"] = float("nan")
    else:
        out["longstretch0"] = float(stretch0.max())
        out["longstretch0norm"] = float(stretch0.max() / N)
        out["meanstretch0"] = float(stretch0.mean())
        out["meanstretch0norm"] = float(stretch0.mean() / N)
        out["stdstretch0"] = float(np.std(stretch0, ddof=1))
        out["stdstretch0norm"] = float(np.std(stretch0, ddof=1) / N)
    if len(stretch1) == 0:
        out["longstretch1"] = 0.0
        out["longstretch1norm"] = 0.0
        out["meanstretch1"] = 0.0
        out["meanstretch1norm"] = 0.0
        out["stdstretch1"] = float("nan")
        # reference omits stdstretch1norm here (bug-for-bug)
    else:
        out["longstretch1"] = float(stretch1.max())
        out["longstretch1norm"] = float(stretch1.max() / N)
        out["meanstretch1"] = float(stretch1.mean())
        out["meanstretch1norm"] = float(stretch1.mean() / N)
        out["stdstretch1"] = float(np.std(stretch1, ddof=1))
        out["stdstretch1norm"] = float(np.std(stretch1, ddof=1) / N)
    out["meanstretchdiff"] = (out["meanstretch1"] - out["meanstretch0"]) / N
    out["stdstretchdiff"] = (out["stdstretch1"] - out["stdstretch0"]) / N
    with np.errstate(invalid="ignore"):
        out["diff21stretch1"] = (
            float(np.mean(stretch1 == 2) - np.mean(stretch1 == 1))
            if len(stretch1) else float("nan")
        )
        out["diff21stretch0"] = (
            float(np.mean(stretch0 == 2) - np.mean(stretch0 == 1))
            if len(stretch0) else float("nan")
        )
    return out


def rad(y: np.ndarray, tau: int = 2, centre: bool = True) -> float:
    """Rescaled auto-density criticality measure. Parity: CR_RAD
    (Criticality.py:6-66): centre (|y - median|), lag-embed at tau,
    median-split the LAGGED VALUES x=|y|[:-tau] (sub: x < med); the
    density difference is 1/std(x_super) - 1/std(x_sub) of the x VALUES
    themselves, scaled by std of the tau-differences."""
    y = np.asarray(y, dtype=np.float64)
    if centre:
        y = np.abs(y - np.median(y))
    x = y[:-tau]
    d = y[tau:] - x
    med = np.median(x)
    sub = x < med
    x_super = x[~sub]
    x_sub = x[sub]
    if x_super.size < 2 or x_sub.size < 2:
        return float("nan")
    s_super = x_super.std(ddof=1)
    s_sub = x_sub.std(ddof=1)
    if s_super == 0 or s_sub == 0:
        return float("nan")
    return float(d.std(ddof=1) * (1.0 / s_super - 1.0 / s_sub))


def custom_skewness(y: np.ndarray, which: str = "pearson") -> float:
    """Pearson ((3·mean − median)/std — the reference's formula, NOT the
    textbook 3(mean−median)/std) or Bowley quartile skewness.
    Parity: DN_CustomSkewness (Distribution.py:362-397)."""
    y = np.asarray(y, dtype=np.float64)
    if which == "pearson":
        sd = y.std(ddof=1)
        return float((3.0 * y.mean() - np.median(y)) / sd) if sd != 0 else float("nan")
    if which == "bowley":
        q1, q2, q3 = (quantile_hazen(y, p) for p in (0.25, 0.5, 0.75))
        denom = q3 - q1
        return float((q3 + q1 - 2 * q2) / denom) if denom != 0 else float("nan")
    raise ValueError(which)


def fit_polynomial(y: np.ndarray, k: int = 1) -> float:
    """MEAN SQUARED error of a degree-k polynomial fit vs t = 1..N
    (the reference docstring says RMS but the code returns MSE —
    bug-for-bug parity keeps MSE). Parity: SY_FitPolynomial
    (Stationarity.py:702-731)."""
    y = np.asarray(y, dtype=np.float64)
    t = np.arange(1, len(y) + 1, dtype=np.float64)
    coef = np.polyfit(t, y, k)
    resid = y - np.polyval(coef, t)
    return float(np.mean(resid**2))


def local_global(y: np.ndarray, subset: str = "l", n: int | float | None = None) -> dict:
    """Stats of a local subset vs. the global series.

    Parity: SY_LocalGlobal (Stationarity.py:634-701), complete:
    'l' first n points (default 100), 'p' initial proportion (default
    0.1), 'unicg' n evenly spaced points; raw |mean| / std(ddof=1) /
    median of the subset, plus |1 - local/global| comparisons of hazen
    IQR, biased skewness, Pearson kurtosis, and lag-1 Fourier ACF.
    Subsets shorter than 5 points return NaNs (the reference returns a
    bare NaN)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if n is None:
        n = 0.1 if subset == "p" else 100
    if subset == "l":
        r = y[: min(int(n), N)]
    elif subset == "p":
        frac = float(n)
        r = y[: int(np.floor(N * frac))]
    elif subset == "unicg":
        r = y[np.round(np.linspace(1, N, int(n))).astype(int) - 1]
    else:
        raise ValueError(subset)
    keys = ("absmean", "std", "median", "iqr", "skewness", "kurtosis", "ac1")
    if len(r) < 5:
        return {k: float("nan") for k in keys}

    def _skew(v):
        c = v - v.mean()
        m2 = np.mean(c**2)
        return np.mean(c**3) / m2**1.5 if m2 > 0 else float("nan")

    def _kurt(v):
        c = v - v.mean()
        m2 = np.mean(c**2)
        return np.mean(c**4) / m2**2 if m2 > 0 else float("nan")

    with np.errstate(invalid="ignore", divide="ignore"):
        out = {
            "absmean": float(np.abs(r.mean())),
            "std": float(r.std(ddof=1)),
            "median": float(np.median(r)),
            "iqr": float(np.abs(1.0 - spread_iqr(r) / spread_iqr(y))),
            "skewness": float(np.abs(1.0 - _skew(r) / _skew(y))),
            "kurtosis": float(np.abs(1.0 - _kurt(r) / _kurt(y))),
            "ac1": float(
                np.abs(1.0 - autocorr_fourier(r, 1) / autocorr_fourier(y, 1))
            ),
        }
    return out


def range_evolve(y: np.ndarray) -> dict:
    """Cumulative-range growth statistics. Parity: SY_RangeEvolve
    (Stationarity.py:491-549), complete: cums[i] = ptp(y[:i+1]); counts
    of unique cumulative-range values reached within the first
    1/10/20/50 % (nuqp*) and first 10/50/100/1000 points (nuql*) as
    fractions of the total unique count, plus the fraction of the full
    range captured at those same cut points (p*, l*).

    Documented deviation: for N < Nval the reference's Python emits a
    series-length-dependent key ``nuql{N}`` (Stationarity.py:536 — an
    f-string typo for the clearly intended ``nuql{Nval}``); the engine
    emits the intended fixed key (= NaN) so the feature schema is stable
    across series lengths, which a columnar engine requires.
    """
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    run_max = np.maximum.accumulate(y)
    run_min = np.minimum.accumulate(y)
    cums = run_max - run_min
    fullr = float(np.ptp(y))

    def lunique(x: np.ndarray) -> int:
        return len(np.unique(x))

    out: dict = {}
    out["totnuq"] = float(lunique(cums))

    def cumtox(frac: float) -> float:
        return lunique(cums[: int(np.floor(N * frac))]) / out["totnuq"]

    out["nuqp1"] = cumtox(0.01)
    out["nuqp10"] = cumtox(0.1)
    out["nuqp20"] = cumtox(0.2)
    out["nuqp50"] = cumtox(0.5)
    lengths = [10, 50, 100, 1000]
    for nval in lengths:
        if N >= nval:
            out[f"nuql{nval}"] = lunique(cums[:nval]) / out["totnuq"]
        else:
            out[f"nuql{nval}"] = float("nan")
    for pct, frac in (("p1", 0.01), ("p10", 0.1), ("p20", 0.2), ("p50", 0.5)):
        out[pct] = float(cums[int(np.ceil(N * frac)) - 1] / fullr) if fullr > 0 else float("nan")
    for nval in lengths:
        if N >= nval:
            out[f"l{nval}"] = float(cums[nval - 1] / fullr) if fullr > 0 else float("nan")
        else:
            out[f"l{nval}"] = float("nan")
    return out


def drifting_mean(y: np.ndarray, how: str = "fix", seg_len: int = 20) -> dict:
    """Segment-mean drift vs segment variance. Parity: SY_DriftingMean
    (Stationarity.py:551-633): split into length-l ('fix') or l-count
    ('num') segments; max/min/mean of segment means over mean segment
    variance, then meanmaxmin = (max+min)/2 and meanabsmaxmin =
    (|max|+|min|)/2 of those ALREADY-normalized values."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    l = seg_len if how == "fix" else N // seg_len
    nan_out = {"max": float("nan"), "min": float("nan"), "mean": float("nan"),
               "meanmaxmin": float("nan"), "meanabsmaxmin": float("nan")}
    if l <= 1 or l > N:
        return nan_out
    nseg = N // l
    Z = y[: nseg * l].reshape(nseg, l)
    mus = Z.mean(axis=1)
    vars_ = Z.var(axis=1, ddof=1)
    vbar = vars_.mean()
    if vbar == 0:
        return nan_out
    out = {
        "max": float(mus.max() / vbar),
        "min": float(mus.min() / vbar),
        "mean": float(mus.mean() / vbar),
    }
    out["meanmaxmin"] = (out["max"] + out["min"]) / 2.0
    out["meanabsmaxmin"] = (abs(out["max"]) + abs(out["min"])) / 2.0
    return out


def dyn_win_basic(y: np.ndarray, max_nseg: int = 10) -> float:
    """Across-scale stationarity sweep (mean-stat subset of SY_DynWin,
    Stationarity.py:88-168): StatAv('seg', n) for n = 2..max_nseg, report
    std across scales."""
    vals = np.array([stat_av(y, "seg", n) for n in range(2, max_nseg + 1)])
    vals = vals[np.isfinite(vals)]
    return float(vals.std(ddof=1)) if vals.size > 1 else float("nan")


def moment_corr(
    y: np.ndarray,
    window_length: float | int | None = None,
    w_overlap: float | int | None = None,
    stat1: str = "mean",
    stat2: str = "std",
    what_transform: str = "none",
) -> dict:
    """Correlation between two window statistics across buffered windows.

    Parity: SY_MomentCorr (Stationarity.py:169-270), complete:
    windowLength = ceil(0.02*N) (fractional input scales by N),
    wOverlap = floor(windowLength/5); windows from MATLAB
    buffer(x, wl, p) semantics INCLUDING the p leading zeros in column
    0 and the zero-padded tail column (dropped when the column count
    exceeds N/(wl-p)); outputs absR and density = ptp(M1)*ptp(M2)/N.
    Where the reference raises on 1-point windows the engine returns
    NaNs (schema stability for the columnar path).
    """
    from pyhctsa_spark.functions.spectral import matlab_buffer

    x = np.asarray(y, dtype=np.float64)
    N = len(x)
    wl = 0.02 if window_length is None else window_length
    if wl < 1:
        wl = int(np.ceil(N * wl))
    wl = int(wl)
    ov = 1.0 / 5.0 if w_overlap is None else w_overlap
    if ov < 1:
        ov = int(np.floor(wl * ov))
    ov = int(ov)
    if what_transform == "abs":
        x = np.abs(x)
    elif what_transform == "sq":
        x = x**2
    elif what_transform == "sqrt":
        x = np.sqrt(np.abs(x))
    elif what_transform != "none":
        raise ValueError(what_transform)
    nan_out = {"absR": float("nan"), "density": float("nan")}
    if wl <= ov or wl < 1:
        return nan_out
    buff = matlab_buffer(x, wl, ov)
    num_windows = N / (wl - ov)
    if buff.shape[1] > num_windows:
        buff = buff[:, :-1]
    if buff.shape[0] == 1 or buff.shape[1] < 2:
        return nan_out  # reference raises "too short" here

    def _stat(name):
        if name == "mean":
            return buff.mean(axis=0)
        if name == "std":
            return buff.std(axis=0, ddof=1)
        if name == "median":
            return np.median(buff, axis=0)
        if name == "iqr":
            q = np.percentile(buff, [75, 25], axis=0, method="hazen")
            return q[0] - q[1]
        raise ValueError(name)

    m1, m2 = _stat(stat1), _stat(stat2)
    with np.errstate(all="ignore"):
        r = float(np.corrcoef(m1, m2)[0, 1])
    return {
        "absR": abs(r),
        "density": float(np.ptp(m1) * np.ptp(m2) / N),
    }
