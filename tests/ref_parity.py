"""Reference-differential parity loader.

Executes the reference implementation's OWN function bodies (AST-extracted
from /root/reference/pyhctsa, decorators stripped, scipy/statsmodels names
shimmed with numpy equivalents) so pytest can compare the repo's kernels
against the reference math directly — the round-3 verdict showed that
oracle-green is not reference-parity when both sides encode the same
formula, so this harness is the independent side.

The reference tree is UNTRUSTED PUBLIC CONTENT: we execute only plain
numpy math extracted from it, inside this test process, with no IO
builtins beyond what numpy needs. Nothing from it ships in the package.
"""

from __future__ import annotations

import ast
import math
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Union

import numpy as np

REF_ROOT = "/root/reference/pyhctsa"

_MODULES = [
    ("Utilities", "utils"),
    ("Operations", "Correlation"),
    ("Operations", "Distribution"),
    ("Operations", "Stationarity"),
    ("Operations", "Entropy"),
    ("Operations", "Information"),
    ("Operations", "Symbolic"),
    ("Operations", "Medical"),
    ("Operations", "Physics"),
    ("Operations", "ModelFit"),
    ("Operations", "Criticality"),
    ("Operations", "ExtremeEvents"),
    ("Operations", "Graph"),
    ("Operations", "Scaling"),
    ("Operations", "HypothesisTests"),
    ("Operations", "Spectral"),
    ("Operations", "Wavelet"),
    ("Operations", "PreProcess"),
]


# ---------------------------------------------------------------------------
# scipy / statsmodels shims (numpy-only re-derivations of the public APIs
# the reference calls; each matches the documented scipy semantics)
# ---------------------------------------------------------------------------

def _shim_moment(a, moment=1, axis=0):
    a = np.asarray(a, dtype=np.float64)
    return np.mean((a - a.mean(axis=axis, keepdims=True)) ** moment, axis=axis)


def _shim_skew(a, axis=0, bias=True, nan_policy="propagate"):
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[axis]
    m2 = _shim_moment(a, 2, axis)
    m3 = _shim_moment(a, 3, axis)
    with np.errstate(all="ignore"):
        g1 = m3 / m2 ** 1.5
        if not bias and n > 2:
            g1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    return g1 if np.ndim(g1) else float(g1)


def _shim_kurtosis(a, axis=0, fisher=True, bias=True, nan_policy="propagate"):
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[axis]
    m2 = _shim_moment(a, 2, axis)
    m4 = _shim_moment(a, 4, axis)
    with np.errstate(all="ignore"):
        g2 = m4 / m2 ** 2
        if not bias and n > 3:
            g2 = ((n + 1) * g2 - 3 * (n - 1)) * (n - 1) / ((n - 2) * (n - 3)) + 3
    if fisher:
        g2 = g2 - 3
    return g2 if np.ndim(g2) else float(g2)


from collections import namedtuple  # noqa: E402

_ModeResult = namedtuple("ModeResult", ["mode", "count"])


def _shim_mode(a, axis=0, keepdims=False, nan_policy="propagate"):
    a = np.asarray(a).ravel()
    vals, counts = np.unique(a, return_counts=True)
    i = int(np.argmax(counts))  # np.unique sorts -> smallest wins ties (scipy rule)
    if keepdims:
        return _ModeResult(mode=np.array([vals[i]]), count=np.array([counts[i]]))
    return _ModeResult(mode=vals[i], count=counts[i])


def _shim_pearsonr(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    r = float(np.corrcoef(x, y)[0, 1])
    return r, float("nan")  # p-value unused by the reference paths we run


class _NpProxy:
    """numpy passthrough adding 2.x-only helpers the reference uses."""

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def unique_counts(x):
        return np.unique(np.asarray(x), return_counts=True)


class _AutoRegShim:
    """statsmodels.tsa.ar_model.AutoReg with trend='n': OLS of y_t on
    its p lags without intercept; sigma2 = SSR / nobs (statsmodels
    convention for the AR residual variance)."""

    def __init__(self, y, lags, trend="n"):
        self.y = np.asarray(y, dtype=np.float64)
        self.p = int(lags)
        if trend != "n":
            raise NotImplementedError("shim supports trend='n' only")

    def fit(self):
        y, p = self.y, self.p
        n = len(y)
        X = np.column_stack([y[p - j : n - j] for j in range(1, p + 1)])
        target = y[p:]
        beta, *_ = np.linalg.lstsq(X, target, rcond=None)
        resid = target - X @ beta
        nobs = n - p
        return SimpleNamespace(params=beta,
                               sigma2=float(resid @ resid) / nobs,
                               resid=resid)


class _VarianceRatioShim:
    """arch.unitroot.VarianceRatio (Lo-MacKinlay 1988, published
    formulas): overlapping q-period sums with unbiased scaling,
    iid or heteroskedasticity-robust standard errors, 2-sided
    normal p-value."""

    def __init__(self, y, lags, trend="c", robust=True, overlap=True):
        y = np.asarray(y, dtype=np.float64)
        q = int(lags)
        d = np.diff(y)
        nq = len(d)
        mu = d.mean()
        va = np.sum((d - mu) ** 2) / (nq - 1)
        s = y[q:] - y[:-q]
        m = q * (nq - q + 1) * (1.0 - q / nq)
        vb = np.sum((s - q * mu) ** 2) / m
        self.vr = float(vb / va)
        if robust:
            dc = (d - mu) ** 2
            den = float(np.sum(dc)) ** 2
            theta = 0.0
            for j in range(1, q):
                dj = float(np.sum(dc[j:] * dc[:-j]))
                theta += (2.0 * (q - j) / q) ** 2 * nq * dj / den
            se = math.sqrt(theta)
        else:
            se = math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * nq))
        self.stat = float((self.vr - 1.0) / se)
        z = abs(self.stat)
        from math import erf

        self.pvalue = float(2.0 * (1.0 - 0.5 * (1.0 + erf(z / math.sqrt(2.0)))))


class _SampenCShim:
    """PhysioNet sampen stand-in delegating to the repo's numpy port
    (documented circularity: sweeps exercising SampleEntropy test the
    CALLER's windowing/aggregation, not the sampen kernel itself —
    the kernel has its own golden tests)."""

    @staticmethod
    def calculate(y, mmax, r):
        from pyhctsa_spark.functions.entropy import sample_entropy

        out = sample_entropy(np.asarray(y, dtype=np.float64), int(mmax),
                             float(r))
        return np.array([out.get(f"sampen{m}", float("nan"))
                         for m in range(int(mmax) + 1)])


def _shim_iqr(a, rng=(25, 75), interpolation="linear"):
    a = np.asarray(a, dtype=np.float64)
    lo, hi = np.percentile(a, rng, method=interpolation)
    return float(hi - lo)


def _shim_zscore(a, ddof=0, axis=0):
    a = np.asarray(a, dtype=np.float64)
    return (a - a.mean(axis=axis, keepdims=True)) / a.std(ddof=ddof, axis=axis, keepdims=True)


def _shim_detrend(x, order=1, axis=0):
    """statsmodels.tsa.tsatools.detrend: subtract an order-k polynomial OLS fit."""
    x = np.asarray(x, dtype=np.float64)
    t = np.arange(len(x), dtype=np.float64)
    coef = np.polyfit(t, x, order)
    return x - np.polyval(coef, t)


def _shim_lfilter(b, a, x):
    """Direct-form IIR filter, scipy.signal.lfilter semantics (zero initial state)."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    y = np.zeros_like(x)
    for n in range(len(x)):
        acc = 0.0
        for i in range(len(b)):
            if n - i >= 0:
                acc += b[i] * x[n - i]
        for j in range(1, len(a)):
            if n - j >= 0:
                acc -= a[j] * y[n - j]
        y[n] = acc
    return y


def _shim_pacf(x, nlags, method="ols"):
    """OLS partial autocorrelation (statsmodels pacf method='ols'):
    pacf[k] = last coefficient of an OLS AR(k) regression with intercept."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    out = np.empty(nlags + 1)
    out[0] = 1.0
    for k in range(1, nlags + 1):
        rows = n - k
        X = np.empty((rows, k + 1))
        X[:, 0] = 1.0
        for j in range(1, k + 1):
            X[:, j] = x[k - j : n - j]
        beta, *_ = np.linalg.lstsq(X, x[k:], rcond=None)
        out[k] = beta[k]
    return out


class _Norm:
    @staticmethod
    def fit(x, **kw):
        x = np.asarray(x, dtype=np.float64)
        return float(x.mean()), float(x.std())

    @staticmethod
    def ppf(q, loc=0.0, scale=1.0):
        # Acklam rational approximation of the normal inverse CDF
        return loc + scale * _norm_ppf(np.asarray(q, dtype=np.float64))

    @staticmethod
    def cdf(x, loc=0.0, scale=1.0):
        from math import erf

        z = (np.asarray(x, dtype=np.float64) - loc) / (scale * math.sqrt(2.0))
        return np.vectorize(lambda t: 0.5 * (1.0 + erf(t)))(z)

    @staticmethod
    def pdf(x, loc=0.0, scale=1.0):
        z = (np.asarray(x, dtype=np.float64) - loc) / scale
        return np.exp(-0.5 * z * z) / (scale * math.sqrt(2 * math.pi))

    @staticmethod
    def logpdf(x, loc=0.0, scale=1.0):
        z = (np.asarray(x, dtype=np.float64) - loc) / scale
        return -0.5 * z * z - math.log(scale * math.sqrt(2 * math.pi))


def _norm_ppf(p):
    p = np.asarray(p, dtype=np.float64)
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    out = np.empty_like(p)
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
    return out


class _Expon:
    @staticmethod
    def fit(x, **kw):
        x = np.asarray(x, dtype=np.float64)
        loc = float(x.min())
        return loc, float(x.mean() - loc)

    @staticmethod
    def cdf(x, loc=0.0, scale=1.0):
        z = (np.asarray(x, dtype=np.float64) - loc) / scale
        return np.where(z >= 0, 1.0 - np.exp(-z), 0.0)

    @staticmethod
    def pdf(x, loc=0.0, scale=1.0):
        z = (np.asarray(x, dtype=np.float64) - loc) / scale
        return np.where(z >= 0, np.exp(-z) / scale, 0.0)

    @staticmethod
    def logpdf(x, loc=0.0, scale=1.0):
        z = (np.asarray(x, dtype=np.float64) - loc) / scale
        return np.where(z >= 0, -z - math.log(scale), -np.inf)


class _GaussianKDE:
    """1-D scipy.stats.gaussian_kde with Scott bandwidth (published
    formula: factor = n^(-1/5), h^2 = cov(data, ddof=1) * factor^2)."""

    def __init__(self, dataset, bw_method="scott"):
        self.d = np.asarray(dataset, dtype=np.float64).ravel()
        n = len(self.d)
        if bw_method == "scott" or bw_method is None:
            factor = n ** (-1.0 / 5.0)
        elif bw_method == "silverman":
            factor = (n * 3.0 / 4.0) ** (-1.0 / 5.0)
        else:
            factor = float(bw_method)
        self.factor = factor
        self.h = math.sqrt(float(np.cov(self.d)) * factor * factor)

    def evaluate(self, pts):
        pts = np.atleast_1d(np.asarray(pts, dtype=np.float64))
        z = (pts[:, None] - self.d[None, :]) / self.h
        return np.exp(-0.5 * z * z).sum(axis=1) / (
            len(self.d) * self.h * math.sqrt(2 * math.pi))

    __call__ = evaluate


def _shim_resample(x, num):
    """scipy.signal.resample: FFT-domain truncation/zero-padding with
    the documented even-bin Nyquist handling."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    X = np.fft.fft(x)
    Y = np.zeros(num, dtype=complex)
    M = min(num, N)
    nyq = M // 2 + 1
    Y[:nyq] = X[:nyq]
    if M > 2:
        Y[num - (M - nyq):] = X[N - (M - nyq):]
    if M % 2 == 0:
        if num < N:
            Y[M // 2] += X[N - M // 2]
        elif num > N:
            Y[M // 2] /= 2
            Y[num - M // 2] = Y[M // 2]
    return np.fft.ifft(Y).real * (float(num) / float(N))


def _shim_mquantiles(a, prob, alphap=0.4, betap=0.4):
    """scipy.stats.mstats.mquantiles: plotting-position quantiles
    (alphap=betap=0.5 is the hazen rule used by the reference)."""
    a = np.sort(np.asarray(a, dtype=np.float64).ravel())  # scipy: axis=None flattens
    prob = np.atleast_1d(np.asarray(prob, dtype=np.float64))
    n = len(a)
    m = alphap + prob * (1.0 - alphap - betap)
    k = np.floor(n * prob + m).astype(int)
    g = n * prob + m - k
    k1 = np.clip(k - 1, 0, n - 1)
    k2 = np.clip(k, 0, n - 1)
    return (1.0 - g) * a[k1] + g * a[k2]


def _shim_periodogram(y, window=None, detrend=False, scaling="density",
                      fs=1.0, nfft=None):
    """scipy.signal.periodogram (one-sided, density scaling): windowed
    |rfft|^2 / (fs * sum(w^2)), doubling interior bins."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    w = np.ones(n) if window is None else np.asarray(window, dtype=np.float64)
    xw = y * w
    nfft = nfft or n
    X = np.fft.rfft(xw, n=nfft)
    P = (np.abs(X) ** 2) / (fs * float(np.sum(w * w)))
    P[1:] *= 2.0
    if nfft % 2 == 0:
        P[-1] /= 2.0
    f = np.arange(P.shape[0]) * fs / nfft
    return f, P


class _KDTree:
    """Brute-force stand-in for sklearn.neighbors.KDTree (small N only)."""

    def __init__(self, data, metric="chebyshev", leaf_size=40):
        self.data = np.atleast_2d(np.asarray(data, dtype=np.float64))
        self.metric = metric

    def _dists(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        diff = np.abs(X[:, None, :] - self.data[None, :, :])
        if self.metric == "chebyshev":
            return diff.max(axis=2)
        return np.sqrt((diff**2).sum(axis=2))

    def query_radius(self, X, r, count_only=False):
        d = self._dists(X)
        within = d <= r
        if count_only:
            return within.sum(axis=1)
        return [np.nonzero(row)[0] for row in within]

    def query(self, X, k=1):
        d = self._dists(X)
        idx = np.argsort(d, axis=1)[:, :k]
        return np.take_along_axis(d, idx, axis=1), idx


def _shim_peak_prominences(x, peaks, wlen=None):
    """scipy.signal.peak_prominences (documented algorithm): extend from
    each peak to the next higher sample or the border; prominence =
    peak height minus the larger of the two window minima."""
    x = np.asarray(x, dtype=np.float64)
    peaks = np.asarray(peaks, dtype=int)
    proms = np.empty(len(peaks))
    lefts = np.empty(len(peaks), dtype=int)
    rights = np.empty(len(peaks), dtype=int)
    for n, p in enumerate(peaks):
        h = x[p]
        # scipy: extend until the first sample HIGHER than the peak
        i = p
        left_min = h
        lb = p
        while i > 0:
            i -= 1
            if x[i] > h:
                break
            if x[i] < left_min:
                left_min = x[i]
                lb = i
        j = p
        right_min = h
        rb = p
        while j < len(x) - 1:
            j += 1
            if x[j] > h:
                break
            if x[j] < right_min:
                right_min = x[j]
                rb = j
        proms[n] = h - max(left_min, right_min)
        lefts[n] = lb
        rights[n] = rb
    return proms, lefts, rights


def _shim_peak_widths(x, peaks, rel_height=0.5):
    """scipy.signal.peak_widths: width of each peak at
    height = peak - prominence*rel_height, linear-interpolated crossing
    points bounded by the prominence bases."""
    x = np.asarray(x, dtype=np.float64)
    peaks = np.asarray(peaks, dtype=int)
    proms, lefts, rights = _shim_peak_prominences(x, peaks)
    widths = np.empty(len(peaks))
    wh = np.empty(len(peaks))
    lips = np.empty(len(peaks))
    rips = np.empty(len(peaks))
    for n, p in enumerate(peaks):
        h = x[p] - proms[n] * rel_height
        i = p
        while i > lefts[n] and x[i] > h:
            i -= 1
        lip = float(i)
        if x[i] < h:
            lip = i + (h - x[i]) / (x[i + 1] - x[i])
        j = p
        while j < rights[n] and x[j] > h:
            j += 1
        rip = float(j)
        if x[j] < h:
            rip = j - (h - x[j]) / (x[j - 1] - x[j])
        widths[n] = rip - lip
        wh[n] = h
        lips[n] = lip
        rips[n] = rip
    return widths, wh, lips, rips


def _kolmogorov_sf(t: float) -> float:
    """Kolmogorov distribution survival Q(t) = 2 sum (-1)^{k-1} e^{-2k^2t^2}."""
    if t <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = (-1) ** (k - 1) * math.exp(-2.0 * k * k * t * t)
        s += term
        if abs(term) < 1e-16:
            break
    return max(0.0, min(1.0, 2.0 * s))


def _shim_ks_1samp(x, cdf, args=()):
    """One-sample two-sided KS: exact statistic + asymptotic
    Kolmogorov p (scipy's large-n path)."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    F = np.asarray(cdf(x, *args), dtype=np.float64)
    i = np.arange(1, n + 1)
    d = max(float(np.max(i / n - F)), float(np.max(F - (i - 1) / n)))
    p = _kolmogorov_sf(math.sqrt(n) * d)
    return namedtuple("KstestResult", ["statistic", "pvalue"])(d, p)


def _chi2_sf(x: float, k: int) -> float:
    """Chi-square survival via the regularized upper incomplete gamma
    (series/continued-fraction, Numerical-Recipes formulation)."""
    if x <= 0:
        return 1.0
    a = k / 2.0
    xx = x / 2.0
    gln = math.lgamma(a)
    if xx < a + 1.0:  # series for P, return 1-P
        ap = a
        s = 1.0 / a
        delta = s
        for _ in range(500):
            ap += 1.0
            delta *= xx / ap
            s += delta
            if abs(delta) < abs(s) * 1e-15:
                break
        return max(0.0, 1.0 - s * math.exp(-xx + a * math.log(xx) - gln))
    b = xx + 1.0 - a  # continued fraction for Q
    c = 1e300
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = 1e-300 if abs(d) < 1e-300 else d
        c = b + an / c
        c = 1e-300 if abs(c) < 1e-300 else c
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 1e-15:
            break
    return min(1.0, h * math.exp(-xx + a * math.log(xx) - gln))


def _shim_acorr_ljungbox(x, lags=None, return_df=True):
    """statsmodels acorr_ljungbox: Q(h) = n(n+2) sum r_k^2/(n-k),
    chi2(h) p-values; biased-ACF r_k (statsmodels acf default)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    c = x - x.mean()
    denom = float(np.sum(c * c))
    hs = [int(lags)] if np.isscalar(lags) else [int(h) for h in
                                                (lags or [min(10, n // 5)])]
    maxh = max(hs)
    r = np.array([float(np.sum(c[k:] * c[:-k])) / denom
                  for k in range(1, maxh + 1)])
    stats_, ps = [], []
    for h in hs:
        q = n * (n + 2.0) * float(np.sum(r[:h] ** 2 / (n - np.arange(1, h + 1))))
        stats_.append(q)
        ps.append(_chi2_sf(q, h))

    class _LB:
        lb_stat = SimpleNamespace(values=np.array(stats_))
        lb_pvalue = SimpleNamespace(values=np.array(ps))

        def __getitem__(self, k):
            return {"lb_stat": self.lb_stat, "lb_pvalue": self.lb_pvalue}[k]

    return _LB()


def _shim_sign_test(x, mu0=0):
    """statsmodels sign_test: M = (n_pos - n_neg)/2, exact two-sided
    binomial p over the non-zero sample."""
    x = np.asarray(x, dtype=np.float64)
    pos = int(np.sum(x > mu0))
    neg = int(np.sum(x < mu0))
    n = pos + neg
    m = (pos - neg) / 2.0
    k = min(pos, neg)
    # two-sided exact binomial(n, 1/2)
    from math import comb

    tail = sum(comb(n, i) for i in range(0, k + 1)) / 2.0**n
    p = min(1.0, 2.0 * tail)
    if pos == neg:
        p = 1.0
    return m, p


def _pywt_shim():
    from pyhctsa_spark.functions import wavelet as _wl

    def _dwt(data, wavelet, mode="symmetric", axis=-1):
        w = wavelet if isinstance(wavelet, _wl.Wavelet) else _wl.Wavelet(wavelet)
        return _wl.dwt(np.asarray(data, dtype=np.float64), w)

    def _cwt(data=None, scales=None, wavelet=None):
        return _wl.cwt(np.asarray(data, dtype=np.float64),
                       np.asarray(scales), wavelet), None

    return SimpleNamespace(
        Wavelet=_wl.Wavelet,
        dwt=_dwt,
        dwt_max_level=_wl.dwt_max_level,
        cwt=_cwt,
    )


def _unavailable(name):
    def _raise(*a, **k):
        raise NotImplementedError(f"parity shim: {name} unavailable")

    return _raise


class _DummyLogger:
    def __getattr__(self, _):
        return lambda *a, **k: None


def _base_namespace() -> dict:
    stats_ns = SimpleNamespace(
        moment=_shim_moment, skew=_shim_skew, kurtosis=_shim_kurtosis,
        mode=_shim_mode, iqr=_shim_iqr, zscore=_shim_zscore,
        norm=_Norm(), expon=_Expon(), pearsonr=_shim_pearsonr,
        gaussian_kde=_GaussianKDE,
        gmean=lambda a: float(np.exp(np.mean(np.log(np.asarray(a, dtype=np.float64))))),
        hmean=lambda a: float(len(a) / np.sum(1.0 / np.asarray(a, dtype=np.float64))),
        # scipy uniform MLE fit: loc = min, scale = max - min
        uniform=SimpleNamespace(fit=lambda x, **kw: (float(np.min(x)),
                                                     float(np.max(x) - np.min(x)))),
        mstats=SimpleNamespace(mquantiles=_shim_mquantiles),
    )
    np_proxy = _NpProxy()
    ns: dict = {
        "np": np_proxy, "numpy": np_proxy, "math": math,
        "ArrayLike": object, "Union": Union, "Optional": Optional,
        "Any": Any, "Dict": Dict, "List": List,
        "logger": _DummyLogger(),
        "stats": stats_ns,
        "skew": _shim_skew, "kurtosis": _shim_kurtosis, "smode": _shim_mode,
        "mode": _shim_mode, "iqr": _shim_iqr,
        "norm": _Norm(), "expon": _Expon(),
        "gaussian_kde": _GaussianKDE,
        "mstats": SimpleNamespace(mquantiles=_shim_mquantiles),
        "ssre": _shim_resample,
        "detrend": _shim_detrend, "lfilter": _shim_lfilter, "pacf": _shim_pacf,
        "curve_fit": _unavailable("curve_fit"),
        # delegates to the repo's KPSS implementation (published formula
        # + statsmodels CV-table p interpolation, oracle-checked at the
        # stat level): the KPSSTest case verifies the reference's
        # lag-sweep ORCHESTRATION and key naming
        "kpss": lambda y, nlags=0, regression="ct": (
            (lambda o: (o["stat"], o["pValue"], None, None))(
                __import__("pyhctsa_spark.functions.model",
                           fromlist=["kpss_test"]).kpss_test(
                    np.asarray(y, dtype=np.float64), int(nlags))
            )
        ),
        "acorr_ljungbox": _shim_acorr_ljungbox,
        # stat-test shims that return NaN results: the Walker/ForcePotential
        # sweeps call these for a couple of output keys; the parity cases
        # skip those keys but still verify everything else.
        "runstest_1samp": lambda *a, **k: (float("nan"), float("nan")),
        "ansari": lambda *a, **k: namedtuple(
            "AnsariResult", ["statistic", "pvalue"])(float("nan"), float("nan")),
        "sign_test": _shim_sign_test,
        "AutoReg": _AutoRegShim,
        "VarianceRatio": _VarianceRatioShim,
        "ar_select_order": _unavailable("ar_select_order"),
        "_sampen_c": _SampenCShim(),
        "pearsonr": _shim_pearsonr,
        "KDTree": _KDTree,
        "NaturalVG": _unavailable("NaturalVG"),
        "periodicity_wang": _unavailable("periodicity_wang"),
        "jp": SimpleNamespace(isJVMStarted=lambda: False,
                              startJVM=_unavailable("jpype")),
        # pywt shim DELEGATES to the repo's DWT/CWT primitives (which are
        # spec-golden-tested): the differential cases then exercise the
        # reference's ORCHESTRATION (level selection, wrcoef upsampling
        # chain, coefficient statistics) against the repo operators.
        "pywt": _pywt_shim(),
        "cwt": _pywt_shim().cwt,
        "signal": SimpleNamespace(
            lfilter=_shim_lfilter, periodogram=_shim_periodogram,
            resample=_shim_resample,
            peak_widths=_shim_peak_widths,
            peak_prominences=_shim_peak_prominences,
        ),
        "scipy": SimpleNamespace(
            fft=np.fft, stats=stats_ns,
            signal=SimpleNamespace(lfilter=_shim_lfilter,
                                   periodogram=_shim_periodogram,
                                   resample=_shim_resample,
                                   peak_widths=_shim_peak_widths,
                                   peak_prominences=_shim_peak_prominences,
                                   windows=SimpleNamespace(
                                       boxcar=lambda n: np.ones(int(n)),
                                       hann=lambda n: np.hanning(int(n)),
                                       hamming=lambda n: np.hamming(int(n)),
                                   ),
                                   welch=_unavailable("welch")),
        ),
        "ks_1samp": _shim_ks_1samp,
        "peak_widths": _shim_peak_widths,
        "peak_prominences": _shim_peak_prominences,
        "numba": SimpleNamespace(jit=lambda *a, **k: (lambda f: f),
                                 njit=lambda *a, **k: (lambda f: f)),
        "njit": lambda *a, **k: (lambda f: f) if a and callable(a[0]) else (lambda f: f),
        "factorial": math.factorial,
        "_xlogx": lambda x, base=2: np.where(
            np.asarray(x, dtype=np.float64) == 0, 0.0,
            np.asarray(x, dtype=np.float64)
            * np.log(np.where(np.asarray(x, dtype=np.float64) > 0, x, 1.0))
            / math.log(base)),
        "LinAlgError": np.linalg.LinAlgError,
        "wraps": __import__("functools").wraps,
        "os": SimpleNamespace(path=SimpleNamespace(join=lambda *a: "/".join(a))),
        "csv": SimpleNamespace(reader=_unavailable("csv.reader")),
    }
    return ns


# ---------------------------------------------------------------------------
# AST extraction
# ---------------------------------------------------------------------------

class _ImportStripper(ast.NodeTransformer):
    """Remove import statements ANYWHERE (some reference functions do
    `from ..Operations.X import Y` inside their bodies — the names are
    already in the shared namespace)."""

    def visit_Import(self, node):
        return ast.Pass()

    def visit_ImportFrom(self, node):
        return ast.Pass()


def _extract_module_code(path: str) -> ast.Module:
    """Keep top-level function/class defs and simple assigns; drop imports
    (including function-local ones) and strip every decorator."""
    with open(path, "r") as f:
        tree = ast.parse(f.read())
    kept: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            node.decorator_list = []
            kept.append(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            kept.append(node)
    mod = ast.Module(body=kept, type_ignores=[])
    mod = _ImportStripper().visit(mod)
    return ast.fix_missing_locations(mod)


_NAMESPACE: dict | None = None


def reference_namespace() -> dict:
    """One shared namespace with every reference function exec'd in, so
    cross-module calls (FirstCrossing from Stationarity, etc.) resolve."""
    global _NAMESPACE
    if _NAMESPACE is None:
        ns = _base_namespace()
        for pkg, mod in _MODULES:
            path = f"{REF_ROOT}/{pkg}/{mod}.py"
            code = compile(_extract_module_code(path), f"<ref:{mod}>", "exec")
            exec(code, ns)  # noqa: S102 — extracted numpy math, test-only
        _NAMESPACE = ns
    return _NAMESPACE


def ref(name: str):
    """Look up a reference function by its public name."""
    return reference_namespace()[name]
