"""Model-fitting and hypothesis-test kernels (reference modules
Operations/ModelFit.py and Operations/HypothesisTests.py) — statsmodels /
arch / scipy dependencies replaced by direct numpy implementations.
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import chi2_sf, norm_cdf, t_ppf_975
from pyhctsa_spark.functions.kernels import acf_fourier_full, autocorr_fourier

__all__ = [
    "ar_ols_fit",
    "ar_cov",
    "ar_fit_select",
    "exp_smoothing",
    "residual_analysis",
    "kpss_test",
    "variance_ratio_test",
    "hypothesis_test",
    "partial_autocorr",
]


def _lag_matrix(y: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    X = np.column_stack([y[p - j - 1 : len(y) - j - 1] for j in range(p)])
    return X, y[p:]


def ar_ols_fit(y: np.ndarray, p: int) -> tuple[np.ndarray, float]:
    """Conditional least-squares AR(p), no trend (the AutoReg(trend='n')
    estimate the reference uses): phi from OLS on the lag matrix,
    sigma2 = SSR / nobs."""
    X, t = _lag_matrix(np.asarray(y, dtype=np.float64), p)
    phi, *_ = np.linalg.lstsq(X, t, rcond=None)
    resid = t - X @ phi
    sigma2 = float(resid @ resid / len(t))
    return phi, sigma2


def ar_cov(y: np.ndarray, p: int = 2) -> dict:
    """AR(p) fit + residual stats. Parity: MF_arcov (ModelFit.py:350-390):
    a = [1, -phi...], one-step predictions via the AR filter, residual
    mean/std/AC1/AC2 (Fourier ACF)."""
    y = np.asarray(y, dtype=np.float64)
    phi, sigma2 = ar_ols_fit(y, p)
    a = np.concatenate(([1.0], -phi))
    out = {"e": sigma2}
    for i, ai in enumerate(a):
        out[f"a{i+1}"] = float(ai)
    # y_est[t] = sum_j phi_j y[t-j]  (zero-initialized past)
    y_est = np.zeros(len(y))
    for j, ph in enumerate(phi, start=1):
        y_est[j:] += ph * y[:-j]
    err = y - y_est
    out["res_mu"] = float(err.mean())
    out["res_std"] = float(err.std(ddof=1))
    out["res_AC1"] = autocorr_fourier(err, 1)
    out["res_AC2"] = autocorr_fourier(err, 2)
    return out


def ar_fit_select(y: np.ndarray, pmin: int = 1, pmax: int = 10,
                  selector: str = "sbc") -> dict:
    """AR order selection + fitted-model statistics. Parity: MF_ARfit
    (ModelFit.py:443-551), full output surface, with statsmodels'
    ``ar_select_order`` / ``AutoReg(trend='n')`` semantics
    reimplemented in numpy (statsmodels is not an engine dependency):

    - candidate orders 0..pmax are all fit on the COMMON hold_back
      sample (rows pmax..N-1), exactly how ``ar_select_order(maxlag=
      pmax, glob=False, trend='n')`` makes its ICs comparable — the
      order-0 null model is a real candidate (its win clamps to pmin,
      the reference's ``max(pmin, ...)``);
    - IC convention: MLE sigma2 = SSR/nobs, llf = -nobs/2(ln(2*pi*s2)
      +1), aic = -2 llf + 2(p+1), bic with ln(nobs); the reported
      sbc_p/fpe_p curves are those common-sample values for p=1..pmax
      normalized by N (the reference pops order 0 in _get_criteria);
    - the selector's winner is REFIT on its own full conditional
      sample (``AutoReg(y, lags=p_opt).fit()``), so coefficients,
      noise variance C, and residual diagnostics use nobs = N - p_opt;
    - coefficient errors are Student-t 95% intervals on the AutoReg
      OLS covariance sigma2 (X'X)^-1 (MLE sigma2), with t.ppf(0.975,
      N - 2 p_opt) from the A&S 26.7.5 expansion (|err| < 1e-7 at the
      engine's series lengths) — not the 1.96 normal approximation.

    Outputs: per-order sbc_p / fpe_p curves (BIC / AIC), their minima
    and argmin orders, the selector-optimal model's coefficients A1..A6
    (zero-padded), coefficient summary stats, noise variance C,
    Ljung-Box(20, model_df=popt) residual significance, the fraction of
    the first 20 residual ACF lags beyond the 1.96/sqrt(N) band, and
    the 95%% t-interval coefficient-error stats."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    Xf, tf = _lag_matrix(y, pmax)
    nobs_sel = len(tf)
    crits_bic, crits_aic = {}, {}
    for p in range(0, pmax + 1):
        if p == 0:
            resid = tf
        else:
            phi_p, *_ = np.linalg.lstsq(Xf[:, :p], tf, rcond=None)
            resid = tf - Xf[:, :p] @ phi_p
        sigma2 = float(resid @ resid / nobs_sel)
        ll = -0.5 * nobs_sel * (math.log(2 * math.pi * sigma2) + 1.0)
        crits_aic[p] = (-2 * ll + 2 * (p + 1)) / N
        crits_bic[p] = (-2 * ll + math.log(nobs_sel) * (p + 1)) / N
    sel = crits_bic if selector in ("sbc", "bic") else crits_aic
    p_opt = max(pmin, min(sel, key=sel.get))
    # drop the order-0 candidate from the REPORTED curves (reference
    # _get_criteria pops it) but keep it in the selection above
    del crits_bic[0], crits_aic[0]
    # final refit on the winner's own conditional sample
    phi, sigma2 = ar_ols_fit(y, p_opt)
    out: dict = {}
    out["A1"] = float(phi[0])
    for i in range(2, 7):
        out[f"A{i}"] = float(phi[i - 1]) if len(phi) >= i else 0.0
    out["maxA"] = float(phi.max())
    out["minA"] = float(phi.min())
    out["meanA"] = float(phi.mean())
    out["stdA"] = float(np.std(phi, ddof=1)) if len(phi) > 1 else 0.0
    out["sumA"] = float(phi.sum())
    out["rmsA"] = float(np.sqrt(np.sum(phi**2)))
    out["sumsqA"] = float(np.sum(phi**2))
    out["C"] = float(sigma2)
    for p in range(pmin, pmax + 1):
        out[f"sbc_{p}"] = float(crits_bic[p])
        out[f"fpe_{p}"] = float(crits_aic[p])
    out["minsbc"] = float(min(crits_bic.values()))
    out["popt_sbc"] = float(min(crits_bic, key=crits_bic.get))
    out["minfpe"] = float(min(crits_aic.values()))
    out["popt_fpe"] = float(min(crits_aic, key=crits_aic.get))
    # residual diagnostics on the selector-optimal fit
    X, t = _lag_matrix(y, p_opt)
    resid = t - X @ phi
    nobs = len(resid)
    acf_r = acf_fourier_full(resid)[1:21]
    q = nobs * (nobs + 2) * float(
        np.sum(acf_r**2 / (nobs - np.arange(1, 21)))
    )
    df = max(1, 20 - p_opt)
    out["res_siglev"] = float(chi2_sf(q, df))
    out["pcorr_res"] = float(np.sum(np.abs(acf_r) > 1.96 / math.sqrt(N)) / 20)
    # 95% Student-t coefficient errors from the AutoReg OLS covariance
    # (cov_params = MLE sigma2 * (X'X)^-1; dof = df_resid = nobs - p)
    try:
        cov = sigma2 * np.linalg.inv(X.T @ X)
        aerr = t_ppf_975(nobs - p_opt) * np.sqrt(np.diag(cov))
        out["aerr_min"] = float(aerr.min())
        out["aerr_max"] = float(aerr.max())
        out["aerr_mean"] = float(aerr.mean())
    except np.linalg.LinAlgError:
        out["aerr_min"] = out["aerr_max"] = out["aerr_mean"] = float("nan")
    return out


def _exp_smooth_forecast(x: np.ndarray, a: float) -> np.ndarray:
    """One-step exponential-smoothing forecasts, reference recurrence
    (_fit_exp_smooth, ModelFit.py:257-276): s0 = mean of the first i
    points, smoothed through i, forecast point i+1.

    The reference's per-i inner loop is O(N^2); the same quantity has a
    closed form  s(i) = (1-a)^i * mean(x[:i]) + T_i  with
    T_i = (1-a) T_{i-1} + a x_i, giving an exact O(N) scan. (1-a)^i
    underflows to 0 for large i, which is the correct limit.
    """
    n = len(x)
    xf = np.zeros(n)
    if n < 3:
        return xf
    b = 1.0 - a
    cummean = np.cumsum(x[:-1]) / np.arange(1, n)  # mean(x[:i]) at index i-1
    T = 0.0
    decay = 1.0
    for i in range(1, n - 1):
        T = b * T + a * x[i]
        decay *= b
        if decay < 1e-320:
            decay = 0.0
        xf[i + 1] = decay * cummean[i - 1] + T
    return xf


def exp_smoothing(x: np.ndarray, ntrain=None, alpha="best") -> dict:
    """Exponential smoothing with two-stage quadratic search for alpha on
    a training prefix, then residual analysis on the full fit. Parity:
    MF_ExpSmoothing (ModelFit.py:124-256)."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    out: dict = {}
    if ntrain is None:
        ntrain = min(100, N)
    if 0 < ntrain < 1:
        ntrain = int(math.floor(N * ntrain))
    ntrain = max(100, min(1000, ntrain))
    if N < ntrain:
        return {"alphamin": float("nan")}

    def rmse_for(a: float, xt: np.ndarray) -> float:
        xf = _exp_smooth_forecast(xt, a)
        fore, orig = xf[2:], xt[2:]
        return float(np.sqrt(np.mean((fore - orig) ** 2))) if len(fore) else float("nan")

    if alpha == "best":
        xtrain = x[:ntrain]
        alphar = np.linspace(0.1, 0.9, 5)
        rmses = np.array([rmse_for(a, xtrain) for a in alphar])
        order = np.argsort(rmses)[:3]
        p = np.polyfit(alphar[order], rmses[order], 2)
        out["alphamin_1"] = float(-p[1] / (2 * p[0]))
        out["p1_1"] = float(abs(p[0]))
        out["cup_1"] = float(np.sign(p[0]))
        if p[0] < 0:
            yb = np.polyval(p, [0.01, 1.0])
            alphamin = [0.01, 1.0][int(np.argmin(yb))]
        else:
            alphamin = -p[1] / (2 * p[0])
            lo, hi = alphamin - 0.1, alphamin + 0.1
            if lo <= 0:
                lo, hi = 0.01, max(alphamin, 0) + 0.1
            elif hi >= 1:
                lo, hi = min(alphamin, 1) - 0.1, 1.0
            ar2 = np.linspace(lo, hi, 5)
            r2 = np.array([rmse_for(a, xtrain) for a in ar2])
            p2 = np.polyfit(ar2, r2, 2)
            alphamin = ar2[int(np.argmin(r2))] if p2[0] < 0 else -p2[1] / (2 * p2[0])
        alpha = float(np.clip(alphamin, 0.01, 1.0))
        out["alphamin"] = alpha
    xf = _exp_smooth_forecast(x, float(alpha))
    resid = xf[2:] - x[2:]
    out.update(residual_analysis(resid))
    return out


def residual_analysis(e: np.ndarray) -> dict:
    """Residual diagnostics — the reference's complete 19-key surface.
    Parity: MF_ResidualAnalysis (ModelFit.py:279-347): raw-residual
    moments (meane/meanabs/rmse/stde/mms/maxonmean — note maxonmean
    divides by |mean|, which explodes for centered residuals,
    bug-for-bug), then 25-lag Fourier ACF of the Z-SCORED residuals
    (ac1-3, sqrt(N)-normalized |ac|s, median/std of |acf|, proportion
    and first time below the 2.6/sqrt(N) band), Durbin-Watson, and the
    one-sample KS test against the STANDARD normal (statistic + the
    asymptotic Kolmogorov p)."""
    e = np.asarray(e, dtype=np.float64)
    n = len(e)
    out: dict = {
        "meane": float(e.mean()),
        "meanabs": float(np.mean(np.abs(e))),
        "rmse": float(np.sqrt(np.mean(e**2))),
        "stde": float(e.std(ddof=1)),
    }
    out["mms"] = abs(out["meane"]) + abs(out["stde"])
    with np.errstate(divide="ignore", invalid="ignore"):
        out["maxonmean"] = float(e.max() / abs(e.mean()))
    ez = np.zeros(n) if out["stde"] == 0 else (e - e.mean()) / out["stde"]
    max_lag = 25
    acf = np.array([autocorr_fourier(ez, k) for k in range(1, max_lag + 1)])
    sqrt_n = math.sqrt(n)
    out["ac1"] = float(acf[0])
    out["ac2"] = float(acf[1])
    out["ac3"] = float(acf[2])
    out["ac1n"] = abs(out["ac1"]) * sqrt_n
    out["ac2n"] = abs(out["ac2"]) * sqrt_n
    out["ac3n"] = abs(out["ac3"]) * sqrt_n
    out["acmnd0"] = float(np.median(np.abs(acf)) * sqrt_n)
    out["acsnd0"] = float(np.std(np.abs(acf), ddof=1) * sqrt_n)
    below = np.flatnonzero(np.abs(acf) < 2.6 / sqrt_n)
    out["propbth"] = float(below.size / max_lag)
    out["ftbth"] = float(below[0] + 1) if below.size else float(max_lag + 1)
    d = np.diff(ez)
    out["dwts"] = float((d @ d) / (ez @ ez)) if (ez @ ez) > 0 else float("nan")
    # one-sample KS vs the STANDARD normal on the z-scored residuals
    es = np.sort(ez)
    cdf = norm_cdf(es)
    emp_hi = np.arange(1, n + 1) / n
    emp_lo = np.arange(0, n) / n
    ks = float(max(np.max(emp_hi - cdf), np.max(cdf - emp_lo)))
    out["normksstat"] = ks
    out["normp"] = _kolmogorov_sf(sqrt_n * ks)
    return out


def _kolmogorov_sf(t: float) -> float:
    """Kolmogorov survival Q(t) = 2 sum (-1)^{k-1} e^{-2 k^2 t^2}
    (the asymptotic one-sample KS p-value)."""
    if t <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * t * t)
        s += term
        if abs(term) < 1e-16:
            break
    return max(0.0, min(1.0, 2.0 * s))


_KPSS_CT_TABLE = [(0.119, 0.10), (0.146, 0.05), (0.176, 0.025), (0.216, 0.01)]


def kpss_test(y: np.ndarray, lags: int | list | None = None) -> dict:
    """KPSS stationarity test, trend case (regression='ct' as the
    reference configures, Stationarity.py:432-490): detrend by OLS line,
    partial sums, Newey-West long-run variance with Bartlett weights,
    p-value interpolated from the standard critical-value table.

    A list of lags runs the reference's sweep and returns
    max/min p-values and statistics plus the argmax/argmin lags."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if isinstance(lags, (list, tuple, np.ndarray)):
        lag_list = [int(v) for v in lags]
        stats_ = [kpss_test(y, lv) for lv in lag_list]
        stat = np.array([s["stat"] for s in stats_])
        pv = np.array([s["pValue"] for s in stats_])
        return {
            "maxpValue": float(pv.max()),
            "minpValue": float(pv.min()),
            "maxstat": float(stat.max()),
            "minstat": float(stat.min()),
            "lagmaxstat": float(lag_list[int(np.argmax(stat))]),
            "lagminstat": float(lag_list[int(np.argmin(stat))]),
        }
    if lags is None:
        lags = int(math.ceil(12.0 * (n / 100.0) ** 0.25))
    t = np.arange(n, dtype=np.float64)
    A = np.column_stack([np.ones(n), t])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    e = y - A @ beta
    S = np.cumsum(e)
    s2 = float(e @ e) / n
    for ell in range(1, lags + 1):
        w = 1.0 - ell / (lags + 1.0)
        s2 += 2.0 * w * float(e[ell:] @ e[:-ell]) / n
    stat = float(S @ S) / (n * n * s2)
    # interpolate p (clamped to table range, like statsmodels)
    crits = np.array([c for c, _ in _KPSS_CT_TABLE])
    ps = np.array([p for _, p in _KPSS_CT_TABLE])
    p = float(np.interp(stat, crits, ps))
    if stat < crits[0]:
        p = 0.10
    elif stat > crits[-1]:
        p = 0.01
    return {"stat": stat, "pValue": p, "lags": float(lags)}


def variance_ratio_test(y: np.ndarray, period=2, iid=True) -> dict:
    """Lo-MacKinlay variance ratio test. Parity: SY_VarRatioTest
    (HypothesisTests.py:10-81): VR(q) from overlapping q-sums with
    bias-corrected variances; z-stat under iid or heteroskedastic
    assumptions; two-sided normal p.

    A list of periods (with a matching list of IID flags, the
    reference's signature: IID=0 means heteroskedasticity-robust) runs
    the sweep and returns the reference's summary statistics."""
    if isinstance(period, (list, tuple, np.ndarray)):
        iids = list(iid)
        if len(iids) != len(period):
            raise ValueError("periods and IIDs lists must have equal length")
        runs = [
            variance_ratio_test(y, int(p), bool(i))
            for p, i in zip(period, iids)
        ]
        pvals = np.array([r["pValue"] for r in runs])
        stats_ = np.array([r["stat"] for r in runs])
        imaxp = int(np.argmax(pvals))
        iminp = int(np.argmin(pvals))
        return {
            "maxpValue": float(pvals.max()),
            "minpValue": float(pvals.min()),
            "meanpValue": float(pvals.mean()),
            "periodmaxpValue": float(period[imaxp]),
            "periodminpValue": float(period[iminp]),
            "IIDperiodmaxpValue": float(iids[imaxp]),
            "IIDperiodminpValue": float(iids[iminp]),
            "meanstat": float(stats_.mean()),
            "maxstat": float(stats_.max()),
            "minstat": float(stats_.min()),
        }
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    q = period
    d = np.diff(y)
    nq = len(d)
    mu = float(np.mean(d))
    va = float(np.sum((d - mu) ** 2)) / (nq - 1)
    # overlapping q-period sums with the Lo-MacKinlay unbiased scaling
    s = y[q:] - y[:-q]
    m = q * (nq - q + 1) * (1.0 - q / nq)
    vb = float(np.sum((s - q * mu) ** 2)) / m
    vr = vb / va if va > 0 else float("nan")
    if iid:
        se = math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * nq))
    else:
        # heteroskedasticity-robust
        dc = (d - mu) ** 2
        theta = 0.0
        den = float(np.sum(dc)) ** 2
        for j in range(1, q):
            dj = float(np.sum(dc[j:] * dc[:-j]))
            theta += (2.0 * (q - j) / q) ** 2 * nq * dj / den
        se = math.sqrt(theta)
    z = (vr - 1.0) / se if se > 0 else float("nan")
    p = 2.0 * (1.0 - norm_cdf(abs(z)))
    return {"ratio": vr, "stat": z, "pValue": float(p)}


def _binom_two_sided_p(k: int, n: int) -> float:
    """Exact two-sided sign-test p (doubled smaller tail)."""
    if n == 0:
        return float("nan")
    if n > 1000:
        z = (k - n / 2.0) / math.sqrt(n / 4.0)
        return min(1.0, 2.0 * (1.0 - norm_cdf(abs(z))))
    kk = min(k, n - k)
    tail = sum(math.comb(n, i) for i in range(kk + 1)) / 2.0**n
    return min(1.0, 2.0 * tail)


def hypothesis_test(x: np.ndarray, the_test: str = "signtest") -> float:
    """p-values of classical tests. Parity: HT_HypothesisTest
    (HypothesisTests.py:82-134): signtest, runstest, ztest, signrank,
    jbtest, lbq — all native numpy."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if the_test == "signtest":
        pos = int(np.sum(x > 0))
        nn = int(np.sum(x != 0))
        return _binom_two_sided_p(pos, nn)
    if the_test == "runstest":
        # runs above/below the mean (MATLAB runstest default)
        s = np.sign(x - x.mean())
        s = s[s != 0]
        n1 = int(np.sum(s > 0))
        n2 = int(np.sum(s < 0))
        if n1 == 0 or n2 == 0:
            return float("nan")
        runs = 1 + int(np.sum(s[1:] != s[:-1]))
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var = (mu - 1.0) * (mu - 2.0) / (n1 + n2 - 1.0)
        # continuity correction as in MATLAB runstest
        diff = runs - mu
        c = 0.5 if abs(diff) > 0.5 else abs(diff)
        z = (diff - math.copysign(c, diff)) / math.sqrt(var)
        return float(min(1.0, 2.0 * (1.0 - norm_cdf(abs(z)))))
    if the_test == "ztest":
        z = x.mean() / (x.std(ddof=1) / math.sqrt(n))
        return float(min(1.0, 2.0 * (1.0 - norm_cdf(abs(z)))))
    if the_test == "signrank":
        # Wilcoxon signed rank, normal approximation with tie handling
        nz = x[x != 0]
        if len(nz) == 0:
            return float("nan")
        ranks = np.argsort(np.argsort(np.abs(nz))) + 1.0
        # average ranks for ties
        order = np.argsort(np.abs(nz))
        sorted_abs = np.abs(nz)[order]
        avg = np.empty_like(ranks)
        i = 0
        r = np.empty(len(nz))
        while i < len(nz):
            j = i
            while j + 1 < len(nz) and sorted_abs[j + 1] == sorted_abs[i]:
                j += 1
            r[i : j + 1] = (i + j) / 2.0 + 1.0
            i = j + 1
        rank_of = np.empty(len(nz))
        rank_of[order] = r
        W = float(np.sum(rank_of[nz > 0]))
        m = len(nz)
        mu = m * (m + 1) / 4.0
        sig = math.sqrt(m * (m + 1) * (2 * m + 1) / 24.0)
        z = (W - mu) / sig if sig > 0 else float("nan")
        return float(min(1.0, 2.0 * (1.0 - norm_cdf(abs(z)))))
    if the_test == "jbtest":
        xc = x - x.mean()
        s2 = float(np.mean(xc**2))
        S = float(np.mean(xc**3)) / s2**1.5
        K = float(np.mean(xc**4)) / s2**2
        jb = n / 6.0 * (S * S + (K - 3.0) ** 2 / 4.0)
        return chi2_sf(jb, 2)
    if the_test == "lbq":
        # Ljung-Box with min(20, n-1) lags (MATLAB default)
        L = min(20, n - 1)
        acf = acf_fourier_full(x)[1 : L + 1]
        q = n * (n + 2.0) * float(np.sum(acf**2 / (n - np.arange(1, L + 1))))
        return chi2_sf(q, L)
    raise ValueError(the_test)


def partial_autocorr(y: np.ndarray, max_tau: int = 10) -> dict:
    """PACF via per-lag OLS (statsmodels pacf method='ols': regress y_t
    on an intercept + its first k lags; pac_k is the k-th lag
    coefficient). Parity: CO_PartialAutoCorr (Correlation.py:805-850,
    whatMethod='ols' default)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    out = {}
    for k in range(1, max_tau + 1):
        rows = n - k
        if rows <= k + 1:
            out[f"pac_{k}"] = float("nan")
            continue
        X = np.empty((rows, k + 1))
        X[:, 0] = 1.0
        for j in range(1, k + 1):
            X[:, j] = y[k - j : n - j]
        beta, *_ = np.linalg.lstsq(X, y[k:], rcond=None)
        out[f"pac_{k}"] = float(beta[k])
    return out
