"""2-D time-delay embedding geometry kernels (reference
Operations/Correlation.py: CO_Embed2 family, CO_StickAngles,
CO_TranslateShape, CO_AutoCorrShape, PD_PeriodicityWang)."""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import gaussian_kde_eval
from pyhctsa_spark.functions.kernels import (
    acf_fourier_full,
    autocorr_fourier,
    first_crossing_ac,
    point_of_crossing,
    quantile_hazen,
)

__all__ = [
    "embed2",
    "embed2_angle_tau",
    "embed2_dist",
    "embed2_shapes",
    "stick_angles",
    "translate_shape",
    "autocorr_shape",
    "periodicity_wang",
]


def _tau_discrete(y: np.ndarray) -> int:
    return int(first_crossing_ac(y)["firstCrossing"])


def _embed2_m(y: np.ndarray, tau) -> np.ndarray:
    if tau == "tau":
        tau = _tau_discrete(y)
        if tau > len(y) / 10:
            tau = len(y) // 10
    tau = max(int(tau), 1)
    return np.column_stack((y[:-tau], y[tau:]))


def embed2(y: np.ndarray, tau="tau") -> dict:
    """Angular distribution / stationarity / distances / outlier areas in
    the (y_t, y_{t+tau}) plane. Parity: CO_Embed2
    (Correlation.py:196-304)."""
    y = np.asarray(y, dtype=np.float64)
    m = _embed2_m(y, tau)
    N = m.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = np.arctan(np.diff(m[:, 1]) / np.diff(m[:, 0]))
    out = {
        "theta_ac1": autocorr_fourier(theta, 1),
        "theta_ac2": autocorr_fourier(theta, 2),
        "theta_ac3": autocorr_fourier(theta, 3),
        "theta_mean": float(np.mean(theta)),
        "theta_std": float(np.std(theta, ddof=1)),
    }
    edges = np.linspace(-np.pi / 2, np.pi / 2, 11)
    counts, _ = np.histogram(theta, bins=edges)
    px = counts / counts.sum()
    bw = np.diff(edges)
    out["hist10std"] = float(np.std(px, ddof=1))
    nz = px > 0
    out["histent"] = float(-np.sum(px[nz] * np.log(px[nz] / bw[nz])))
    # angular-distribution stationarity over fifths
    x4 = np.linspace(-np.pi / 2, np.pi / 2, 5)
    afifth = (N - 1) // 5
    nmat = np.zeros((4, 5))
    for i in range(5):
        nmat[:, i], _ = np.histogram(theta[afifth * i : afifth * (i + 1)], bins=x4)
    nmat = nmat / afifth
    # reference stdb{i+1} = std over the 4 BINS of segment i (n[:, i]),
    # for the first four of the five segments (Correlation.py:265-268)
    for i in range(4):
        out[f"stdb{i+1}"] = float(np.std(nmat[:, i], ddof=1))
    # distances from origin over fifths
    afifth = N // 5
    segs = [m[afifth * i : afifth * (i + 1)] for i in range(5)]
    eucd = [np.sqrt(s[:, 0] ** 2 + s[:, 1] ** 2) for s in segs]
    dm = [float(e.mean()) for e in eucd]
    ds = [float(e.std(ddof=1)) for e in eucd]
    for i in range(5):
        out[f"eucdm{i+1}"] = dm[i]
        out[f"eucds{i+1}"] = ds[i]
    out["std_eucdm"] = float(np.std(dm, ddof=1))
    out["mean_eucdm"] = float(np.mean(dm))
    out["std_eucds"] = float(np.std(ds, ddof=1))
    out["mean_eucds"] = float(np.mean(ds))
    spans = [np.ptp(s[:, 0]) * np.ptp(s[:, 1]) for s in segs]
    out["stdspana"] = float(np.std(spans, ddof=1))
    out["meanspana"] = float(np.mean(spans))
    d = np.sqrt(m[:, 0] ** 2 + m[:, 1] ** 2)
    ix = np.argsort(d, kind="mergesort")
    out["areas_all"] = float(np.ptp(m[:, 0]) * np.ptp(m[:, 1]))
    r50 = ix[: int(math.ceil(len(ix) / 2))]
    out["areas_50"] = float(np.ptp(m[r50, 0]) * np.ptp(m[r50, 1]))
    out["arearat"] = out["areas_50"] / out["areas_all"]
    return out


def embed2_angle_tau(y: np.ndarray, max_tau: int = 10) -> dict:
    """Angle-ACF as a function of embedding delay. Parity:
    CO_Embed2_AngleTau (Correlation.py:133-195)."""
    y = np.asarray(y, dtype=np.float64)
    a1 = np.zeros(max_tau)
    a2 = np.zeros(max_tau)
    for i, tau in enumerate(range(1, max_tau + 1)):
        m = np.column_stack((y[:-tau], y[tau:]))
        with np.errstate(divide="ignore", invalid="ignore"):
            theta = np.arctan(np.diff(m[:, 1]) / np.diff(m[:, 0]))
        a1[i] = autocorr_fourier(theta, 1)
        a2[i] = autocorr_fourier(theta, 2)
    out = {
        "ac1_thetaac1": autocorr_fourier(a1, 1),
        "ac1_thetaac2": autocorr_fourier(a2, 1),
        "mean_thetaac1": float(a1.mean()),
        "max_thetaac1": float(a1.max()),
        "min_thetaac1": float(a1.min()),
        "mean_thetaac2": float(a2.mean()),
        "max_thetaac2": float(a2.max()),
        "min_thetaac2": float(a2.min()),
    }
    out["meanrat_thetaac12"] = out["mean_thetaac1"] / out["mean_thetaac2"]
    out["diff_thetaac12"] = float(np.sum(np.abs(a2 - a1)))
    return out


def embed2_dist(y: np.ndarray, tau="tau") -> dict:
    """Successive-distance statistics in the embedding plane + exp fit.
    Parity: CO_Embed2_Dist (Correlation.py:851-922)."""
    y = np.asarray(y, dtype=np.float64)
    m = _embed2_m(y, tau)
    d = np.sqrt(np.sum(np.diff(m, axis=0) ** 2, axis=1))
    out = {
        "d_ac1": autocorr_fourier(d, 1),
        "d_ac2": autocorr_fourier(d, 2),
        "d_ac3": autocorr_fourier(d, 3),
        "d_mean": float(d.mean()),
        "d_median": float(np.median(d)),
        "d_std": float(d.std(ddof=1)),
        "d_iqr": quantile_hazen(d, 0.75) - quantile_hazen(d, 0.25),
        "d_max": float(d.max()),
        "d_min": float(d.min()),
        "d_cv": float(d.mean() / d.std(ddof=1)),
    }
    # exponential MLE fit negative log-likelihood (scale = mean)
    lam = 1.0 / d.mean()
    out["d_expfit_nlogL"] = float(-np.sum(np.log(lam) - lam * d))
    return out


def embed2_shapes(y: np.ndarray, tau="tau", shape: str = "circle", r: float = 1.0) -> dict:
    """Circle-neighbor counts around each embedded point (O(N^2)).
    Parity: CO_Embed2_Shapes (Correlation.py:1011-1100)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) > 2500:
        y = y[:2500]  # O(N^2) memory guard
    m = _embed2_m(y, tau)
    N = len(m)
    d2 = (
        (m[:, 0][:, None] - m[:, 0][None, :]) ** 2
        + (m[:, 1][:, None] - m[:, 1][None, :]) ** 2
    )
    counts = (d2 <= r * r).sum(axis=1).astype(np.float64) - 1.0
    if np.all(counts == 0):
        return {"mean": float("nan")}
    out = {
        "ac1": autocorr_fourier(counts, 1),
        "ac2": autocorr_fourier(counts, 2),
        "ac3": autocorr_fourier(counts, 3),
        "tau": point_of_crossing(acf_fourier_full(counts), 0.0)[1] - 1.0,
        "max": float(counts.max()),
        "std": float(counts.std(ddof=1)),
        "median": float(np.median(counts)),
        "mean": float(counts.mean()),
    }
    iqr = quantile_hazen(counts, 0.75) - quantile_hazen(counts, 0.25)
    out["iqr"] = float(iqr)
    out["iqronrange"] = float(iqr / np.ptp(counts)) if np.ptp(counts) else float("nan")
    afifth = N // 5
    segs = np.array([counts[i * afifth : (i + 1) * afifth] for i in range(5)])
    out["statav5_m"] = float(np.std(segs.mean(axis=1), ddof=1) / counts.std(ddof=1))
    out["statav5_s"] = float(
        np.std(segs.std(axis=1, ddof=1), ddof=1) / counts.std(ddof=1)
    )
    return out


def stick_angles(y: np.ndarray) -> dict:
    """Line-of-sight stick angles above/below the baseline: moments,
    KDE symmetry/difference measures. Parity: CO_StickAngles
    (Correlation.py:530-750, subset with the same output names)."""
    y = np.asarray(y, dtype=np.float64)
    ix = [np.flatnonzero(y >= 0), np.flatnonzero(y < 0)]
    angles = [np.array([]), np.array([])]
    for j in range(2):
        if len(ix[j]) > 1:
            angles[j] = np.arctan(np.diff(y[ix[j]]) / np.diff(ix[j]))
    all_angles = np.concatenate(angles)
    def _s(v, f, default=float("nan")):
        return float(f(v)) if v.size > 1 else default
    out = {
        "std_p": _s(angles[0], lambda v: np.std(v, ddof=1)),
        "mean_p": _s(angles[0], np.mean),
        "median_p": _s(angles[0], np.median),
        "std_n": _s(angles[1], lambda v: np.std(v, ddof=1)),
        "mean_n": _s(angles[1], np.mean),
        "median_n": _s(angles[1], np.median),
        "std": _s(all_angles, lambda v: np.std(v, ddof=1)),
        "mean": _s(all_angles, np.mean),
        "median": _s(all_angles, np.median),
    }
    out["pnsumabsdiff"] = float("nan")
    if angles[0].size > 1 and angles[1].size > 1 and np.var(angles[0]) > 1e-10 and np.var(angles[1]) > 1e-10:
        ksx = np.linspace(all_angles.min(), all_angles.max(), 200)
        ksy1 = gaussian_kde_eval(angles[0], ksx)
        ksy2 = gaussian_kde_eval(angles[1], ksx)
        out["pnsumabsdiff"] = float(np.sum(np.abs(ksy1 - ksy2)))
    for j, suffix in ((0, "p"), (1, "n")):
        out[f"symks_{suffix}"] = float("nan")
        out[f"ratmean_{suffix}"] = float("nan")
        a = angles[j]
        if a.size > 1 and np.var(a) > 1e-10:
            maxdev = np.max(np.abs(a))
            ksy = gaussian_kde_eval(a, np.linspace(-maxdev, maxdev, 201))
            out[f"symks_{suffix}"] = float(np.sum(np.abs(ksy[:100] - ksy[101:][::-1])))
            pos, neg = a[a > 0], a[a < 0]
            if pos.size and neg.size:
                out[f"ratmean_{suffix}"] = float(pos.mean() / neg.mean())

    def _sub_statav(x: np.ndarray, n: int) -> tuple[float, float]:
        p_ = len(x) // n
        if p_ < 1:
            return float("nan"), float("nan")
        seg = x[: p_ * n].reshape(n, p_)
        sd = x.std(ddof=1)
        if sd == 0:
            return float("nan"), float("nan")
        # reference _SUB_statav (Correlation.py:747-748): the INNER
        # per-segment std is np.std's default ddof=0; only the
        # across-segment std uses ddof=1
        return (
            float(np.std(seg.mean(axis=1), ddof=1) / sd),
            float(np.std(seg.std(axis=1, ddof=0), ddof=1) / sd),
        )

    from pyhctsa_spark.functions.kernels import (
        acf_fourier_full,
        point_of_crossing,
        zscore,
    )

    def _z(v: np.ndarray) -> np.ndarray:
        try:
            return zscore(v)
        except Exception:
            return np.array([])

    def _moments(v: np.ndarray) -> tuple[float, float]:
        """(skew biased, kurtosis non-fisher biased) — scipy defaults."""
        if v.size < 2:
            return float("nan"), float("nan")
        c = v - v.mean()
        m2 = np.mean(c**2)
        if m2 == 0:
            return float("nan"), float("nan")
        return float(np.mean(c**3) / m2**1.5), float(np.mean(c**4) / m2**2)

    zsets = {"p": _z(angles[0]), "n": _z(angles[1]), "all": _z(all_angles)}
    for suffix, za in zsets.items():
        for nseg in (2, 3, 4, 5):
            m_, s_ = _sub_statav(za, nseg) if za.size else (float("nan"),) * 2
            out[f"statav{nseg}_{suffix}_m"] = m_
            out[f"statav{nseg}_{suffix}_s"] = s_
        # correlation structure of the angle sequence (zero-crossing
        # timescale + Fourier ACF at lags 1, 2)
        if za.size > 2:
            acf = acf_fourier_full(za)
            _, interp = point_of_crossing(acf, 0.0)
            out[f"tau_{suffix}"] = interp - 1.0
            out[f"ac1_{suffix}"] = float(acf[1]) if len(acf) > 1 else float("nan")
            out[f"ac2_{suffix}"] = float(acf[2]) if len(acf) > 2 else float("nan")
        else:
            out[f"tau_{suffix}"] = out[f"ac1_{suffix}"] = out[f"ac2_{suffix}"] = float("nan")
        # distribution of the z-scored angles (hazen quantiles) + raw moments
        raw = {"p": angles[0], "n": angles[1], "all": all_angles}[suffix]
        if za.size:
            for q, nameq in ((0.01, "q1"), (0.1, "q10"), (0.9, "q90"), (0.99, "q99")):
                out[f"{nameq}_{suffix}"] = float(
                    np.quantile(za, q, method="hazen")
                )
        else:
            for nameq in ("q1", "q10", "q90", "q99"):
                out[f"{nameq}_{suffix}"] = float("nan")
        sk, ku = _moments(raw)
        out[f"skewness_{suffix}"] = sk
        out[f"kurtosis_{suffix}"] = ku
    return out


def _stat_av_sliding(y: np.ndarray, window_stat: str, num_seg: int, inc_move: int) -> float:
    n = len(y)
    wlen = int(np.floor(n / num_seg))
    if wlen == 0:
        return float("nan")
    inc = max(1, int(np.floor(wlen / inc_move)))
    steps = int(np.floor((n - wlen) / inc) + 1)
    qs = np.empty(steps)
    for i in range(steps):
        seg = y[i * inc : i * inc + wlen]
        qs[i] = seg.mean() if window_stat == "mean" else seg.std(ddof=1)
    return float(np.std(qs, ddof=1) / np.std(y, ddof=1))


def translate_shape(y: np.ndarray, shape: str = "circle", d: int = 2,
                    how_to_move: str = "pts") -> dict:
    """Counts of points inside a circle/rectangle translated along the
    series. Parity: CO_TranslateShape (Correlation.py:1344-1477)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    t = np.arange(1, N + 1, dtype=np.float64)
    if how_to_move != "pts":
        raise ValueError(how_to_move)
    w = int(math.floor(d))
    rng_idx = np.arange(1 + w, N - w + 1)
    NN = len(rng_idx)
    counts = np.zeros(NN)
    if shape == "circle":
        for i, idx in enumerate(rng_idx):
            sl = slice(idx - w - 1, idx + w)
            dt = t[sl] - t[idx - 1]
            dyv = y[sl] - y[idx - 1]
            counts[i] = np.sum(dt * dt + dyv * dyv <= d * d)
    elif shape == "rectangle":
        # reference Correlation.py:1413-1416, bug-for-bug: the threshold
        # is |y[i]| with i the 0-based LOOP COUNTER (start of series),
        # not the window centre y[idx-1], and it counts |window values|
        # <= that threshold (no centring).
        for i, idx in enumerate(rng_idx):
            sl = slice(idx - w - 1, idx + w)
            counts[i] = np.sum(np.abs(y[sl]) <= abs(y[i]))
    else:
        raise ValueError(shape)
    out = {
        "max": float(counts.max()),
        "std": float(counts.std(ddof=1)),
        "mean": float(counts.mean()),
    }
    vals, hits = np.unique(counts, return_counts=True)
    im = int(np.argmax(hits))
    out["npatmode"] = float(hits[im] / NN)
    out["mode"] = float(vals[im])
    names = ["ones", "twos", "threes", "fours", "fives", "sixes", "sevens",
             "eights", "nines", "tens", "elevens"]
    for i in range(1, 12):
        if 2 * w + 1 >= i:
            out[names[i - 1]] = float(np.mean(counts == i))
    for ns in (2, 3, 4):
        out[f"statav{ns}_m"] = _stat_av_sliding(counts, "mean", ns, 1)
        out[f"statav{ns}_s"] = _stat_av_sliding(counts, "std", ns, 1)
    return out


def autocorr_shape(y: np.ndarray, stop_when="posDrown") -> dict:
    """Shape of the ACF out to a decay criterion; exponential-decay fit
    via 1-parameter least squares. Parity: CO_AutoCorrShape
    (Correlation.py:1478-1644)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    th = 2.0 / math.sqrt(N)
    full = acf_fourier_full(y)
    acf: list[float] = []
    ndrown = 0
    if isinstance(stop_when, int):
        acf = list(full[: stop_when + 1])
        ndrown = stop_when
    elif stop_when == "posDrown":
        for i in range(1, N + 1):
            v = full[i - 1]
            if v < th:
                if v > 0:
                    ndrown = i
                    acf.append(v)
                else:
                    ndrown = i - 1
                break
            acf.append(v)
    elif stop_when == "drown":
        for i in range(1, N + 1):
            v = full[i - 1]
            if i > 1 and abs(v) < th:
                ndrown = i
                acf.append(v)
                break
            acf.append(v)
    elif stop_when == "doubleDrown":
        # stop at 2*tau, where tau is the first lag with |ACF| < th
        for i in range(1, N + 1):
            v = full[i - 1]
            if ndrown > 0 and i == ndrown * 2:
                acf.append(v)
                break
            elif i > 1 and abs(v) < th:
                ndrown = i
            acf.append(v)
    else:
        raise ValueError(stop_when)
    acf_arr = np.array(acf)
    nac = len(acf_arr)
    out = {
        "Nac": float(ndrown),
        "sumacf": float(acf_arr.sum()),
        "meanacf": float(acf_arr.mean()),
    }
    if stop_when != "posDrown":
        out["meanabsacf"] = float(np.mean(np.abs(acf_arr)))
        out["sumabsacf"] = float(np.sum(np.abs(acf_arr)))
    if nac > 5:
        out["ac1"] = autocorr_fourier(acf_arr, 1)
        if np.all(acf_arr > 0):
            out["actau"] = float("nan")
        else:
            from pyhctsa_spark.functions.kernels import first_crossing_ac

            tau_c = int(first_crossing_ac(acf_arr)["firstCrossing"])
            out["actau"] = autocorr_fourier(acf_arr, tau_c)
    else:
        out["ac1"] = float("nan")
        out["actau"] = float("nan")
    dacf = np.diff(acf_arr)
    ddacf = np.diff(dacf)
    extrr = np.flatnonzero(dacf[1:] * dacf[:-1] < 0)
    sdsp = ddacf[extrr] if extrr.size else np.array([])
    out["nminima"] = float(np.sum(sdsp > 0))
    out["meanminima"] = float(np.mean(sdsp[sdsp > 0])) if np.any(sdsp > 0) else float("nan")
    out["nmaxima"] = float(np.sum(sdsp < 0))
    out["meanmaxima"] = float(abs(np.mean(sdsp[sdsp < 0]))) if np.any(sdsp < 0) else float("nan")
    out["nextrema"] = float(len(sdsp))
    out["pextrema"] = float(len(sdsp) / nac) if nac else float("nan")
    # 1-parameter exponential fit exp(-b x) by Gauss-Newton
    if stop_when == "posDrown" and nac >= 4:
        x = np.arange(nac, dtype=np.float64)
        b = 0.5
        for _ in range(100):
            e = np.exp(-b * x)
            r_vec = e - acf_arr
            grad = np.sum(r_vec * (-x) * e)
            hess = np.sum((x * e) ** 2)
            step = grad / hess if hess > 0 else 0.0
            b -= step
            if abs(step) < 1e-12:
                break
        e = np.exp(-b * x)
        out["decayTimescale"] = float(1.0 / b) if b != 0 else float("nan")
        out["fexpacf_r2"] = float(
            1.0 - np.sum((e - acf_arr) ** 2) / np.sum((acf_arr - acf_arr.mean()) ** 2)
        )
        resid = e - acf_arr
        out["fexpacf_stdres"] = float(np.std(resid, ddof=1))
    else:
        out["decayTimescale"] = out["fexpacf_r2"] = out["fexpacf_stdres"] = float("nan")
    return out


def _bspline_basis(x: np.ndarray, knots: np.ndarray, order: int = 4) -> np.ndarray:
    """Cox–de Boor B-spline basis values: B[i, j] = B_j(x_i) for the
    ``len(knots) - order`` normalized B-splines on the given knot vector."""
    t = np.asarray(knots, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    B = np.zeros((len(x), len(t) - 1))
    for j in range(len(t) - 1):
        B[:, j] = (x >= t[j]) & (x < t[j + 1])
    for k in range(2, order + 1):
        Bn = np.zeros((len(x), len(t) - k))
        for j in range(len(t) - k):
            term = np.zeros(len(x))
            d1 = t[j + k - 1] - t[j]
            d2 = t[j + k] - t[j + 1]
            if d1 > 0:
                term += (x - t[j]) / d1 * B[:, j]
            if d2 > 0:
                term += (t[j + k] - x) / d2 * B[:, j + 1]
            Bn[:, j] = term
        B = Bn
    return B


def splinefit3(y: np.ndarray) -> np.ndarray:
    """Least-squares cubic regression spline with three knots at
    (0, floor(N/2)-1, N-1) — the detrender of the C PD_PeriodicityWang
    (Toolboxes/c22/splinefit.c, itself Lundgren's SPLINEFIT specialized
    to 3 breaks / 2 pieces). The basis is the five order-4 B-splines on
    the uniformly-extended knot vector the C builds (breaks mirrored
    outward by the piece spacings); coefficients solve the normal
    equations. Returns the fitted trend."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    b0, b1, b2 = 0.0, float(n // 2 - 1), float(n - 1)
    h0, h1 = b1 - b0, b2 - b1
    knots = np.array(
        [
            b0 - (2 * h1 + h0), b0 - (h1 + h0), b0 - h1,
            b0, b1, b2,
            b2 + h0, b2 + h0 + h1, b2 + 2 * h0 + h1,
        ]
    )
    x = np.arange(n, dtype=np.float64)
    A = _bspline_basis(x, knots, order=4)
    # normal equations, like the C's lsqsolve_sub + gauss elimination
    coef = np.linalg.solve(A.T @ A, A.T @ y)
    return A @ coef


def periodicity_wang(y: np.ndarray) -> dict:
    """Wang periodicity detector. Parity: PD_PeriodicityWang
    (Toolboxes/c22/PD_PeriodicityWang.c via Correlation.py:326-355),
    complete: 3-knot regression-spline detrend (splinefit3), raw
    autocovariance acf[tau] = mean(y_t * y_{t+tau}) to ceil(N/3), strict
    slope-sign peaks/troughs, thresholds
    (0, 0.01, 0.1, 0.2, 1/sqrt(N), 5/sqrt(N), 10/sqrt(N)); the first
    peak with a prior trough, rise >= threshold, and positive value wins;
    default 1 (the C/MATLAB not-found value)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    ths = [0.0, 0.01, 0.1, 0.2, 1 / math.sqrt(N), 5 / math.sqrt(N),
           10 / math.sqrt(N)]
    out = {f"th{k+1}": 1.0 for k in range(7)}
    if N < 4 or not np.isfinite(y).all():
        return out
    ysub = y - splinefit3(y)
    acmax = int(math.ceil(N / 3))
    # acf[i] = raw autocovariance at lag i+1 (cov_mean, stats.c:123-135)
    acf = np.array(
        [np.dot(ysub[: N - tau], ysub[tau:]) / (N - tau)
         for tau in range(1, acmax + 1)]
    )
    slope_in = acf[1:-1] - acf[:-2]
    slope_out = acf[2:] - acf[1:-1]
    # stored as lag values (acf index + 1)
    troughs = np.flatnonzero((slope_in < 0) & (slope_out > 0)) + 2
    peaks = np.flatnonzero((slope_in > 0) & (slope_out < 0)) + 2
    for k, th in enumerate(ths):
        for p in peaks:
            prior = troughs[troughs < p]
            if prior.size == 0:
                continue
            the_peak = acf[p - 1]
            the_trough = acf[prior[-1] - 1]
            if the_peak - the_trough < th:
                continue
            if the_peak < 0:
                continue
            out[f"th{k+1}"] = float(p)
            break
    return out
