"""Additional distributional kernels (reference Operations/Distribution.py:
DN_Mean variants, DN_Fit_mle, DN_pleft, DN_OutlierInclude,
DN_OutlierTest, DN_RemovePoints, DN_HistogramAsymmetry)."""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import binpicker, histc, xcorr
from pyhctsa_spark.functions.kernels import quantile_hazen
from pyhctsa_spark.functions.kernels import acf_fourier_full

__all__ = [
    "mean_types",
    "fit_mle",
    "pleft",
    "outlier_include",
    "outlier_test",
    "remove_points",
    "histogram_asymmetry",
]


def mean_types(y: np.ndarray, mean_type: str = "arithmetic") -> float:
    """Location measures. Parity: DN_Mean (Distribution.py:213-259)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if mean_type in ("norm", "arithmetic"):
        return float(np.mean(y))
    if mean_type == "median":
        return float(np.median(y))
    if mean_type == "geom":
        if np.any(y <= 0):
            return float("nan")
        return float(np.exp(np.mean(np.log(y))))
    if mean_type == "harm":
        return float(N / np.sum(1.0 / y))
    if mean_type == "rms":
        return float(np.sqrt(np.mean(y**2)))
    if mean_type == "iqm":
        lo, hi = quantile_hazen(y, 0.25), quantile_hazen(y, 0.75)
        return float(np.mean(y[(y >= lo) & (y <= hi)]))
    if mean_type == "midhinge":
        return float(0.5 * (quantile_hazen(y, 0.25) + quantile_hazen(y, 0.75)))
    raise ValueError(mean_type)


def fit_mle(y: np.ndarray, fit_what: str = "gaussian") -> dict | float:
    """MLE distribution fits. Parity: DN_Fit_mle (Distribution.py:285-335):
    gaussian -> (mean, population std); uniform -> (min, max);
    geometric -> p = 1/(1+mean)."""
    y = np.asarray(y, dtype=np.float64)
    if fit_what == "gaussian":
        return {"mean": float(y.mean()), "std": float(y.std(ddof=0))}
    if fit_what == "uniform":
        return {"a": float(y.min()), "b": float(y.max())}
    if fit_what == "geometric":
        return float(1.0 / (1.0 + y.mean()))
    raise ValueError(fit_what)


def pleft(y: np.ndarray, th: float = 0.1) -> float:
    """Distance from the mean past which proportion th of data lie,
    over sigma. Parity: DN_pleft (Distribution.py:160-184)."""
    y = np.asarray(y, dtype=np.float64)
    p = quantile_hazen(np.abs(y - y.mean()), 1 - th)
    return float(p / y.std(ddof=1))


def outlier_include(y: np.ndarray, threshold_how: str = "abs", inc: float = 0.01) -> dict:
    """Event-timing statistics vs an outlier-threshold sweep. Parity:
    DN_OutlierInclude (Distribution.py:460-580): sweep thresholds in
    steps of ``inc`` sigma, record inter-event time and position stats,
    trim at the 2%-of-points tail, summarize each curve."""
    y = np.asarray(y, dtype=np.float64)
    if np.all(y == y[0]):
        return {"mdtm": float("nan")}
    N = len(y)
    if threshold_how == "abs":
        thresholds = np.arange(0, np.max(np.abs(y)), inc)
        total = N
    elif threshold_how == "pos":
        thresholds = np.arange(0, y.max(), inc)
        total = int(np.sum(y >= 0))
    elif threshold_how == "neg":
        thresholds = np.arange(0, (-y).max(), inc)
        total = int(np.sum(y <= 0))
    else:
        raise ValueError(threshold_how)
    stats = np.zeros((len(thresholds), 6))
    for i, th in enumerate(thresholds):
        if threshold_how == "abs":
            idx = np.flatnonzero(np.abs(y) >= th)
        elif threshold_how == "pos":
            idx = np.flatnonzero(y >= th)
        else:
            idx = np.flatnonzero(y <= -th)
        dt = np.diff(idx)
        with np.errstate(invalid="ignore", divide="ignore"):
            stats[i, 0] = np.mean(dt) if dt.size else np.nan
            stats[i, 1] = (np.std(dt, ddof=1) / math.sqrt(len(idx))) if dt.size > 1 else np.nan
            stats[i, 2] = len(dt) / total * 100
            stats[i, 3] = (np.median(idx) / (N / 2) - 1) if idx.size else np.nan
            stats[i, 4] = (np.mean(idx) / (N / 2) - 1) if idx.size else np.nan
            stats[i, 5] = (np.std(idx, ddof=1) / math.sqrt(len(idx))) if idx.size > 1 else np.nan
    if np.any(np.isnan(stats[:, 0])):
        first_nan = int(np.argmax(np.isnan(stats[:, 0])))
        if first_nan > 0:
            stats = stats[:first_nan]
    valid = np.flatnonzero(stats[:, 2] > 2.0)
    if valid.size:
        stats = stats[: valid[-1] + 1]
    out = {
        "mdtm": float(np.mean(stats[:, 0])),
        "mdtmd": float(np.median(stats[:, 0])),
        "mdtstd": float(np.std(stats[:, 0], ddof=1)),
        "mdrm": float(np.mean(stats[:, 3])),
        "mdrmd": float(np.median(stats[:, 3])),
        "mdrstd": float(np.std(stats[:, 3], ddof=1)),
        "mrm": float(np.mean(stats[:, 4])),
        "mrmd": float(np.median(stats[:, 4])),
        "mrstd": float(np.std(stats[:, 4], ddof=1)),
    }
    # cross-correlation between mean inter-event time and its std error
    # at lags +-1 (the reference's xcmerr outputs)
    if len(stats) > 2 and np.isfinite(stats[:, :2]).all():
        _, cc = xcorr(stats[:, 0], stats[:, 1], maxlags=1)
        out["xcmerr1"] = float(cc[-1])
        out["xcmerrn1"] = float(cc[0])
    else:
        out["xcmerr1"] = out["xcmerrn1"] = float("nan")
    return out


def outlier_test(y: np.ndarray, p: float = 2.0, just_me: str | None = None):
    """Mean/std of the middle (100-2p)%% of values. Parity:
    DN_OutlierTest (Distribution.py:580-631)."""
    y = np.asarray(y, dtype=np.float64)
    lo = quantile_hazen(y, p / 100.0)
    hi = quantile_hazen(y, 1 - p / 100.0)
    mid = y[(y > lo) & (y < hi)]
    out = {
        "mean": float(mid.mean()),
        "std": float(mid.std(ddof=1) / y.std(ddof=1)),
    }
    if just_me:
        return out[just_me]
    return out


def remove_points(y: np.ndarray, remove_how: str = "absfar", p: float = 0.1,
                  remove_or_saturate: str = "remove") -> dict:
    """Change in ACF/moments after removing or saturating a proportion of
    points. Parity: DN_RemovePoints (Distribution.py:775-880)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if remove_how == "absclose":
        order = np.argsort(np.abs(y), kind="mergesort")[::-1]
    elif remove_how == "absfar":
        order = np.argsort(np.abs(y), kind="mergesort")
    elif remove_how == "min":
        order = np.argsort(y, kind="mergesort")[::-1]
    elif remove_how == "max":
        order = np.argsort(y, kind="mergesort")
    else:
        raise ValueError(remove_how)
    r_keep = np.sort(order[: round(N * (1 - p))])
    if remove_or_saturate == "remove":
        yt = y[r_keep]
    elif remove_or_saturate == "saturate":
        yt = y.copy()
        kept = y[r_keep]
        if remove_how == "max":
            yt[np.setdiff1d(np.arange(N), r_keep)] = kept.max()
        elif remove_how == "min":
            yt[np.setdiff1d(np.arange(N), r_keep)] = kept.min()
        elif remove_how == "absfar":
            yt[yt > kept.max()] = kept.max()
            yt[yt < kept.min()] = kept.min()
        else:
            raise ValueError(f"cannot saturate with '{remove_how}'")
    else:
        raise ValueError(remove_or_saturate)
    acf_y = acf_fourier_full(y)[1:9]
    acf_t = acf_fourier_full(yt)[1:9]
    out = {}
    for i in range(3):
        out[f"ac{i+1}rat"] = float(acf_t[i] / acf_y[i])
        out[f"ac{i+1}diff"] = float(abs(acf_t[i] - acf_y[i]))
    out["sumabsacfdiff"] = float(np.sum(np.abs(acf_t - acf_y)))
    out["mean"] = float(yt.mean())
    out["median"] = float(np.median(yt))
    out["std"] = float(yt.std(ddof=1))

    def _kurt(v):
        vc = v - v.mean()
        return np.mean(vc**4) / np.mean(vc**2) ** 2

    out["kurtosisrat"] = float(_kurt(yt) / _kurt(y))
    return out


def histogram_asymmetry(
    y: np.ndarray, num_bins: int = 10, do_simple: bool = True
) -> dict:
    """Asymmetries between the positive and negative histogram halves.
    Parity: DN_HistogramAsymmetry (Distribution.py:683-739), complete:
    separate histograms of the positive and negative values
    (linearly-spaced bins when ``do_simple``, MATLAB 'nice' binpicker
    edges otherwise), probabilities normalized by the count of nonzero
    values; densityDiff is the (integer) count difference, mode
    positions average ties, and modeAsymmetry = posMode + negMode."""
    y = np.asarray(y, dtype=np.float64)
    yp = y[y > 0]
    yn = y[y < 0]
    if yn.size < 2 or yp.size < 2:
        return {"densityDiff": float("nan")}
    if do_simple:
        counts_pos, edges_pos = np.histogram(
            yp, bins=np.linspace(yp.min(), yp.max(), num_bins + 1)
        )
        counts_neg, edges_neg = np.histogram(
            yn, bins=np.linspace(yn.min(), yn.max(), num_bins + 1)
        )
    else:
        edges_pos = binpicker(float(yp.min()), float(yp.max()), num_bins)
        counts_pos = histc(yp, edges_pos)[:-1]
        edges_neg = binpicker(float(yn.min()), float(yn.max()), num_bins)
        counts_neg = histc(yn, edges_neg)[:-1]
    n_nonzero = np.sum(y != 0)
    pp = counts_pos.astype(np.float64) / n_nonzero
    pn = counts_neg.astype(np.float64) / n_nonzero
    cp = 0.5 * (edges_pos[:-1] + edges_pos[1:])
    cn = 0.5 * (edges_neg[:-1] + edges_neg[1:])
    out = {
        "densityDiff": float(np.sum(y > 0) - np.sum(y < 0)),
        "modeProbPos": float(pp.max()),
        "modeProbNeg": float(pn.max()),
    }
    out["modeDiff"] = out["modeProbPos"] - out["modeProbNeg"]
    out["posMode"] = float(np.mean(cp[pp == out["modeProbPos"]]))
    out["negMode"] = float(np.mean(cn[pn == out["modeProbNeg"]]))
    out["modeAsymmetry"] = out["posMode"] + out["negMode"]
    return out
