"""Heavier stationarity kernels (reference Operations/Stationarity.py:
SY_DynWin, SY_LocalDistributions, SY_LocalExtrema) and the
pre-processing comparison op (PP_Compare with a native median filter)."""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.entropy import sample_entropy
from pyhctsa_spark.functions.helpers import gaussian_kde_eval
from pyhctsa_spark.functions.kernels import (
    autocorr_fourier,
    first_crossing_ac,
    stat_av,
    sliding_window,
    spread_iqr,
    trend,
)
from pyhctsa_spark.functions.spectral import matlab_buffer

__all__ = [
    "dyn_win",
    "local_distributions",
    "local_extrema",
    "medfilt1",
    "preproc_compare",
]


def _skew(v: np.ndarray) -> float:
    vc = v - v.mean()
    m2 = np.mean(vc**2)
    return float(np.mean(vc**3) / m2**1.5) if m2 > 0 else float("nan")


def _kurt_fisher(v: np.ndarray) -> float:
    vc = v - v.mean()
    m2 = np.mean(vc**2)
    return float(np.mean(vc**4) / m2**2 - 3.0) if m2 > 0 else float("nan")


def dyn_win(y: np.ndarray, max_num_segments: int = 10) -> dict:
    """Stationarity sweep over nseg = 2..max: std across windows of 11
    local features (mean, std, skew, kurtosis, quadSampEn1, AC1, AC2,
    AC at global/local tau, local tau), then std across scales.
    Parity: SY_DynWin (Stationarity.py:88-168)."""
    y = np.asarray(y, dtype=np.float64)
    nsegs = np.arange(2, max_num_segments + 1)
    fs = np.zeros((len(nsegs), 11))
    taug = int(first_crossing_ac(y)["firstCrossing"])
    for i, nseg in enumerate(nsegs):
        wlen = len(y) // nseg
        inc = max(1, wlen)
        steps = int(np.floor((len(y) - wlen) / inc) + 1)
        qs = np.zeros((steps, 11))
        for j in range(steps):
            sub = y[j * inc : j * inc + wlen]
            taul = int(first_crossing_ac(sub)["firstCrossing"])
            qs[j, 0] = sub.mean()
            qs[j, 1] = sub.std(ddof=1)
            qs[j, 2] = _skew(sub)
            qs[j, 3] = _kurt_fisher(sub)
            try:
                qs[j, 4] = sample_entropy(sub, 2, 0.15)["quadSampEn1"]
            except Exception:
                qs[j, 4] = np.nan
            qs[j, 6] = autocorr_fourier(sub, 1)
            qs[j, 7] = autocorr_fourier(sub, 2)
            qs[j, 8] = autocorr_fourier(sub, taug)
            qs[j, 9] = autocorr_fourier(sub, taul)
            qs[j, 10] = taul
        fs[i] = np.std(qs, ddof=1, axis=0)
    f = np.std(fs, ddof=1, axis=0)
    return {
        "stdmean": float(f[0]), "stdstd": float(f[1]), "stdskew": float(f[2]),
        "stdkurt": float(f[3]), "stdsampen1_015": float(f[4]),
        "stdac1": float(f[6]), "stdac2": float(f[7]),
        "stdactaug": float(f[8]), "stdactaul": float(f[9]),
        "stdtaul": float(f[10]),
    }


def local_distributions(y: np.ndarray, num_segs: int = 5, each_or_par: str = "par",
                        num_points: int = 200) -> dict:
    """KDE distribution differences between segments. Parity:
    SY_LocalDistributions (Stationarity.py:13-87)."""
    y = np.asarray(y, dtype=np.float64)
    lseg = len(y) // num_segs
    r = np.linspace(y.min(), y.max(), num_points)
    dns = np.column_stack(
        [gaussian_kde_eval(y[i * lseg : (i + 1) * lseg], r) for i in range(num_segs)]
    )
    if each_or_par in ("par", "parent"):
        par = gaussian_kde_eval(y, r)
        divs = np.array([np.sum(np.abs(dns[:, i] - par)) for i in range(num_segs)])
    elif each_or_par == "each":
        divs = np.array(
            [
                np.sum(np.abs(dns[:, i] - dns[:, j]))
                for i in range(num_segs)
                for j in range(i + 1, num_segs)
            ]
        )
    else:
        raise ValueError(each_or_par)
    return {
        "meandiv": float(divs.mean()),
        "mediandiv": float(np.median(divs)),
        "maxdiv": float(divs.max()),
        "stddiv": float(divs.std()),
    }


def local_extrema(y: np.ndarray, how_to_window: str = "l", n: int | None = None) -> dict:
    """Per-window max/min/extrema statistics. Parity: SY_LocalExtrema
    (Stationarity.py:339-431)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if n is None:
        n = 100 if how_to_window == "l" else 5
    if how_to_window == "l":
        wlen = n
    elif how_to_window == "n":
        wlen = N // n
    elif how_to_window == "tau":
        wlen = int(first_crossing_ac(y)["firstCrossing"])
    else:
        raise ValueError(how_to_window)
    # reference Stationarity.py:385-388: the windowLength guard assigns
    # out = nan but does NOT return (dead code) — the stats are computed
    # even at windowLength 1 (bug-for-bug); only an impossible buffer
    # (wlen < 1) genuinely cannot proceed
    if wlen < 1 or N == 0:
        return {"meanrat": float("nan")}
    buff = matlab_buffer(y, wlen)
    if buff[-1, -1] == 0:
        buff = buff[:, :-1]
    nwin = buff.shape[1]
    loc_max = buff.max(axis=0)
    loc_min = buff.min(axis=0)
    abs_min = np.abs(loc_min)
    ext = loc_max.copy()
    sel = abs_min > loc_max
    ext[sel] = loc_min[sel]
    abs_ext = np.abs(ext)
    return {
        "meanrat": float(loc_max.mean() / abs_min.mean()),
        "medianrat": float(np.median(loc_max) / np.median(abs_min)),
        "minmax": float(loc_max.min()),
        "minabsmin": float(abs_min.min()),
        "minmaxonminabsmin": float(loc_max.min() / abs_min.min()),
        "meanmax": float(loc_max.mean()),
        "meanabsmin": float(abs_min.mean()),
        "meanext": float(ext.mean()),
        "medianmax": float(np.median(loc_max)),
        "medianabsmin": float(np.median(abs_min)),
        "medianext": float(np.median(ext)),
        "stdmax": float(loc_max.std(ddof=1)),
        "stdmin": float(loc_min.std(ddof=1)),
        "stdext": float(ext.std(ddof=1)),
        "zcext": float(np.sum(ext[:-1] * ext[1:] < 0) / nwin),
        "meanabsext": float(abs_ext.mean()),
        "medianabsext": float(np.median(abs_ext)),
        "diffmaxabsmin": float(np.sum(np.abs(loc_max - abs_min)) / nwin),
        "uord": float(np.sum(np.sign(ext)) / nwin),
        "maxmaxmed": float(loc_max.max() / np.median(loc_max)),
        "minminmed": float(loc_min.min() / np.median(loc_min)),
        "maxabsext": float(abs_ext.max() / np.median(abs_ext)),
    }


def medfilt1(x: np.ndarray, k: int) -> np.ndarray:
    """1-D median filter, odd k only, edges padded by REPLICATING the
    first/last sample (the reference's _medfilt1d, PreProcess.py:10-25)."""
    if k % 2 != 1:
        raise ValueError("Median filter length must be odd.")
    x = np.asarray(x, dtype=np.float64)
    pad = (k - 1) // 2
    ext = np.concatenate([np.full(pad, x[0]), x, np.full(pad, x[-1])])
    windows = np.lib.stride_tricks.sliding_window_view(ext, k)
    return np.median(windows, axis=1)


def preproc_compare(y: np.ndarray, detrend_meth: str = "medianf") -> dict:
    """Ratios of stationarity/outlier statistics between a preprocessed
    version and the raw series. Parity: PP_Compare
    (PreProcess.py:31-136), complete output surface:

    detrendings — poly<o> (polynomial-fit residual), diff<n>, medianf<n>
    (the median-FILTERED series, as the reference defines it), rav<n>
    (causal running average, lfilter semantics), resample_<P>_<Q>
    (Fourier-based stand-in for scipy's polyphase resampler — the one
    documented deviation, scipy is absent here).

    outputs — statv{2,4,6,8,10} (StatAv 'seg' ratios),
    swms{w}_{s} / swss{w}_{s} (sliding-window mean/std ratios),
    olbt_{m,s}{2,5} (trimmed-mean / trimmed-std ratios via
    DN_OutlierTest justMe), each as stat(detrended)/stat(raw) on the
    z-scored series.
    """
    from pyhctsa_spark.functions.distribution_extra import outlier_test
    from pyhctsa_spark.functions.kernels import sliding_window, stat_av, zscore

    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    t = np.arange(N, dtype=np.float64)
    if detrend_meth.startswith("poly"):
        deg = int(detrend_meth[4:])
        y_d = y - np.polyval(np.polyfit(t, y, deg), t)
    elif detrend_meth.startswith("diff"):
        n_d = int(detrend_meth[4:])
        y_d = np.diff(y, n=n_d)
    elif detrend_meth.startswith("medianf"):
        k = int(detrend_meth[7:])
        y_d = medfilt1(y, k)
    elif detrend_meth.startswith("rav"):
        k = int(detrend_meth[3:])
        # causal moving average: lfilter(ones(k)/k, 1, y)
        y_d = np.convolve(y, np.ones(k) / k, mode="full")[:N]
    elif detrend_meth.startswith("resample_"):
        from pyhctsa_spark.functions.symbolic import fourier_resample

        _, p_, q_ = detrend_meth.split("_")
        y_d = fourier_resample(y, max(2, len(y) * int(p_) // int(q_)))
    else:
        raise ValueError(detrend_meth)

    if np.all(y_d == 0):
        return {"statv2": float("nan")}
    yz = zscore(y)
    y_dz = zscore(y_d)

    def _safe(num: float, den: float) -> float:
        return float(num / den) if den != 0 and np.isfinite(den) else float("nan")

    out = {}
    for seg in (2, 4, 6, 8, 10):
        out[f"statv{seg}"] = _safe(
            stat_av(y_dz, "seg", seg), stat_av(yz, "seg", seg)
        )
    for win, step in ((2, 2), (5, 1), (5, 2), (10, 1), (10, 2)):
        out[f"swms{win}_{step}"] = _safe(
            sliding_window(y_dz, "mean", "std", win, step),
            sliding_window(yz, "mean", "std", win, step),
        )
    for win, step in ((2, 1), (2, 2), (5, 1), (5, 2), (10, 1), (10, 2)):
        out[f"swss{win}_{step}"] = _safe(
            sliding_window(y_dz, "std", "std", win, step),
            sliding_window(yz, "std", "std", win, step),
        )
    for thresh, method in ((2, "mean"), (5, "mean"), (2, "std"), (5, "std")):
        out[f"olbt_{method[0]}{thresh}"] = _safe(
            outlier_test(y_dz, thresh, method),
            outlier_test(yz, thresh, method),
        )
    return out
