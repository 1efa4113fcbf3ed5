"""Spectral kernels (reference Operations/Spectral.py, SP_Summaries).

Full power-spectral-density summary statistics over the single-sided
FFT (or Welch) estimate in angular-frequency space, with native
implementations of MATLAB-style findpeaks, peak prominences and widths
(scipy.signal semantics), and MATLAB ``buffer`` segmentation.
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.kernels import (
    ac_fourier_2d,
    acf_fourier_full,
    moments,
    point_of_crossing,
)

__all__ = ["spectral_summaries", "matlab_buffer", "find_peaks_full"]


def matlab_buffer(
    x: np.ndarray, n: int, p: int = 0, opt: str | None = None
) -> np.ndarray:
    """MATLAB buffer(x, n, p): n x ncols column-major segments with
    p-sample overlap, zero-padded tail (make_mat_buffer semantics,
    utils.py:322-379, both the p=0 and overlap paths).

    Default opt (None) prefixes p zeros (column 0 = [zeros(p), x[:n-p]]);
    'nodelay' starts filling immediately (column 0 = x[:n]). Column j
    then advances by step = n - p real samples, carrying the previous
    column's last p values.
    """
    x = np.asarray(x, dtype=np.float64)
    if opt not in (None, "nodelay"):
        raise ValueError(f"{opt} not implemented")
    N = len(x)
    step = n - p
    if step <= 0:
        raise ValueError("overlap must be smaller than the window")
    if opt == "nodelay":
        if N <= n:  # single short column, no tail padding (reference loop)
            return x[:, None].copy()
        base = x
        ncols = 1 + max(0, int(math.ceil((N - n) / step)))
    else:
        if N <= step:  # single short column: [zeros(p), x], unpadded
            return np.concatenate([np.zeros(p), x])[:, None]
        base = np.concatenate([np.zeros(p), x]) if p else x
        ncols = max(1, int(math.ceil(N / step)))
    total = (ncols - 1) * step + n
    if total > len(base):
        base = np.concatenate([base, np.zeros(total - len(base))])
    idx = np.arange(n)[None, :] + step * np.arange(ncols)[:, None]
    return base[idx].T


def _local_maxima(S: np.ndarray) -> np.ndarray:
    # reference Spectral.py:326-331: STRICT local maxima only
    # (S[i] > S[i-1] and S[i] > S[i+1]; plateau edges excluded)
    return np.flatnonzero(
        (S[1:-1] > S[:-2]) & (S[1:-1] > S[2:])
    ) + 1


def _enforce_min_dist(idx: np.ndarray, height: np.ndarray, min_dist: int) -> np.ndarray:
    """Greedy MATLAB findpeaks 'MinPeakDistance' (reference
    Spectral.py:340-369): process peaks by DESCENDING height and delete
    every other surviving peak within distance <= min_dist (inclusive)."""
    if min_dist <= 0 or idx.size == 0:
        return idx
    order = np.argsort(height)[::-1]
    keep = np.ones(len(idx), dtype=bool)
    for o in order:
        if not keep[o]:
            continue
        for o2 in range(len(idx)):
            if o2 != o and keep[o2] and abs(idx[o2] - idx[o]) <= min_dist:
                keep[o2] = False
    return idx[keep]


def _prominences(S: np.ndarray, peaks: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Peak prominences + left/right base indices (scipy semantics)."""
    proms = np.empty(len(peaks))
    lbases = np.empty(len(peaks), dtype=np.int64)
    rbases = np.empty(len(peaks), dtype=np.int64)
    for k, p in enumerate(peaks):
        h = S[p]
        # walk left until a higher point or the edge
        i = p - 1
        lmin = h
        lbase = p
        while i >= 0 and S[i] <= h:
            if S[i] < lmin:
                lmin = S[i]
                lbase = i
            i -= 1
        # walk right
        i = p + 1
        rmin = h
        rbase = p
        while i < len(S) and S[i] <= h:
            if S[i] < rmin:
                rmin = S[i]
                rbase = i
            i += 1
        proms[k] = h - max(lmin, rmin)
        lbases[k] = lbase
        rbases[k] = rbase
    return proms, lbases, rbases


def _widths(S: np.ndarray, peaks: np.ndarray, proms: np.ndarray,
            lbases: np.ndarray, rbases: np.ndarray) -> np.ndarray:
    """Peak widths at half prominence with linear interpolation
    (scipy.signal.peak_widths rel_height=0.5 semantics)."""
    widths = np.empty(len(peaks))
    for k, p in enumerate(peaks):
        href = S[p] - 0.5 * proms[k]
        # left crossing
        i = p
        while i > lbases[k] and S[i] > href:
            i -= 1
        if S[i] > href:
            left = float(i)
        else:
            left = i + (href - S[i]) / (S[i + 1] - S[i]) if S[i + 1] != S[i] else float(i)
        # right crossing
        i = p
        while i < rbases[k] and S[i] > href:
            i += 1
        if S[i] > href:
            right = float(i)
        else:
            right = i - (href - S[i]) / (S[i - 1] - S[i]) if S[i - 1] != S[i] else float(i)
        widths[k] = right - left
    return widths


def find_peaks_full(S: np.ndarray, min_pk_dist: int = 0):
    """(heights, locs, widths, prominences), sorted by descending height
    (the reference's _findpeaks(sort_str='descend'), Spectral.py:306-389)."""
    idx = _local_maxima(S)
    idx = _enforce_min_dist(idx, S[idx], int(min_pk_dist))
    proms, lb, rb = _prominences(S, idx)
    widths = _widths(S, idx, proms, lb, rb)
    order = np.argsort(S[idx])[::-1]
    return S[idx][order], idx[order], widths[order], proms[order]


def spectral_summaries(y: np.ndarray, psd_meth: str = "fft",
                       window_type: str = "none") -> dict:
    """Statistics of the power spectrum. Parity: SP_Summaries
    (Spectral.py:9-305): single-sided PSD in angular-frequency space
    (S = 2|FFT|^2 / (2 pi Ny), NFFT = next pow2), peak statistics,
    distributional moments, cumulative-spectrum quantile widths,
    quadratic cumsum fit, spectral Shannon entropy, SFM, band powers
    with StatAv bands, and relative-level crossings."""
    y = np.asarray(y, dtype=np.float64)
    ny = len(y)
    nfft = 2 ** int(math.ceil(math.log2(ny)))
    if psd_meth == "fft":
        f = 0.5 * np.linspace(0, 1, nfft // 2 + 1)
        w = 2 * np.pi * f
        F = np.fft.fft(y, nfft)
        S = 2.0 * np.abs(F[: nfft // 2 + 1]) ** 2 / ny / (2 * np.pi)
    elif psd_meth == "welch":
        # Welch with non-overlapping segments of the chosen window
        if window_type in ("none", "rect", "boxcar"):
            win = np.ones(ny)
        elif window_type == "hamming":
            win = np.hamming(ny)
        elif window_type == "hann":
            win = np.hanning(ny)
        elif window_type == "bartlett":
            win = np.bartlett(ny)
        else:
            raise ValueError(window_type)
        seg = y * win
        F = np.fft.rfft(seg, nfft)
        scale = 1.0 / (win @ win)
        Sfull = (np.abs(F) ** 2) * scale
        Sfull[1:-1] *= 2.0
        S = Sfull / (2 * np.pi)
        w = 2 * np.pi * 0.5 * np.linspace(0, 1, nfft // 2 + 1)
    else:
        raise ValueError(psd_meth)
    if not np.any(np.isfinite(S)):
        return {"maxS": float("nan")}
    with np.errstate(divide="ignore"):
        logS = np.log(S)
    N = len(S)
    dw = w[1] - w[0]
    out: dict = {}
    i_max = int(np.argmax(S))
    out["maxS"] = float(S[i_max])
    out["maxw"] = float(w[i_max])
    right = np.flatnonzero(S[i_max + 1 :] < out["maxS"])
    left = np.flatnonzero(S[:i_max] < out["maxS"])
    if right.size and left.size:
        out["maxWidth"] = float(w[i_max + 1 + right[0]] - w[left[-1]])
    else:
        out["maxWidth"] = 0.0

    # peaks with MATLAB-style minimum distance 0.02 rad
    pts_per_w = N / np.pi
    min_dist = int(math.ceil(0.02 * pts_per_w))
    pk_h, pk_i, pk_w, pk_p = find_peaks_full(S, min_dist)
    if pk_h.size:
        pk_width = pk_w / pts_per_w
        pk_loc = pk_i / pts_per_w
        out["numPeaks"] = float(len(pk_h))
        for thr in (1, 2, 5):
            out[f"numPromPeaks_{thr}"] = float(np.sum(pk_p > thr))
        out["numPeaks_overmean"] = float(np.sum(pk_p > pk_p.mean()))
        out["maxProm"] = float(pk_p.max())
        sel2 = pk_p > 2
        out["meanProm_2"] = float(pk_p[sel2].mean()) if sel2.any() else float("nan")
        out["meanPeakWidth_prom2"] = float(pk_width[sel2].mean()) if sel2.any() else float("nan")
        out["width_weighted_prom"] = float((pk_width * pk_p).sum() / pk_p.sum())
        nn = lambda x: np.arange(0, min(x, len(pk_h) - 1))  # noqa: E731
        out["peakPower_2"] = float((pk_h[nn(2)] * pk_width[nn(2)]).sum())
        out["peakPower_5"] = float((pk_h[nn(5)] * pk_width[nn(5)]).sum())
        out["peakPower_prom2"] = float((pk_h[sel2] * pk_width[sel2]).sum())
        out["w_weighted_peak_prom"] = float((pk_loc * pk_p).sum() / pk_p.sum())
        out["w_weighted_peak_height"] = float((pk_loc * pk_h).sum() / pk_h.sum())
        peak_power = pk_h * pk_width
        cs = np.cumsum(peak_power)
        cross = np.flatnonzero(cs > 0.5 * peak_power.sum())
        out["numPeaks_50power"] = float(cross[0]) if cross.size else float("nan")
        out["peakpower_1"] = float(peak_power[0] / peak_power.sum())
    else:
        for k in ("numPeaks", "maxProm", "width_weighted_prom"):
            out[k] = float("nan")

    # distribution of S
    q25 = np.quantile(S, 0.25, method="hazen")
    q75 = np.quantile(S, 0.75, method="hazen")
    out["iqr"] = float(q75 - q25)
    out["logiqr"] = float(
        np.quantile(logS, 0.75, method="hazen") - np.quantile(logS, 0.25, method="hazen")
    )
    out["q25"] = float(q25)
    out["median"] = float(np.median(S))
    out["q75"] = float(q75)
    out["std"] = float(np.std(S, ddof=1))
    out["stdlog"] = float(np.log(out["std"]))
    out["logstd"] = float(np.std(logS, ddof=1))
    out["mean"] = float(np.mean(S))
    out["logmean"] = float(np.mean(logS))
    for i in range(3, 6):
        out[f"mom{i}"] = moments(S, i)
    acs = ac_fourier_2d(S[None, :], [1, 2, 3, 4])[0]
    out["ac1"], out["ac2"] = float(acs[0]), float(acs[1])
    out["tau"] = point_of_crossing(acf_fourier_full(S), 0.0)[1] - 1.0

    # cumulative spectrum shape
    csS = np.cumsum(S)

    def frac_w(fr: float) -> float:
        return float(w[np.flatnonzero(csS >= csS[-1] * fr)[0]])

    for fr, name in ((0.05, "wmax_5"), (0.1, "wmax_10"), (0.25, "wmax_25"),
                     (0.5, "centroid"), (0.75, "wmax_75"), (0.9, "wmax_90"),
                     (0.95, "wmax_95"), (0.99, "wmax_99")):
        out[name] = frac_w(fr)
    out["w10_90"] = out["wmax_90"] - out["wmax_10"]
    out["w25_75"] = out["wmax_75"] - out["wmax_25"]
    a, b, c = np.polyfit(w, csS, 2)
    out["fpoly2csS_p1"], out["fpoly2csS_p2"], out["fpoly2csS_p3"] = (
        float(a), float(b), float(c),
    )
    resid = (a * w**2 + b * w + c) - csS
    sse = float((resid**2).sum())
    out["fpoly2_sse"] = sse
    out["fpoly2_r2"] = float(1 - sse / np.sum((csS - csS.mean()) ** 2))

    with np.errstate(invalid="ignore"):
        h = -S * np.log(S)
    out["spect_shann_ent"] = float(np.nansum(h))
    out["spect_shann_ent_norm"] = float(np.nanmean(h))
    out["sfm"] = float(10 * np.log10(np.exp(np.mean(logS)) / S.mean()))
    out["areatopeak"] = float(S[: i_max + 1].sum() * dw)
    out["ylogareatopeak"] = float(logS[: i_max + 1].sum() * dw)

    # band powers + StatAv over 2..5 bands
    for nb in (2, 3, 4, 5):
        split = matlab_buffer(S, int(np.floor(N / nb)))[:, :nb]
        for j in range(nb):
            with np.errstate(divide="ignore"):
                out[f"area_{nb}_{j+1}"] = float(split[:, j].sum() * dw)
                out[f"logarea_{nb}_{j+1}"] = float(np.log(split[:, j]).sum() * dw)
        sd = np.std(S, ddof=1)
        out[f"statav{nb}_m"] = float(np.std(split.mean(axis=0), ddof=1) / sd)
        out[f"statav{nb}_s"] = float(np.std(split.std(axis=0, ddof=1), ddof=1) / sd)

    def ncross(fr: float) -> float:
        z = S - fr * S.max()
        return float(np.sum(z[1:] * z[:-1] < 0))

    out["ncross_f01"] = ncross(0.1)
    out["ncross_f02"] = ncross(0.2)
    out["ncross_f05"] = ncross(0.5)
    return out
