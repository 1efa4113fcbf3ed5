"""Wavelet kernels (reference Operations/Wavelet.py) — pure-numpy DWT /
CWT (pywt is not available on executors; filter banks and algorithms are
the standard published ones).

Supported wavelets: db1..db4, sym2..sym4 (orthogonal Daubechies /
Symlet filter banks, public constants). DWT uses pywt-compatible
'symmetric' edge extension; wrcoef reconstructs a single detail branch
with MATLAB-style upsconv (odd-position upsampling, full convolution,
center crop). CWT follows the pywt algorithm: convolve with the
reversed, scale-resampled integral of psi (from the cascade algorithm)
and differentiate.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "Wavelet",
    "dwt",
    "wavedec",
    "wrcoef",
    "dwt_max_level",
    "cwt",
    "cwt_features",
    "detail_coeffs",
    "wl_coeffs",
]

# reconstruction low-pass filters (sum = sqrt(2)); public constants
_REC_LO = {
    "db1": [0.7071067811865476, 0.7071067811865476],
    "db2": [0.48296291314469025, 0.836516303737469, 0.22414386804185735,
            -0.12940952255092145],
    "db3": [0.3326705529509569, 0.8068915093133388, 0.4598775021193313,
            -0.13501102001039084, -0.08544127388224149, 0.035226291882100656],
    "db4": [0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
            -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
            0.032883011666982945, -0.010597401784997278],
    "sym4": [0.03222310060404270, -0.012603967262037833, -0.09921954357684722,
             0.29785779560527736, 0.8037387518059161, 0.49761866763201545,
             -0.02963552764599851, -0.07576571478927333],
}
_REC_LO["sym2"] = _REC_LO["db2"]  # sym2 == db2
_REC_LO["sym3"] = _REC_LO["db3"]  # sym3 == db3
_SYMMETRY = {w: "asymmetric" for w in ("db1", "db2", "db3", "db4")}
_SYMMETRY.update({w: "near symmetric" for w in ("sym2", "sym3", "sym4")})


class Wavelet:
    def __init__(self, name: str) -> None:
        if name not in _REC_LO:
            raise ValueError(f"unsupported wavelet {name}")
        self.name = name
        self.rec_lo = np.array(_REC_LO[name])
        self.dec_lo = self.rec_lo[::-1].copy()
        # QMF relation (verified by perfect-reconstruction brute force):
        # rec_hi[k] = (-1)^k rec_lo[n-1-k]; dec_hi = reverse(rec_hi)
        n = len(self.rec_lo)
        signs = (-1.0) ** np.arange(n)
        self.rec_hi = signs * self.dec_lo
        self.dec_hi = self.rec_hi[::-1].copy()
        self.filt_len = n
        self.symmetry = _SYMMETRY[name]


def _sym_ext(x: np.ndarray, pad: int) -> np.ndarray:
    """'symmetric' (half-point, edge-repeating) extension."""
    left = x[:pad][::-1]
    right = x[-pad:][::-1]
    return np.concatenate([left, x, right])


def dwt(x: np.ndarray, w: Wavelet) -> tuple[np.ndarray, np.ndarray]:
    """Single-level DWT, pywt 'symmetric' semantics: output length
    floor((n + filt_len - 1) / 2)."""
    x = np.asarray(x, dtype=np.float64)
    pad = w.filt_len - 1
    ext = _sym_ext(x, pad)
    a = np.convolve(ext, w.dec_lo, mode="valid")[1::2]
    d = np.convolve(ext, w.dec_hi, mode="valid")[1::2]
    return a, d


def dwt_max_level(n: int, wavelet: str | Wavelet) -> int:
    w = wavelet if isinstance(wavelet, Wavelet) else Wavelet(wavelet)
    if n < w.filt_len - 1 or w.filt_len < 2:
        return 0
    return int(math.floor(math.log2(n / (w.filt_len - 1))))


def wavedec(x: np.ndarray, wavelet: str | Wavelet, level: int) -> tuple[np.ndarray, list[int]]:
    """MATLAB-style (C, L): concatenated [cA_n, cD_n, ..., cD_1] plus a
    lengths vector [len(cA_n), len(cD_n), ..., len(cD_1), N]."""
    w = wavelet if isinstance(wavelet, Wavelet) else Wavelet(wavelet)
    data = np.asarray(x, dtype=np.float64)
    coefs: list[np.ndarray] = []
    lengths: list[int] = [len(data)]
    for _ in range(level):
        data, d = dwt(data, w)
        coefs.append(d)
        lengths.append(len(d))
    coefs.append(data)
    lengths.append(len(data))
    coefs.reverse()
    lengths.reverse()
    return np.concatenate(coefs), lengths


def _detcoef(coefs: np.ndarray, lengths: list[int], level: int) -> np.ndarray:
    """Detail coefficients at a given level from (C, L)."""
    # layout: [cA_n (L[0]) | cD_n (L[1]) | ... | cD_1 (L[-2])], L[-1] = N
    starts = np.cumsum([0] + lengths[:-1])
    # cD_level sits at index len(lengths) - 1 - level
    idx = len(lengths) - 1 - level
    return coefs[starts[idx] : starts[idx] + lengths[idx]]


def _upsconv(x: np.ndarray, f: np.ndarray, s: int) -> np.ndarray:
    y = np.zeros(2 * len(x) + 1)
    y[1::2] = x
    y = np.convolve(y, f, mode="full")
    d = (len(y) - s) / 2.0
    return y[int(math.floor(d)) : len(y) - int(math.ceil(d))]


def wrcoef(coefs: np.ndarray, lengths: list[int], wavelet: str | Wavelet, level: int) -> np.ndarray:
    """Reconstruct the single detail branch at ``level`` to full length
    (MATLAB wrcoef semantics, as used by the reference)."""
    w = wavelet if isinstance(wavelet, Wavelet) else Wavelet(wavelet)
    data = _detcoef(coefs, lengths, level)
    idx = len(lengths) - level
    data = _upsconv(data, w.rec_hi, lengths[idx])
    for k in range(level - 1):
        data = _upsconv(data, w.rec_lo, lengths[idx + k + 1])
    return data


# ---------------------------------------------------------------------------
# CWT via cascade-integrated psi (pywt algorithm)
# ---------------------------------------------------------------------------

def _wavefun(w: Wavelet, precision: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Cascade algorithm: (psi, x) sampled at 2^precision points/unit."""
    phi = np.array([1.0])
    for _ in range(precision):
        up = np.zeros(2 * len(phi))
        up[::2] = phi
        phi = math.sqrt(2.0) * np.convolve(up, w.rec_lo)
    # psi from one high-pass step on the (precision-1)-level phi
    phi_prev = np.array([1.0])
    for _ in range(precision - 1):
        up = np.zeros(2 * len(phi_prev))
        up[::2] = phi_prev
        phi_prev = math.sqrt(2.0) * np.convolve(up, w.rec_lo)
    up = np.zeros(2 * len(phi_prev))
    up[::2] = phi_prev
    psi = math.sqrt(2.0) * np.convolve(up, w.rec_hi)
    x = np.linspace(0, w.filt_len - 1, len(psi))
    return psi, x


def cwt(y: np.ndarray, scales: np.ndarray, wavelet: str | Wavelet,
        precision: int = 10) -> np.ndarray:
    """Continuous wavelet transform, pywt algorithm: coef = -sqrt(a) *
    diff(conv(y, int_psi sampled at scale a, reversed)), center-cropped."""
    w = wavelet if isinstance(wavelet, Wavelet) else Wavelet(wavelet)
    y = np.asarray(y, dtype=np.float64)
    psi, x = _wavefun(w, precision)
    dx = x[1] - x[0]
    int_psi = np.cumsum(psi) * dx
    out = np.empty((len(scales), len(y)))
    for si, a in enumerate(scales):
        j = np.floor(np.arange(a * (x[-1] - x[0]) + 1) / (a * dx)).astype(np.int64)
        j = j[j < len(int_psi)]
        ips = int_psi[j][::-1]
        conv = np.convolve(y, ips)
        coef = -math.sqrt(a) * np.diff(conv)
        d = (len(coef) - len(y)) / 2.0
        lo = int(math.floor(d))
        hi = len(coef) - int(math.ceil(d))
        out[si] = coef[lo:hi]
    return out


# ---------------------------------------------------------------------------
# Feature ops
# ---------------------------------------------------------------------------

def cwt_features(y: np.ndarray, wname: str = "db3", max_scale: int = 32) -> dict:
    """CWT coefficient statistics, 2-D entropy, scale-summed stats, and
    segment stationarity. Parity: WL_cwt (Wavelet.py:8-98)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) > 4096:
        y = y[:4096]  # direct convolution CWT is O(N * scale * support)
    N = len(y)
    w = Wavelet(wname)
    scales = np.arange(1, max_scale + 1)
    coeffs = cwt(y, scales, w)
    S = np.abs(coeffs * coeffs)
    SC = 100.0 * S / S.sum()
    num_entries = SC.size
    all_c = coeffs if w.symmetry == "asymmetric" else -coeffs
    out = {
        "meanC": float(all_c.mean()),
        "meanabsC": float(np.abs(all_c).mean()),
        "medianabsC": float(np.median(np.abs(all_c))),
        "maxabsC": float(np.abs(all_c).max()),
    }
    out["maxonmeanC"] = out["maxabsC"] / out["meanabsC"]
    out["maxonmeanSC"] = float(SC.max() / SC.mean())
    mx = SC.max()

    def pover(x: float) -> float:
        return float(SC[SC > x * mx].sum() / num_entries)

    out["pover99"] = pover(0.99)
    out["pover98"] = pover(0.88)  # reference quirk: key 98, threshold 0.88
    out["pover95"] = pover(0.95)
    out["pover90"] = pover(0.90)
    out["pover80"] = pover(0.80)
    SC_a = SC / SC.sum()
    out["SC_h"] = float(-(SC_a * np.log(SC_a)).sum())
    SSC = SC.sum(axis=0)
    out["max_ssc"] = float(SSC.max())
    out["min_ssc"] = float(SSC.min())
    out["maxonmed_ssc"] = float(SSC.max() / np.median(SSC))
    z = SSC - 0.5 * SSC.max()
    out["pcross_maxssc50"] = float(np.sum(z[1:] * z[:-1] < 0) / (N - 1))
    out["std_ssc"] = float(SSC.std())
    mid = N // 2
    h1, h2 = SC[:, :mid], SC[:, mid:]
    out["stat_2_m_s"] = float(np.mean([h1.std(ddof=1), h2.std(ddof=1)]) / SC.mean())
    out["stat_2_s_m"] = float(np.std([h1.mean(), h2.mean()], ddof=1) / SC.std(ddof=1))
    out["stat_2_s_s"] = float(
        np.std([h1.std(ddof=1), h2.std(ddof=1)], ddof=1) / SC.std(ddof=1)
    )
    parts = np.array_split(SC, 5, axis=1)
    m5 = [p.mean() for p in parts]
    s5 = [p.std(ddof=1) for p in parts]
    for i in range(5):
        out[f"mean5_{i+1}"] = float(m5[i])
        out[f"std5_{i+1}"] = float(s5[i])
    out["stat_5_m_s"] = float(np.mean(s5) / SC.mean())
    out["stat_5_s_m"] = float(np.std(m5, ddof=1) / SC.std(ddof=1))
    out["stat_5_s_s"] = float(np.std(s5, ddof=1) / SC.std(ddof=1))
    return out


def detail_coeffs(y: np.ndarray, wname: str = "db3", maxlevel="max") -> dict:
    """Per-level detail-coefficient magnitude statistics. Parity:
    WL_DetailCoeffs (Wavelet.py:109-191)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    w = Wavelet(wname)
    ml = dwt_max_level(N, w)
    if maxlevel == "max" or maxlevel > ml:
        maxlevel = ml
    if maxlevel < 3:
        raise ValueError("series too short for detail-coefficient sweep")
    means = np.zeros(maxlevel)
    medians = np.zeros(maxlevel)
    maxs = np.zeros(maxlevel)
    for level in range(1, maxlevel + 1):
        c, lens = wavedec(y, w, level)
        det = np.abs(wrcoef(c, lens, w, level))
        means[level - 1] = det.mean()
        medians[level - 1] = np.median(det)
        maxs[level - 1] = det.max()

    def slosr(xx: np.ndarray) -> float:
        k = len(xx)
        vals = np.array([np.sum(xx[: i - 1]) / np.sum(xx[i:]) for i in range(2, k)])
        return float(np.argmin(np.abs(vals - 1)) + 1)

    out = {}
    for name, v in (("mean", means), ("median", medians), ("max", maxs)):
        vs = np.sort(v)[::-1]
        out[f"max_{name}"] = float(vs[0])
        out[f"std_{name}"] = float(np.std(v, ddof=1))
        out[f"wheremax_{name}"] = float(np.argmax(v))
        out[f"max1on2_{name}"] = float(vs[0] / vs[1])
        out[f"wslesr_{name}"] = slosr(v)
    out["corrcoef_max_medians"] = float(np.corrcoef(maxs, medians)[0, 1])
    return out


def wl_coeffs(y: np.ndarray, wname: str = "db3", level=3) -> dict:
    """Sorted detail-coefficient decay statistics. Parity: WL_coeffs
    (Wavelet.py:192-249)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    w = Wavelet(wname)
    ml = dwt_max_level(N, w)
    if level == "max":
        level = ml
    if ml < level:
        raise ValueError("level too large for this wavelet/series")
    c, lens = wavedec(y, w, int(level))
    det = np.abs(wrcoef(c, lens, w, int(level)))
    det_s = np.sort(det)[::-1]
    out = {
        "mean_coeff": float(det_s.mean()),
        "max_coeff": float(det_s.max()),
        "med_coeff": float(np.median(det_s)),
    }

    def where_below(p: float) -> float:
        idx = np.flatnonzero(det_s < p * det_s.max())
        return float(idx[0] / N) if idx.size else float("nan")

    for p, name in ((0.99, "wb99m"), (0.90, "wb90m"), (0.75, "wb75m"),
                    (0.50, "wb50m"), (0.25, "wb25m"), (0.10, "wb10m"),
                    (0.01, "wb1m")):
        out[name] = where_below(p)
    return out
