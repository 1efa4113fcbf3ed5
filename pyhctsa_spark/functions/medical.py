"""Medical / HRV kernels (reference Operations/Medical.py)."""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.helpers import binpicker, histc

__all__ = ["raw_hrv_meas", "hrv_classic", "pnn_set", "polvar"]


def raw_hrv_meas(x: np.ndarray) -> dict:
    """Triangular histogram indices (10/20/sqrt bins via 'nice' edges)
    and Poincare SD1/SD2. Parity: MD_rawHRVmeas (Medical.py:6-70)."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    out = {}
    for name, nb in (("tri10", 10), ("tri20", 20),
                     ("trisqrt", int(math.ceil(math.sqrt(N))))):
        edges = binpicker(float(x.min()), float(x.max()), nb)
        out[name] = float(N / histc(x, edges).max())
    dx = np.diff(x)
    out["SD1"] = float(np.std(dx, ddof=1) / math.sqrt(2) * 1000)
    out["SD2"] = float(
        math.sqrt(max(2 * np.var(x, ddof=1) - 0.5 * np.std(dx, ddof=1) ** 2, 0.0))
        * 1000
    )
    return out


def hrv_classic(y: np.ndarray) -> dict:
    """Classic HRV summaries: pNNx (x/1000 thresholds), LF/HF band
    powers from a Hann periodogram on fs = 2*pi, triangular index, and
    SD1/SD2. Parity: MD_hrv_classic (Medical.py:71-211)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    dy = np.abs(np.diff(y))
    out = {f"pnn{x}": float(np.mean(dy > x / 1000.0)) for x in (5, 10, 20, 30, 40)}
    # periodogram, hanning window, density scaling, fs = 2*pi
    nfft = max(256, 2 ** int(math.ceil(math.log2(N))))
    win = np.hanning(N)
    fs = 2 * np.pi
    P = np.abs(np.fft.rfft(y * win, nfft)) ** 2 / (fs * float(win @ win))
    P[1:-1] *= 2.0
    F = np.fft.rfftfreq(nfft, d=1.0 / fs)
    fbin = F[1] - F[0]
    lfp = fbin * P[(F >= 0.04) & (F <= 0.15)].sum()
    hfp = fbin * P[(F >= 0.15) & (F <= 0.4)].sum()
    vlfp = fbin * P[F <= 0.04].sum()
    total = fbin * P.sum()
    out["lfhf"] = float(lfp / hfp) if hfp > 0 else float("nan")
    out["vlf"] = float(vlfp / total * 100)
    out["lf"] = float(lfp / total * 100)
    out["hf"] = float(hfp / total * 100)
    edges = binpicker(float(y.min()), float(y.max()), 10)
    out["tri"] = float(N / histc(y, edges).max())
    rmssd = np.std(np.diff(y), ddof=1)
    sigma = np.std(y, ddof=1)
    out["SD1"] = float(rmssd / math.sqrt(2) * 1000)
    out["SD2"] = float(math.sqrt(max(2 * sigma**2 - 0.5 * rmssd**2, 0.0)) * 1000)
    return out


def pnn_set(x: np.ndarray) -> dict:
    """pNN5..pNN100 with millisecond scaling. Parity: MD_pNN
    (Medical.py:284-338): note the reference divides by N-1 where
    N = len(x) (not the diff count)."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    Dx = np.abs(np.diff(x)) * 1000
    return {
        f"pnn{t}": float(np.sum(Dx > t) / (N - 1))
        for t in (5, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100)
    }


def polvar(x: np.ndarray, d: float = 1.0, D: int = 6) -> float:
    """POLVARd: probability of D consecutive equal symbols in the
    |diff| >= d binarization, counted with the reference's
    non-overlapping advance-by-D scan. Parity: MD_polvar
    (Medical.py:212-283)."""
    x = np.asarray(x, dtype=np.float64)
    dx = np.abs(np.diff(x))
    N = len(dx)
    xsym = dx >= d
    i = 0
    pc = 0
    while i <= N - D:
        seg = xsym[i : i + D]
        if seg.all() or not seg.any():
            pc += 1
            i += D
        else:
            i += 1
    return float(pc / N)
