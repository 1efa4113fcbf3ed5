"""Symbolic-dynamics kernels (reference Operations/Symbolic.py).

Coarse-graining alphabets, motif statistics, lagged transition matrices
(with Fourier resampling for tau > 1, matching scipy.signal.resample
semantics), the seeded Surprise information-gain op, and the
(intentionally quirky) BinaryStretch statistic.
"""

from __future__ import annotations

import math

import numpy as np

from pyhctsa_spark.functions.kernels import first_crossing_ac, quantile_hazen

__all__ = [
    "coarse_grain",
    "motif_three",
    "transition_matrix",
    "surprise",
    "binary_stretch",
    "fourier_resample",
]


def coarse_grain(y: np.ndarray, howtocg: str, num_groups) -> np.ndarray:
    """Symbolize a series to ints 1..k. Parity: CoarseGrain
    (Symbolic.py:650-750): 'quantile' hazen-threshold alphabet, 'updown'
    (quantile of diffs), 'embed2quadrants'/'embed2octants' angular
    alphabets in the (y_t, y_{t+tau}) plane (tau='tau' -> first ACF
    zero-crossing; capped at N/25)."""
    y = np.asarray(y, dtype=np.float64)
    N = len(y)
    if howtocg == "updown":
        y = np.diff(y)
        N -= 1
        howtocg = "quantile"
    if howtocg == "quantile":
        k = int(num_groups)
        th = np.quantile(y, np.linspace(0, 1, k + 1), method="hazen")
        th[0] -= 1.0
        yth = np.zeros(N, dtype=np.int64)
        for i in range(k):
            yth[(y > th[i]) & (y <= th[i + 1])] = i + 1
    elif howtocg in ("embed2quadrants", "embed2octants"):
        if num_groups == "tau":
            tau = int(first_crossing_ac(y)["firstCrossing"])
        else:
            tau = int(num_groups)
        if tau > N / 25:
            tau = N // 25
        tau = max(tau, 1)
        m1, m2 = y[:-tau], y[tau:]
        up = m2 >= 0
        q1 = up & (m1 >= 0)
        q2 = up & (m1 < 0)
        q3 = ~up & (m1 < 0)
        q4 = ~up & (m1 >= 0)
        yth = np.zeros(len(m1), dtype=np.int64)
        if howtocg == "embed2quadrants":
            yth[q1], yth[q2], yth[q3], yth[q4] = 1, 2, 3, 4
        else:
            yth[q1 & (m2 < m1)] = 1
            yth[q1 & (m2 >= m1)] = 2
            yth[q2 & (m2 >= -m1)] = 3
            yth[q2 & (m2 < -m1)] = 4
            yth[q3 & (m2 >= m1)] = 5
            yth[q3 & (m2 < m1)] = 6
            yth[q4 & (m2 < -m1)] = 7
            yth[q4 & (m2 >= -m1)] = 8
    else:
        raise ValueError(howtocg)
    if np.any(yth == 0):
        raise ValueError("some values were not assigned to a group")
    return yth


def _word_entropy(p: np.ndarray) -> float:
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def motif_three(y: np.ndarray, cg_how: str = "quantile") -> dict:
    """3-letter motif probabilities/entropies for words of length 1-4.

    Parity: SB_MotifThree (Symbolic.py:296-400) including its windowed
    denominators (N-1, N-2, N-3) and letter naming a/b/c.
    """
    y = np.asarray(y, dtype=np.float64)
    if cg_how == "quantile":
        yt = coarse_grain(y, "quantile", 3)
    elif cg_how == "diffquant":
        yt = coarse_grain(np.diff(y), "quantile", 3)
    else:
        raise ValueError(cg_how)
    N = len(yt)
    out: dict = {}
    sym = yt - 1  # 0..2
    letters = "abc"
    p1 = np.bincount(sym, minlength=3) / N
    for i in range(3):
        out[letters[i]] = float(p1[i])
    out["h"] = _word_entropy(p1)
    for wlen, hkey in ((2, "hh"), (3, "hhh"), (4, "hhhh")):
        L = N - wlen + 1
        code = np.zeros(L, dtype=np.int64)
        for j in range(wlen):
            code = code * 3 + sym[j : j + L]
        counts = np.bincount(code, minlength=3**wlen).astype(np.float64) / L
        # label order: first letter is the slowest-varying index
        for idx in range(3**wlen):
            name = ""
            v = idx
            for _ in range(wlen):
                name = letters[v % 3] + name
                v //= 3
            out[name] = float(counts[idx])
        out[hkey] = _word_entropy(counts)
    return out


def fourier_resample(x: np.ndarray, num: int) -> np.ndarray:
    """FFT-domain resampling (scipy.signal.resample semantics: truncate /
    zero-pad the spectrum, halve the Nyquist bin when splitting)."""
    x = np.asarray(x, dtype=np.float64)
    Nx = len(x)
    X = np.fft.rfft(x)
    M = min(num, Nx)
    nyq = M // 2 + 1
    Y = np.zeros(num // 2 + 1, dtype=complex)
    Y[:nyq] = X[:nyq]
    if M % 2 == 0:
        if num < Nx:
            # downsampling: the new Nyquist bin folds the +-M/2
            # components together (X[M/2] + conj(X[M/2]) = 2 Re)
            Y[M // 2] *= 2.0
        elif num > Nx:
            # upsampling: the old Nyquist energy splits across +-M/2
            Y[M // 2] *= 0.5
    return np.fft.irfft(Y, num) * (float(num) / float(Nx))


def transition_matrix(y: np.ndarray, howtocg: str = "quantile",
                      num_groups: int = 2, tau=1) -> dict:
    """Lagged transition-probability matrix statistics. Parity:
    SB_TransitionMatrix (Symbolic.py:541-649): tau>1 downsamples via
    Fourier resampling (NOT decimation), column-major T element naming,
    trace/symmetry/eigenvalue/covariance summaries."""
    y = np.asarray(y, dtype=np.float64)
    if tau == "ac":
        tau = int(first_crossing_ac(y)["firstCrossing"])
    if tau > 1:
        y = fourier_resample(y, int(math.ceil(len(y) / tau)))
    N = len(y)
    yth = coarse_grain(y, howtocg, num_groups)
    k = num_groups
    T = np.zeros((k, k))
    prev = yth[:-1]
    nxt = yth[1:]
    for i in range(k):
        sel = nxt[prev == i + 1]
        for j in range(k):
            T[i, j] = np.sum(sel == j + 1)
    T = T / (N - 1)
    out: dict = {}
    if k in (2, 3):
        flat = T.T.flatten()  # column-major, matching MATLAB
        for i, v in enumerate(flat):
            out[f"T{i+1}"] = float(v)
    else:
        for i in range(k):
            out[f"TD{i+1}"] = float(T[i, i])
    out["ondiag"] = float(np.trace(T))
    out["stddiag"] = float(np.std(np.diag(T), ddof=1))
    out["symdiff"] = float(np.sum(np.abs(T - T.T)))
    out["symsumdiff"] = float(np.sum(np.tril(T, -1)) - np.sum(np.triu(T, 1)))
    eig = np.linalg.eigvals(T)
    out["stdeig"] = float(np.std(eig, ddof=1).real)
    out["maxeig"] = float(np.max(eig.real))
    out["mineig"] = float(np.min(eig.real))
    out["maximeig"] = float(np.max(eig.imag))
    covT = np.cov(T.T)
    out["sumdiagcov"] = float(np.trace(covT))
    eigc = np.linalg.eigvals(covT)
    out["stdeigcov"] = float(np.std(eigc, ddof=1).real)
    out["maxeigcov"] = float(np.max(eigc.real))
    return out


def surprise(y: np.ndarray, what_prior: str = "dist", memory: float = 0.2,
             num_groups: int = 3, cg_method: str = "quantile",
             num_iters: int = 500, random_seed: int = 0) -> dict:
    """Information gained from each next symbol given a finite memory.

    Parity: FC_Surprise (Symbolic.py:11-137) including the legacy seeded
    sampling (np.random.seed + permutation) and the quirk that unused
    store slots contribute zero information to the summary statistics.
    """
    y = np.asarray(y, dtype=np.float64)
    if 0 < memory < 1:
        memory = int(round(memory * len(y)))
    memory = int(memory)
    yth = coarse_grain(y, cg_method, num_groups)
    N = len(yth)
    np.random.seed(random_seed)
    rs = np.random.permutation(N - memory) + memory
    rs = np.sort(rs[: min(num_iters, len(rs) - 1)])
    store = np.zeros(num_iters)
    for i, t in enumerate(rs):
        mem = yth[t - memory : t]
        if what_prior == "dist":
            p = np.sum(mem == yth[t]) / memory
        elif what_prior == "T1":
            inmem = np.flatnonzero(mem[:-1] == yth[t - 1])
            p = float(np.mean(mem[inmem + 1] == yth[t])) if inmem.size else 0.0
        elif what_prior == "T2":
            inmem1 = np.flatnonzero(mem[1:-1] == yth[t - 1])
            inmem2 = np.flatnonzero(mem[inmem1] == yth[t - 2])
            p = (
                float(np.sum(mem[inmem2 + 2] == yth[t]) / len(inmem2))
                if inmem2.size
                else 0.0
            )
        else:
            raise ValueError(what_prior)
        store[i] = p
    store[store == 0] = 1.0
    store = -np.log(store)
    pos = store[store > 0]
    out = {
        "min": float(pos.min()) if pos.size else float("nan"),
        "max": float(store.max()),
        "mean": float(store.mean()),
        "sum": float(store.sum()),
        "median": float(np.median(store)),
        "lq": quantile_hazen(store, 0.25),
        "uq": quantile_hazen(store, 0.75),
        "std": float(store.std(ddof=1)),
    }
    out["tstat"] = (
        float(abs((out["mean"] - 1) / (out["std"] / math.sqrt(num_iters))))
        if out["std"] != 0
        else float("nan")
    )
    return out


def binary_stretch(x: np.ndarray, stretch_what: str = "lseq1") -> float:
    """The reference's (mislabeled) stretch-length statistic of 0/1 runs
    — ported bug-for-bug. Parity: SB_BinaryStretch (Symbolic.py:401-457)."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    b = np.where(x > 0, 1, 0)
    target = 1 if stretch_what == "lseq1" else 0
    idx = np.flatnonzero(b == target)
    if idx.size < 2:
        return 0.0
    diffs = np.diff(idx) - 1.5
    sign_changes = np.flatnonzero(diffs[1:] * diffs[:-1] < 0)
    if sign_changes.size > 1:
        return float(np.max(np.diff(sign_changes)) / N)
    return 0.0
