"""Entropy-family kernel tests: brute-force cross-checks + known values."""

import math

import numpy as np
import pytest

from pyhctsa_spark.functions import entropy as E

rng = np.random.default_rng(42)
NOISE = rng.standard_normal(300)
SIN = np.sin(np.linspace(0, 12 * np.pi, 400, endpoint=False))


def _sampen_naive(y, M, r):
    """Independent brute-force SampEn (Richman-Moorman)."""
    n = len(y)
    out = {}
    for m in range(M + 1):
        if m == 0:
            B = n * (n - 1) / 2
            A = sum(
                1
                for i in range(n)
                for j in range(i + 1, n)
                if abs(y[i] - y[j]) <= r
            )
        else:
            B = A = 0
            for i in range(n - m):
                for j in range(i + 1, n - m):
                    if max(abs(y[i + k] - y[j + k]) for k in range(m)) <= r:
                        B += 1
                        if max(abs(y[i + k] - y[j + k]) for k in range(m + 1)) <= r:
                            A += 1
        out[m] = -math.log(A / B) if A and B else math.inf
    return out


def test_sample_entropy_vs_bruteforce():
    y = NOISE[:80]
    r = 0.2 * np.std(y, ddof=1)
    got = E.sample_entropy(y, M=2, r=r)
    want = _sampen_naive(y, 2, r)
    for m in range(3):
        assert got[f"sampen{m}"] == pytest.approx(want[m], rel=1e-12)
    assert got["quadSampEn1"] == pytest.approx(want[1] + math.log(2 * r))


def test_sample_entropy_regular_vs_noise():
    r_s = 0.2 * np.std(SIN, ddof=1)
    r_n = 0.2 * np.std(NOISE, ddof=1)
    assert (
        E.sample_entropy(SIN, 2, r_s)["sampen2"]
        < E.sample_entropy(NOISE, 2, r_n)["sampen2"]
    )


def _apen_naive(x, m, rth):
    r = rth * np.std(x, ddof=1)
    phis = []
    for order in (m, m + 1):
        n = len(x) - order + 1
        emb = np.array([x[i : i + order] for i in range(n)])
        cnt = [
            np.sum(np.max(np.abs(emb - emb[i]), axis=1) <= r) for i in range(n)
        ]
        phis.append(np.mean(np.log(np.array(cnt) / n)))
    return phis[0] - phis[1]


def test_approximate_entropy_vs_bruteforce():
    y = NOISE[:120]
    assert E.approximate_entropy(y, 1, 0.2) == pytest.approx(
        _apen_naive(y, 1, 0.2), rel=1e-12
    )


def test_perm_entropy_reference_flavor():
    out = E.perm_entropy_ref(np.arange(50.0), m=3)
    assert out["permEn"] == pytest.approx(0.0)
    out = E.perm_entropy_ref(NOISE, m=3)
    assert 0.9 < out["normPermEn"] <= 1.0
    # bits: uniform over 3! patterns -> log2(6)
    assert out["permEn"] == pytest.approx(math.log2(6), abs=0.15)


def test_shannon_entropy_ms():
    # binary alphabet depth 1 on noise: H ~ ln 2 (equipopulated bins)
    h = E.shannon_entropy_ms(NOISE, 2, 1)
    assert h == pytest.approx(math.log(2), abs=0.01)
    # deeper words of structured series carry less entropy than noise
    assert E.shannon_entropy_ms(SIN, 2, 3) < E.shannon_entropy_ms(NOISE, 2, 3)


def test_distribution_entropy_hist_and_ks():
    u = rng.uniform(0, 1, 5000)
    h = E.distribution_entropy(u, "hist", 10)
    assert h == pytest.approx(0.0, abs=0.08)  # uniform on [0,1]: entropy ~ 0
    g = E.distribution_entropy(NOISE, "ks", 0)
    # the reference's ks formula is -sum(px*ln(px/dx)) over raw density
    # values (NOT the integral) — value-level parity is asserted against
    # the reference's own code in test_reference_parity.py::dist_ent_ks;
    # here just check it is finite and grid-scaled positive
    assert np.isfinite(g)
    d = E.distribution_entropy(NOISE, "hist", 10, olremp=0.02)
    assert np.isfinite(d)


def test_lz_complexity_ordering_and_bounds():
    lin = np.arange(200.0)
    noise = NOISE[:200]
    c_lin = E.lz_complexity(lin, 2)
    c_noise = E.lz_complexity(noise, 2)
    # monotone ramp symbolizes to sorted blocks -> far simpler than noise
    assert c_lin < c_noise
    assert 0 < c_noise < 1.5
    # constant series: the seeded eps tie-break randomizes ranks, so
    # complexity is noise-like (matches the reference's symbolization)
    assert E.lz_complexity(np.zeros(200), 2) > c_lin


def test_lz_symbolization_deterministic():
    y = NOISE[:100]
    assert E.lz_complexity(y, 3) == E.lz_complexity(y, 3)


def test_rpde_periodic_vs_noise():
    p = E.rpde((SIN - SIN.mean()) / SIN.std(), m=2, tau=1, epsilon=0.12)
    n = E.rpde((NOISE - NOISE.mean()) / NOISE.std(), m=2, tau=1, epsilon=0.12)
    assert p["H_norm"] < n["H_norm"]
    assert 0 <= p["H_norm"] <= 1


def test_multiscale_entropy_runs():
    out = E.multiscale_entropy(NOISE.repeat(3), scales=[1, 2, 3])
    assert np.isfinite(out["sampen_s1"])
    assert out["maxSampEn"] >= out["minSampEn"]
