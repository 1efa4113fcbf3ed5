"""Information-theory kernel tests: analytic gaussian values, estimator
consistency, AMI-curve statistics."""

import math

import numpy as np
import pytest

from pyhctsa_spark.functions import info as I

rng = np.random.default_rng(7)


def test_digamma_known_values():
    # psi(1) = -gamma, psi(2) = 1 - gamma, psi(0.5) = -gamma - 2 ln 2
    gamma = 0.5772156649015329
    assert I.digamma(1.0) == pytest.approx(-gamma, abs=1e-10)
    assert I.digamma(2.0) == pytest.approx(1 - gamma, abs=1e-10)
    assert I.digamma(0.5) == pytest.approx(-gamma - 2 * math.log(2), abs=1e-10)


def test_gaussian_mi_analytic():
    # bivariate gaussian with known rho: MI = -0.5 ln(1-rho^2)
    n = 200_000
    rho = 0.6
    x = rng.standard_normal(n)
    y = rho * x + math.sqrt(1 - rho**2) * rng.standard_normal(n)
    mi = I.mutual_info(x, y, "gaussian")
    assert mi == pytest.approx(-0.5 * math.log(1 - rho**2), abs=0.01)


def test_ksg_estimator_near_analytic():
    n = 1500
    rho = 0.7
    x = rng.standard_normal(n)
    y = rho * x + math.sqrt(1 - rho**2) * rng.standard_normal(n)
    mi = I.mutual_info(x, y, "kraskov1", extra_param=4)
    assert mi == pytest.approx(-0.5 * math.log(1 - rho**2), abs=0.1)
    # independent data -> ~0
    assert I.mutual_info(x, rng.standard_normal(n), "kraskov1") == pytest.approx(
        0.0, abs=0.1
    )


def test_histogram_ami_independence_and_dependence():
    x = rng.standard_normal(3000)
    ami0 = I.histogram_ami(x, 0, "even", 10)  # identical -> high
    ami_far = I.histogram_ami(x, 100, "even", 10)  # iid noise -> ~0
    assert ami0 > 1.0
    assert ami_far < 0.05
    # dict form for multiple taus
    d = I.histogram_ami(x, [1, 2, 3], "quantiles", 5)
    assert set(d) == {"ami1", "ami2", "ami3"}


def test_auto_mutual_info_ac_delay_and_list():
    t = np.linspace(0, 20 * np.pi, 600, endpoint=False)
    s = np.sin(t) + 0.1 * rng.standard_normal(600)
    v = I.auto_mutual_info(s, "ac", "gaussian")
    assert np.isfinite(v)
    d = I.auto_mutual_info(s, [1, 5], "gaussian")
    assert d["ami1"] > d["ami5"]


def test_ami_stats_periodic_signal():
    t = np.arange(400)
    s = np.sin(2 * np.pi * t / 25.0)
    out = I.ami_stats(s, max_tau=60, est_method="gaussian")
    # AMI of a period-25 sinusoid has its first extremum near the quarter
    # period (~6.25); fmmi uses the reference's dami-index+1 convention
    assert 5 <= out["fmmi"] <= 8
    # AMI is even in rho, so maxima repeat every HALF period (12.5)
    assert out["modeperiodmax"] == pytest.approx(12.5, abs=1)
    assert 0 <= out["pextrema"] <= 1


def test_compare_min_ami_runs():
    s = np.sin(2 * np.pi * np.arange(200) / 20.0) + 0.05 * rng.standard_normal(200)
    out = I.compare_min_ami(s, "even", [4, 6, 8, 10])
    assert out["min"] <= out["median"] <= out["max"]
    assert 0 < out["modef"] <= 1


def test_first_min_ac_vs_mi_sinusoid():
    s = np.sin(2 * np.pi * np.arange(300) / 30.0)
    fm_ac = I.first_min(s, "ac")
    assert 13 <= fm_ac <= 17  # half period
    fm_mi = I.first_min(s + 0.05 * rng.standard_normal(300), "mi", max_tau=40)
    assert 5 <= fm_mi <= 20


def test_rm_information_positive_for_dependence():
    x = rng.standard_normal(1000)
    s = np.cumsum(x)  # strongly autocorrelated
    assert I.rm_information(s, 1) > 0.5
    assert abs(I.rm_information(x, 5)) < 0.1


def test_kernel_estimator_sane():
    n = 2000
    rho = 0.8
    x = rng.standard_normal(n)
    y = rho * x + math.sqrt(1 - rho**2) * rng.standard_normal(n)
    mi = I.mutual_info(x, y, "kernel")
    assert 0.2 < mi < 1.5  # box-kernel estimate in a plausible band


def test_ksg2_estimator_near_analytic_and_brute_force():
    """KSG-2 (reference 'kraskov2' via JIDT, Information.py:411-487):
    near-analytic MI on correlated gaussians / AR(1), ~0 on independent
    data, and exact agreement with a straightforward per-point loop."""
    n = 1500
    rho = 0.7
    x = rng.standard_normal(n)
    y = rho * x + math.sqrt(1 - rho**2) * rng.standard_normal(n)
    mi = I.mutual_info(x, y, "kraskov2", extra_param=4)
    assert mi == pytest.approx(-0.5 * math.log(1 - rho**2), abs=0.1)
    assert I.mutual_info(x, rng.standard_normal(n), "kraskov2") == pytest.approx(
        0.0, abs=0.1
    )
    # AR(1) time-delayed AMI: lag-1 MI of a gaussian AR(1) is the
    # gaussian MI at correlation phi
    phi = 0.8
    ar = np.empty(2000)
    ar[0] = rng.standard_normal()
    for t in range(1, len(ar)):
        ar[t] = phi * ar[t - 1] + math.sqrt(1 - phi**2) * rng.standard_normal()
    ami = I.auto_mutual_info(ar, 1, "kraskov2")
    assert ami == pytest.approx(-0.5 * math.log(1 - phi**2), abs=0.12)
    # brute-force per-point loop on a small sample must agree exactly
    k = 3
    xs, ys = x[:80], y[:80]
    m = len(xs)
    tot = 0.0
    for i in range(m):
        dxi = np.abs(xs - xs[i])
        dyi = np.abs(ys - ys[i])
        dzi = np.maximum(dxi, dyi)
        dzi[i] = np.inf
        nn = np.argsort(dzi)[:k]
        ex, ey = dxi[nn].max(), dyi[nn].max()
        nx = int((dxi <= ex).sum()) - 1
        ny = int((dyi <= ey).sum()) - 1
        tot += I.digamma(nx) + I.digamma(ny)
    want = I.digamma(k) - 1.0 / k + I.digamma(m) - tot / m
    got = I.mutual_info(xs, ys, "kraskov2", extra_param=k)
    assert got == pytest.approx(want, abs=1e-12)
