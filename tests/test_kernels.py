"""Kernel unit tests: reference-faithful numpy semantics.

Golden values are derived from the published definitions (cited per
kernel in functions/kernels.py); brute-force re-computations here are
written independently of the kernel implementations.
"""

import math

import numpy as np
import pytest

from pyhctsa_spark.functions import kernels as K

rng = np.random.default_rng(123)
Y = rng.standard_normal(512) * 3.1 + 1.7
SIN = np.sin(np.linspace(0, 10 * np.pi, 999, endpoint=False))


def test_zscore_double_pass():
    z = K.zscore(Y)
    assert abs(z.mean()) < 1e-14
    assert abs(z.std(ddof=1) - 1.0) < 1e-12
    with pytest.raises(ValueError):
        K.zscore(np.ones(10))
    with pytest.raises(ValueError):
        K.zscore(np.array([1.0, np.nan]))


def test_make_buffer_trailing_drop():
    b = K.make_buffer(np.arange(10), 3)
    assert b.shape == (3, 3)
    assert b[2].tolist() == [6, 7, 8]


def test_north_star_scalars():
    assert K.mean_(Y) == pytest.approx(float(np.mean(Y)))
    assert K.variance(Y) == pytest.approx(float(np.var(Y, ddof=1)))
    assert K.spread_std(Y) == pytest.approx(float(np.std(Y, ddof=1)))
    assert K.spread_iqr(Y) == pytest.approx(
        float(
            np.quantile(Y, 0.75, method="hazen") - np.quantile(Y, 0.25, method="hazen")
        )
    )


def test_burstiness_forms():
    b = K.burstiness(Y)
    r = np.std(Y, ddof=1) / np.mean(Y)
    assert b["B"] == pytest.approx((r - 1) / (r + 1))
    n = len(Y)
    bk = (math.sqrt(n + 1) * r - math.sqrt(n - 1)) / (
        (math.sqrt(n + 1) - 2) * r + math.sqrt(n - 1)
    )
    assert b["B_Kim"] == pytest.approx(bk)


def test_autocorr_timedomain_bruteforce():
    for tau in (1, 2, 5):
        y1, y2 = Y[:-tau], Y[tau:]
        expect = np.mean((y1 - y1.mean()) * (y2 - y2.mean())) / (
            y1.std() * y2.std()
        )
        assert K.autocorr_timedomain(Y, tau) == pytest.approx(expect, rel=1e-12)


def test_autocorr_fourier_matches_direct_acov():
    # Fourier estimator (padded Wiener-Khinchin) equals the direct
    # normalized autocovariance sum_{i}(y_i-mu)(y_{i+t}-mu)/sum(y-mu)^2
    yc = Y - Y.mean()
    denom = np.sum(yc * yc)
    for tau in (1, 3, 10):
        direct = np.sum(yc[:-tau] * yc[tau:]) / denom
        assert K.autocorr_fourier(Y, tau) == pytest.approx(direct, rel=1e-9)
    assert K.autocorr_fourier(Y, 0) == pytest.approx(1.0)


def test_ac_sinusoid_known_value():
    # AC of a pure sinusoid ~ cos(2*pi*lag/period); period = 999/5 = 199.8
    assert K.autocorr_fourier(SIN, 50) == pytest.approx(0.0, abs=0.05)
    assert K.autocorr_fourier(SIN, 25) == pytest.approx(
        np.cos(2 * np.pi * 25 / 199.8), abs=0.02
    )
    assert K.autocorr_fourier(SIN, 1) > 0.99


def test_batched_match_scalar_kernels():
    W = K.make_buffer(Y, 64)
    np.testing.assert_allclose(K.mean_2d(W), [np.mean(r) for r in W])
    np.testing.assert_allclose(K.variance_2d(W), [np.var(r, ddof=1) for r in W])
    np.testing.assert_allclose(
        K.iqr_hazen_2d(W), [K.spread_iqr(r) for r in W], rtol=1e-12
    )
    np.testing.assert_allclose(
        K.ac_timedomain_2d(W, 1), [K.autocorr_timedomain(r, 1) for r in W], rtol=1e-10
    )
    np.testing.assert_allclose(
        K.ac_fourier_2d(W, [1, 2])[:, 0],
        [K.autocorr_fourier(r, 1) for r in W],
        rtol=1e-9,
    )
    b, bk = K.burstiness_2d(W)
    per = [K.burstiness(r) for r in W]
    np.testing.assert_allclose(b, [p["B"] for p in per])
    np.testing.assert_allclose(bk, [p["B_Kim"] for p in per])


def test_trev_tc3_theilerq_crinkle():
    t = K.trev(Y, 1)
    d = np.diff(Y)
    assert t["raw"] == pytest.approx(np.mean(d**3) / np.mean(d**2) ** 1.5)
    c = K.tc3(Y, 1)
    n = len(Y)
    num = np.mean(Y[: n - 2] * Y[1 : n - 1] * Y[2:])
    den = abs(np.mean(Y[: n - 2] * Y[1 : n - 1])) ** 1.5
    assert c["raw"] == pytest.approx(num / den)
    q = K.theiler_q(Y)
    s = Y[:-1] + Y[1:]
    assert q == pytest.approx(np.mean(s**3) / np.mean(Y**2) ** 1.5)
    assert np.isfinite(K.crinkle(Y))


def test_stat_av_equals_sliding_window_mean_std():
    # SY_SlidingWindow(y,'mean','std',X,1) == SY_StatAv(y,'seg',X)
    # (Stationarity.py:911)
    for nseg in (4, 5, 8):
        assert K.sliding_window(Y, "mean", "std", nseg, 1) == pytest.approx(
            K.stat_av(Y, "seg", nseg), rel=1e-12
        )


def test_trend_slope_matches_polyfit():
    t = K.trend(Y)
    # reference fits against the MATLAB-style 1..N axis
    coef = np.polyfit(np.arange(1, len(Y) + 1), Y, 1)
    assert t["gradient"] == pytest.approx(coef[0], rel=1e-8)
    assert t["intercept"] == pytest.approx(coef[1], rel=1e-8)
    yc = np.cumsum(Y)
    coef_c = np.polyfit(np.arange(1, len(Y) + 1), yc, 1)
    assert t["gradientYC"] == pytest.approx(coef_c[0], rel=1e-8)
    assert t["meanYC12"] == pytest.approx(np.mean(yc[: len(Y) // 2]), rel=1e-10)


def test_perm_entropy_bounds_and_monotone_signal():
    assert K.perm_entropy(np.arange(100.0), 3) == pytest.approx(0.0)
    v = K.perm_entropy(Y, 3)
    assert 0.8 < v <= 1.0


def test_point_of_crossing_interpolation():
    x = np.array([1.0, 0.5, -0.5, -1.0])
    first, interp = K.point_of_crossing(x, 0.0)
    assert first == 3.0  # one-indexed first sample past crossing
    assert interp == pytest.approx(2.5)


def test_first_crossing_sin_quarter_period():
    out = K.first_crossing_ac(SIN)
    # ACF of sinusoid crosses zero at ~ quarter period (199.8/4 ~ 50)
    assert 49 <= out["pointOfCrossing"] <= 52


def test_motif_two_probs_sum():
    m = K.motif_two(Y, "diff")
    assert m["u"] + m["d"] == pytest.approx(1.0)
    assert m["dd"] + m["du"] + m["ud"] + m["uu"] == pytest.approx(1.0)


def test_binary_stats_runs():
    y = np.array([0, 1, 1, 1, 0, 0, 1, 0], dtype=float)
    out = K.binary_stats(y, "mean")
    assert out["longstretch1"] == 3.0
    assert out["longstretch0"] == 2.0
    assert out["pstretch1"] == 2 / 8
    # 'diff' preserves the reference quirk: N = len(y) - 1
    d = K.binary_stats(np.array([0, 1, 0, 1, 1, 0], dtype=float), "diff")
    assert d["pstretch1"] == 2 / 5


def test_pnn_and_cid():
    assert K.pnn(np.array([0.0, 10.0, 10.5, 30.0]), 5.0) == pytest.approx(2 / 3)
    c = K.cid_ce(Y)
    d = np.diff(Y)
    assert c["CE1"] == pytest.approx(np.sqrt(np.mean(d**2)))
    assert c["CE1_norm"] >= 1.0  # sorted series minimizes CE


def test_glscf_equals_corr_at_alpha_beta_1():
    # alpha=beta=1 on |y|: glscf is the Pearson corr of |y1|,|y2| with
    # population normalization
    tau = 2
    a = np.abs(Y[:-tau])
    b = np.abs(Y[tau:])
    expect = (np.mean(a * b) - a.mean() * b.mean()) / (a.std() * b.std())
    assert K.glscf(Y, 1, 1, tau) == pytest.approx(expect, rel=1e-10)


def test_quantile_hazen_small_known():
    # hazen: h = p*n + 0.5; for n=4, p=0.5 -> h=2.5 -> mid of 2nd,3rd order stats
    assert K.quantile_hazen(np.array([1.0, 2.0, 3.0, 4.0]), 0.5) == pytest.approx(2.5)
    assert K.quantile_hazen(np.array([1.0, 2.0, 3.0, 4.0]), 0.25) == pytest.approx(1.5)


def test_histogram_mode():
    y = np.concatenate([np.zeros(50), np.ones(10) * 9.99])
    assert K.histogram_mode(y, 10) == pytest.approx(0.4995)


def test_local_simple_mean_forecast():
    y = np.arange(20.0)
    out = K.local_simple(y, "mean", 4)
    # residual = prediction - value (reference convention);
    # forecast of a linear ramp from the mean of the last 4 = value - 2.5
    assert out["meanerr"] == pytest.approx(-2.5)
    assert out["stderr"] == pytest.approx(0.0, abs=1e-12)


def test_std_nth_der():
    assert K.std_nth_der(Y, 1) == pytest.approx(np.std(np.diff(Y), ddof=1))
    assert K.std_nth_der(Y, 2) == pytest.approx(np.std(np.diff(Y, n=2), ddof=1))


def test_motif_two_word_lengths_3_4():
    # hand-checkable series: b = diff>0 pattern 1,0,1,0,1,0,1,0,1 (n=9)
    y = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1], dtype=float)
    m = K.motif_two(y, "diff")
    # alternating u/d: only 'udu'/'dud' 3-words and 'udud'/'dudu' 4-words
    assert m["udu"] + m["dud"] == pytest.approx(1.0)
    assert m["uuu"] == 0.0 and m["ddd"] == 0.0
    assert m["udud"] + m["dudu"] == pytest.approx(1.0)
    assert m["hhh"] == pytest.approx(
        -(m["udu"] * np.log(m["udu"]) + m["dud"] * np.log(m["dud"]))
    )
    # probabilities of each word length sum to 1
    for k in (3, 4):
        names = [
            format(i, f"0{k}b").replace("0", "d").replace("1", "u")
            for i in range(2**k)
        ]
        assert sum(m[n] for n in names) == pytest.approx(1.0)
    # reference guard: too-short series raises (registry maps to NaN)
    with pytest.raises(ValueError):
        K.motif_two(np.array([1.0, 2.0, 3.0]))


def test_motif_two_mask_parity_random():
    # independent shrinking-mask implementation (SB_MotifTwo semantics,
    # Symbolic.py:138-295) vs the vectorized bincount version
    rng = np.random.default_rng(11)
    y = rng.standard_normal(200)
    b = (np.diff(y) > 0).astype(int)
    masks = {"d": b == 0, "u": b == 1}
    m = K.motif_two(y, "diff")
    for k in (2, 3, 4):
        new = {}
        for name, mask in masks.items():
            mask = mask[:-1]
            new[name + "d"] = np.logical_and(mask, b[k - 1 :] == 0)
            new[name + "u"] = np.logical_and(mask, b[k - 1 :] == 1)
        masks = new
        for name, mask in masks.items():
            assert m[name] == pytest.approx(np.mean(mask), abs=1e-14), name


def test_binpicker_reference_semantics():
    from pyhctsa_spark.functions.helpers import binpicker

    # nbins given: 'nice' snapped left edge + refined width, exact count
    e = binpicker(0.13, 9.87, 10)
    assert len(e) == 11
    assert e[0] <= 0.13 and e[-1] >= 9.87
    assert e[0] == 0.0  # snapped to a multiple of the power-of-ten width
    # automatic branch: width from {1,2,3,5,10} x 10^k
    e = binpicker(0.0, 10.0, None)
    assert len(e) == 2 and e[0] == 0.0 and e[-1] == 10.0
    e = binpicker(0.0, 10.0, None, binwidth_est=0.9)
    assert np.allclose(np.diff(e), 1.0)
    # nearly-constant data: half-integer-snapped degenerate bins
    e = binpicker(5.0, 5.0, 10)
    assert len(e) == 11 and e[0] <= 5.0 <= e[-1]
