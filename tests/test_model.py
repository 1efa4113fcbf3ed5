"""Model-fit & hypothesis-test kernels: parameter recovery on known
processes + distributional sanity of p-values."""

import math

import numpy as np
import pytest

from pyhctsa_spark.functions import model as M

rng = np.random.default_rng(11)


def _ar_series(phis, n=4000, seed=1):
    r = np.random.default_rng(seed)
    y = np.zeros(n + 100)
    for t in range(len(phis), len(y)):
        y[t] = sum(p * y[t - j - 1] for j, p in enumerate(phis)) + r.standard_normal()
    return y[100:]


def test_ar_ols_recovers_coefficients():
    y = _ar_series([0.6, -0.3])
    phi, sigma2 = M.ar_ols_fit(y, 2)
    assert phi[0] == pytest.approx(0.6, abs=0.05)
    assert phi[1] == pytest.approx(-0.3, abs=0.05)
    assert sigma2 == pytest.approx(1.0, abs=0.1)


def test_ar_cov_outputs():
    y = _ar_series([0.5])
    out = M.ar_cov(y, 2)
    assert out["a1"] == 1.0
    assert out["a2"] == pytest.approx(-0.5, abs=0.06)
    assert abs(out["res_AC1"]) < 0.05  # residuals ~ white


def test_ar_fit_select_picks_true_order():
    y = _ar_series([0.5, -0.4, 0.25])
    out = M.ar_fit_select(y, 1, 8)
    assert out["popt_sbc"] == 3.0
    assert out["A1"] == pytest.approx(0.5, abs=0.06)


def test_t_ppf_975_accuracy():
    from pyhctsa_spark.functions.helpers import t_ppf_975

    # scipy.stats.t.ppf(0.975, nu) reference values
    exact = {30: 2.0422724563012373, 60: 2.0002978220142578,
             100: 1.9839715184496334, 1000: 1.9623390808264078}
    for nu, want in exact.items():
        assert t_ppf_975(nu) == pytest.approx(want, abs=5e-6)
    assert t_ppf_975(100) == pytest.approx(exact[100], abs=1e-8)


def test_ar_fit_select_statsmodels_semantics():
    """Pins the ar_select_order/AutoReg conventions the kernel
    reimplements (ModelFit.py:443-551 runs statsmodels; see the ARFit
    NOT_SWEPT note): common hold_back selection sample, order-0 null
    candidate, winner refit on its own sample, t-based CIs."""
    from pyhctsa_spark.functions.helpers import t_ppf_975

    y = _ar_series([0.6, -0.3], n=500, seed=3)
    N = len(y)
    pmax = 4
    out = M.ar_fit_select(y, 1, pmax)

    # (1) reported IC curves come from the COMMON sample (rows
    # pmax..N-1, nobs = N - pmax), independently recomputed here
    nobs = N - pmax
    tgt = y[pmax:]
    X = np.column_stack([y[pmax - j - 1 : N - j - 1] for j in range(pmax)])
    for p in (1, 2, 3):
        phi_p, *_ = np.linalg.lstsq(X[:, :p], tgt, rcond=None)
        r = tgt - X[:, :p] @ phi_p
        s2 = float(r @ r / nobs)
        ll = -0.5 * nobs * (math.log(2 * math.pi * s2) + 1.0)
        assert out[f"sbc_{p}"] == pytest.approx(
            (-2 * ll + math.log(nobs) * (p + 1)) / N, rel=1e-12)
        assert out[f"fpe_{p}"] == pytest.approx(
            (-2 * ll + 2 * (p + 1)) / N, rel=1e-12)

    # (2) the winner (order 2) is REFIT on its own conditional sample:
    # coefficients/variance equal the plain AR(2) OLS fit, not the
    # hold_back fit
    assert out["popt_sbc"] == 2.0
    phi_own, s2_own = M.ar_ols_fit(y, 2)
    assert out["A1"] == pytest.approx(phi_own[0], rel=1e-12)
    assert out["A2"] == pytest.approx(phi_own[1], rel=1e-12)
    assert out["C"] == pytest.approx(s2_own, rel=1e-12)

    # (3) coefficient CIs use Student-t, dof = (N - p) - p
    Xo = np.column_stack([y[2 - j - 1 : N - j - 1] for j in range(2)])
    cov = s2_own * np.linalg.inv(Xo.T @ Xo)
    want = t_ppf_975((N - 2) - 2) * np.sqrt(np.diag(cov))
    assert out["aerr_mean"] == pytest.approx(want.mean(), rel=1e-12)

    # (4) the order-0 null model is a real candidate: on white noise it
    # wins selection and the fit clamps to pmin with a near-zero A1
    w = np.random.default_rng(9).standard_normal(400)
    ow = M.ar_fit_select(w, 1, 6)
    assert abs(ow["A1"]) < 0.15 and ow["A2"] == 0.0


def test_partial_autocorr_ar1():
    y = _ar_series([0.7])
    out = M.partial_autocorr(y, 5)
    assert out["pac_1"] == pytest.approx(0.7, abs=0.05)
    for k in range(2, 6):
        assert abs(out[f"pac_{k}"]) < 0.08  # AR(1): pacf cuts off


def test_kpss_trend_stationary_vs_random_walk():
    t = np.arange(1500, dtype=float)
    stationary = 0.01 * t + rng.standard_normal(1500)
    walk = np.cumsum(rng.standard_normal(1500))
    a = M.kpss_test(stationary)
    b = M.kpss_test(walk)
    assert a["pValue"] > 0.05      # fail to reject stationarity
    assert b["pValue"] <= 0.011    # reject for the random walk


def test_variance_ratio_random_walk_vs_meanrev():
    # calibration verified by Monte Carlo (mean VR 1.0000, sd 0.0185,
    # 6.5% rejection at the 5% level over 200 seeds); use a fixed seed
    walk = np.cumsum(np.random.default_rng(0).standard_normal(3000))
    out = M.variance_ratio_test(walk, 2)
    assert out["ratio"] == pytest.approx(1.0, abs=0.12)
    assert out["pValue"] > 0.01
    # strongly mean-reverting levels -> VR << 1
    ar = _ar_series([-0.5])
    lev = np.cumsum(ar)
    out2 = M.variance_ratio_test(lev, 2)
    assert out2["ratio"] < 0.8


def test_hypothesis_tests_calibration():
    x = rng.standard_normal(500)
    assert M.hypothesis_test(x, "ztest") > 0.001
    assert M.hypothesis_test(x, "jbtest") > 0.001
    assert M.hypothesis_test(x, "lbq") > 0.001
    assert M.hypothesis_test(x, "signtest") > 0.001
    assert M.hypothesis_test(x, "runstest") > 0.001
    assert M.hypothesis_test(x, "signrank") > 0.001
    # shifted data: sign/z/signrank should reject
    y = x + 1.0
    assert M.hypothesis_test(y, "ztest") < 1e-6
    assert M.hypothesis_test(y, "signtest") < 1e-6
    assert M.hypothesis_test(y, "signrank") < 1e-6
    # heavy autocorrelation: lbq rejects
    s = _ar_series([0.8], n=500)
    assert M.hypothesis_test(s, "lbq") < 1e-6
    # heavy tails: jb rejects
    assert M.hypothesis_test(rng.standard_t(2, 1000), "jbtest") < 1e-4


def test_jb_pvalue_matches_chi2():
    # check chi2_sf itself on known points: sf(5.99, 2) ~ 0.05
    from pyhctsa_spark.functions.helpers import chi2_sf

    assert chi2_sf(5.991, 2) == pytest.approx(0.05, abs=0.002)
    assert chi2_sf(0.0, 2) == pytest.approx(1.0)


def test_residual_analysis_white_noise():
    e = rng.standard_normal(1000)
    out = M.residual_analysis(e)
    assert abs(out["ac1"]) < 0.08
    assert out["dwts"] == pytest.approx(2.0, abs=0.2)
    assert out["normksstat"] < 0.05
    assert out["normp"] > 0.01  # gaussian residuals: KS should not reject
    assert out["ftbth"] <= 3  # white noise ACF under the 2.6/sqrt(N) band
    assert 0.8 <= out["propbth"] <= 1.0
    assert out["rmse"] == pytest.approx(
        (out["meane"] ** 2 + out["stde"] ** 2 * (len(e) - 1) / len(e)) ** 0.5,
        rel=1e-9,
    )


def test_exp_smoothing_alpha_tracks_persistence():
    # near-random-walk data -> optimal alpha close to 1
    walk = np.cumsum(rng.standard_normal(400))
    out_w = M.exp_smoothing(walk, ntrain=150)
    assert out_w["alphamin"] > 0.7
    assert "ac1" in out_w and np.isfinite(out_w["stde"])
