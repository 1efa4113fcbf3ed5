"""Embedding-geometry, medical, distribution-extra, stationarity-extra
kernels."""

import numpy as np
import pytest

from pyhctsa_spark.functions import distribution_extra as DX
from pyhctsa_spark.functions import embedding as EM
from pyhctsa_spark.functions import medical as MD
from pyhctsa_spark.functions import stationarity_extra as SX
from pyhctsa_spark.functions.kernels import zscore

rng = np.random.default_rng(33)
NOISE = zscore(rng.standard_normal(500))
SIN = zscore(np.sin(2 * np.pi * np.arange(500) / 25.0) + 0.05 * rng.standard_normal(500))


def test_embed2_structure_vs_noise():
    o_sin = EM.embed2(SIN, tau=1)
    o_noise = EM.embed2(NOISE, tau=1)
    # deterministic signal: angles strongly autocorrelated
    assert o_sin["theta_ac1"] > o_noise["theta_ac1"]
    assert 0 < o_sin["arearat"] <= 1
    assert o_sin["areas_all"] >= o_sin["areas_50"]


def test_embed2_angle_tau_runs():
    out = EM.embed2_angle_tau(SIN, 8)
    assert np.isfinite(out["mean_thetaac1"])
    assert out["max_thetaac1"] >= out["min_thetaac1"]


def test_embed2_dist_exponential_fit():
    out = EM.embed2_dist(NOISE, tau=1)
    assert out["d_mean"] > 0
    assert out["d_max"] >= out["d_median"] >= out["d_min"]
    # nlogL of exp fit equals n*(1 + ln(mean)) at the MLE
    m = out["d_mean"]
    assert np.isfinite(out["d_expfit_nlogL"])


def test_embed2_shapes_counts():
    out = EM.embed2_shapes(SIN, tau=1, r=1.0)
    assert out["mean"] > 0
    assert out["max"] >= out["median"]
    # periodic orbit revisits neighborhoods: higher counts than noise
    assert out["mean"] > EM.embed2_shapes(NOISE, tau=1, r=1.0)["mean"] * 0.5


def test_stick_angles_symmetric_noise():
    out = EM.stick_angles(NOISE)
    assert abs(out["mean"]) < 0.2
    assert np.isfinite(out["pnsumabsdiff"])
    assert out["std"] > 0


def test_translate_shape_circle_and_rectangle():
    c = EM.translate_shape(NOISE, "circle", 2)
    r = EM.translate_shape(NOISE, "rectangle", 2)
    assert 1 <= c["mean"] <= 5
    assert r["mean"] >= c["mean"]  # rectangle contains the circle span
    assert 0 <= c["npatmode"] <= 1
    assert np.isfinite(c["statav2_m"])


def test_autocorr_shape_decay():
    ar = np.zeros(2000)
    g = np.random.default_rng(4)
    for i in range(1, 2000):
        ar[i] = 0.8 * ar[i - 1] + g.standard_normal()
    out = EM.autocorr_shape(zscore(ar), "posDrown")
    # AR(1) rho=0.8: decay timescale ~ -1/ln(0.8) ~ 4.5
    assert out["decayTimescale"] == pytest.approx(4.5, abs=2.0)
    assert out["fexpacf_r2"] > 0.9
    assert out["Nac"] > 5


def test_periodicity_wang_finds_period():
    out = EM.periodicity_wang(SIN)
    # threshold-0 peak should sit at ~ the 25-sample period
    assert out["th1"] == pytest.approx(25, abs=3)
    # stricter thresholds never decrease the found period's validity
    assert out["th7"] in (0.0, out["th1"]) or out["th7"] >= 0


def test_medical_hrv():
    rr = 0.8 + 0.05 * rng.standard_normal(300)  # RR intervals in seconds
    out = MD.hrv_classic(rr)
    assert out["pnn5"] >= out["pnn10"] >= out["pnn40"]
    assert out["SD1"] > 0 and out["SD2"] > 0
    assert 0 <= out["lf"] <= 100 and 0 <= out["hf"] <= 100
    raw = MD.raw_hrv_meas(rr * 1000)
    assert raw["tri10"] >= 1
    pn = MD.pnn_set(rr)
    assert pn["pnn5"] >= pn["pnn100"]


def test_polvar_monotone_in_d():
    x = rng.standard_normal(2000)
    # larger threshold -> more zero-runs -> higher polvar probability
    assert MD.polvar(x, 1.0, 6) <= MD.polvar(x, 3.0, 6)


def test_mean_types_and_fit_mle():
    y = np.abs(NOISE) + 1.0
    assert DX.mean_types(y, "harm") <= DX.mean_types(y, "geom") <= DX.mean_types(y)
    assert DX.mean_types(y, "rms") >= DX.mean_types(y)
    g = DX.fit_mle(NOISE, "gaussian")
    assert g["mean"] == pytest.approx(0, abs=1e-10)
    assert g["std"] == pytest.approx(np.std(NOISE), rel=1e-12)


def test_outlier_ops():
    out = DX.outlier_test(NOISE, 2)
    assert out["std"] < 1.0  # trimming reduces spread
    oi = DX.outlier_include(NOISE, "abs")
    assert np.isfinite(oi["mdtm"])
    rp = DX.remove_points(NOISE, "absfar", 0.1)
    assert rp["std"] < 1.0
    assert np.isfinite(rp["ac1rat"])
    assert DX.pleft(NOISE, 0.1) > 1.0  # 10% beyond ~1.6 sigma for gaussian


def test_histogram_asymmetry():
    skewed = np.concatenate([NOISE, np.abs(rng.standard_normal(300)) * 3])
    out = DX.histogram_asymmetry(skewed)
    assert np.isfinite(out["densityDiff"])


def test_dyn_win_and_local_ops():
    out = SX.dyn_win(NOISE, 6)
    assert np.isfinite(out["stdmean"])
    ld = SX.local_distributions(NOISE, 5, "par")
    assert ld["maxdiv"] >= ld["meandiv"] >= 0
    ld2 = SX.local_distributions(NOISE, 4, "each")
    assert np.isfinite(ld2["meandiv"])
    le = SX.local_extrema(NOISE, "l", 50)
    assert le["meanmax"] > 0 and le["meanabsmin"] > 0


def test_medfilt_and_preproc_compare():
    x = np.array([1.0, 9.0, 1.0, 1.0, 9.0, 1.0])
    f = SX.medfilt1(x, 3)
    assert f[1] == 1.0  # spike removed
    pc = SX.preproc_compare(np.cumsum(NOISE), "diff1")
    assert np.isfinite(pc["swss5_1"]) and np.isfinite(pc["olbt_m2"])
    pc2 = SX.preproc_compare(np.cumsum(NOISE), "poly2")
    assert np.isfinite(pc2["statv4"])
    assert set(pc2) == {f"statv{s}" for s in (2,4,6,8,10)} | {f"swms{w}_{s}" for w,s in ((2,2),(5,1),(5,2),(10,1),(10,2))} | {f"swss{w}_{s}" for w,s in ((2,1),(2,2),(5,1),(5,2),(10,1),(10,2))} | {"olbt_m2","olbt_m5","olbt_s2","olbt_s5"}


def test_splinefit3_spans_cubics():
    # any global cubic lies in the 3-knot spline space -> exact fit
    x = np.arange(120, dtype=float)
    y = 0.01 * x**3 - 0.7 * x**2 + 2 * x - 5
    fit = EM.splinefit3(y)
    assert np.abs(fit - y).max() < 1e-9


def test_periodicity_wang_reference_semantics():
    # sinusoid + quadratic trend: spline detrend must expose period 25
    t = np.arange(300, dtype=float)
    y = np.sin(2 * np.pi * t / 25) + 0.01 * t + 5e-5 * t**2
    out = EM.periodicity_wang(y)
    assert set(out) == {f"th{k}" for k in range(1, 8)}
    assert all(v == 25.0 for v in out.values())
    # not-found default is 1 (C/MATLAB behavior), e.g. on a pure trend
    out2 = EM.periodicity_wang(np.arange(60, dtype=float))
    assert out2["th7"] == 1.0
