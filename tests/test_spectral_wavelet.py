"""Spectral + wavelet kernels: Parseval checks, peak detection on known
spectra, DWT perfect reconstruction, CWT scale localization."""

import math

import numpy as np
import pytest

from pyhctsa_spark.functions import spectral as SP
from pyhctsa_spark.functions import wavelet as WL

rng = np.random.default_rng(9)


def test_matlab_buffer():
    b = SP.matlab_buffer(np.arange(7.0), 3)
    assert b.shape == (3, 3)
    assert b[:, 0].tolist() == [0, 1, 2]
    assert b[:, 2].tolist() == [6, 0, 0]  # zero-padded tail


def test_find_peaks_full_basic():
    s = np.array([0, 1, 0, 3, 0, 2, 0], dtype=float)
    h, i, w, p = SP.find_peaks_full(s)
    assert h.tolist() == [3, 2, 1]  # descending
    assert i.tolist() == [3, 5, 1]
    np.testing.assert_allclose(p, [3, 2, 1])
    np.testing.assert_allclose(w, [1, 1, 1])


def test_spectral_summaries_sine_peak_and_parseval():
    n = 1024
    t = np.arange(n)
    y = np.sin(2 * np.pi * t * 0.1)  # angular freq 0.2*pi ~ 0.628
    out = SP.spectral_summaries(y)
    assert out["maxw"] == pytest.approx(2 * np.pi * 0.1, abs=0.02)
    assert out["centroid"] == pytest.approx(out["maxw"], abs=0.05)
    # Parseval: integral of S dw ~ variance (one-sided, angular)
    total_area = sum(out[f"area_2_{j}"] for j in (1, 2))
    assert total_area == pytest.approx(np.mean(y**2), rel=0.05)
    assert out["numPeaks"] >= 1


def test_spectral_summaries_white_noise_flat():
    y = rng.standard_normal(4096)
    out = SP.spectral_summaries(y)
    # flat spectrum: centroid near pi/2, sfm near 0 dB-ish (> -8)
    assert out["centroid"] == pytest.approx(np.pi / 2, abs=0.35)
    assert out["sfm"] > -8.0
    assert out["fpoly2_r2"] > 0.95  # cumsum ~ linear -> quadratic fits well


def test_dwt_perfect_reconstruction_via_wrcoef_sum():
    # sum of all detail branches + approx branch reconstructs the signal
    y = rng.standard_normal(512)
    for wname in ("db2", "db3", "sym2", "db4"):
        w = WL.Wavelet(wname)
        level = 3
        c, lens = WL.wavedec(y, w, level)
        recon = np.zeros(len(y))
        for lv in range(1, level + 1):
            recon += WL.wrcoef(c, lens, w, lv)
        # approximation branch: same length chain as a detail branch at
        # the deepest level, but through rec_lo throughout
        data = c[: lens[0]]
        idx = len(lens) - level
        data = WL._upsconv(data, w.rec_lo, lens[idx])
        for k in range(level - 1):
            data = WL._upsconv(data, w.rec_lo, lens[idx + k + 1])
        recon += data
        np.testing.assert_allclose(recon, y, atol=1e-8, err_msg=wname)


def test_dwt_energy_and_lengths():
    y = rng.standard_normal(300)
    w = WL.Wavelet("db3")
    a, d = WL.dwt(y, w)
    assert len(a) == (300 + 6 - 1) // 2
    assert WL.dwt_max_level(1000, "db3") == int(math.floor(math.log2(1000 / 5)))


def test_cwt_scale_localization():
    # sinusoid of period ~20: energy concentrates at scales ~ period
    t = np.arange(600)
    y = np.sin(2 * np.pi * t / 20.0)
    coeffs = WL.cwt(y, np.arange(1, 33), "db3")
    power = (coeffs**2).sum(axis=1)
    best = int(np.argmax(power)) + 1
    assert 8 <= best <= 32  # concentrated well away from scale 1
    assert power[best - 1] > 5 * power[0]


def test_cwt_features_and_wl_ops_run():
    y = np.sin(2 * np.pi * np.arange(600) / 20.0) + 0.1 * rng.standard_normal(600)
    out = WL.cwt_features(y, "db3", 16)
    assert out["maxabsC"] > 0
    assert np.isfinite(out["SC_h"])
    assert 0 <= out["pcross_maxssc50"] <= 1
    dc = WL.detail_coeffs(y, "db3", "max")
    assert dc["max_mean"] > 0 and np.isfinite(dc["corrcoef_max_medians"])
    wc = WL.wl_coeffs(y, "db3", 3)
    assert wc["max_coeff"] >= wc["mean_coeff"] >= 0
    assert 0 <= wc["wb50m"] <= 1


def test_wl_detail_level_matches_sine_band():
    # detail level ~log2(period) carries the most energy for a sinusoid
    t = np.arange(1024)
    y = np.sin(2 * np.pi * t / 16.0)
    dc = WL.detail_coeffs(y, "db3", "max")
    # period 16 -> dyadic band level 3-4 (2^3..2^4 sample wavelengths)
    assert dc["wheremax_mean"] in (2.0, 3.0, 4.0)
