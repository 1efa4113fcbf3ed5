"""Physics/scaling/graph kernel tests."""

import numpy as np
import pytest

from pyhctsa_spark.functions import physics as P

rng = np.random.default_rng(21)
NOISE = rng.standard_normal(1000)


def test_walker_prop_tracks_series():
    out = P.walker(NOISE, "prop", 0.9)
    # aggressive tracking: walker std close to series std, high crossing
    assert 0.5 < out["sw_stdrat"] < 1.2
    assert out["sw_meanabsdiff"] < 2.0
    out_slow = P.walker(NOISE, "prop", 0.1)
    assert out_slow["sw_stdrat"] < out["sw_stdrat"]  # sluggish walker is smoother
    assert np.isfinite(out["sw_ansarib_pval"])
    assert 0 <= out["res_runstest"] <= 1


def test_walker_momentum_and_biasprop_run():
    for rule, params in (("momentum", 2), ("biasprop", [0.1, 0.2])):
        out = P.walker(NOISE, rule, params)
        assert np.isfinite(out["w_std"])


def test_ansari_bradley_calibration():
    x = rng.standard_normal(300)
    y = rng.standard_normal(300)
    assert P.ansari_bradley_p(x, y) > 0.001  # same scale
    assert P.ansari_bradley_p(x, 4.0 * rng.standard_normal(300)) < 1e-6


def test_force_potential_dblwell_stays_bounded():
    out = P.force_potential(NOISE, "dblwell")
    assert np.isfinite(out["mean"])
    assert out["range"] < 50
    assert "pcrossup" in out


def test_moving_threshold_dynamics():
    out = P.moving_threshold(NOISE, 1.0, 0.1)
    assert out["meanq"] > 1.0  # barrier spends time above sigma
    assert 0 < out["pkick"]
    assert out["maxq"] >= out["medianq"] >= out["minq"]


def test_fast_dfa_known_exponents():
    # white noise: alpha ~ 0.5; random walk: alpha ~ 1.5
    wn = rng.standard_normal(4096)
    walk = np.cumsum(rng.standard_normal(4096))
    assert P.fast_dfa(wn) == pytest.approx(0.5, abs=0.12)
    assert P.fast_dfa(walk) == pytest.approx(1.5, abs=0.2)


def test_visibility_graph_degree_stats():
    out = P.visibility_graph(NOISE[:500])
    # nearest-taller construction: mean degree ~ 2 edges/node bounded
    assert 1.0 <= out["meank"] <= 4.0
    assert out["maxk"] >= out["mediank"] >= out["mink"]
    assert np.isfinite(out["entropy"])
    assert np.isfinite(out["gaussnlogL"])


def test_visibility_graph_matches_reference_construction_bruteforce():
    y = rng.standard_normal(120)
    ys = y - y.min()
    N = len(ys)
    A = np.zeros((N, N), dtype=int)
    for i in range(N):
        fw = np.where(ys[i + 1 :] > ys[i])[0]
        if fw.size:
            A[i, i + 1 + fw[0]] = 1
        bw = np.where(ys[:i] > ys[i])[0]
        if bw.size:
            A[bw[-1], i] = 1
    A = np.maximum(A, A.T)
    k_expect = A.sum(axis=0)
    out = P.visibility_graph(y)
    assert out["meank"] == pytest.approx(np.mean(k_expect))
    assert out["maxk"] == np.max(k_expect)


def test_natural_visibility_graph_matches_bruteforce():
    import numpy as np

    from pyhctsa_spark.functions.physics import _natural_vg_degrees, visibility_graph

    rng = np.random.default_rng(2)
    y = rng.standard_normal(80)
    ys = y - y.min()
    N = len(ys)
    deg = np.zeros(N, dtype=int)
    for i in range(N):
        for j in range(i + 1, N):
            if all(
                ys[m] < ys[j] + (ys[i] - ys[j]) * (j - m) / (j - i)
                for m in range(i + 1, j)
            ):
                deg[i] += 1
                deg[j] += 1
    assert np.array_equal(_natural_vg_degrees(ys), deg)
    out = visibility_graph(y, "norm")
    assert out["meank"] == deg.mean()
