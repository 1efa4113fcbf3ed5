"""Continuous-aggregate exactness: merged tier-k states must reproduce
direct computation on the concatenated raw windows — the property that
makes the 16x/256x tiers true continuous aggregates."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.functions import stats_state as S

LAGS = [1, 2]


def _direct_features(Y: np.ndarray, lags):
    out = {
        "mean": K.mean_2d(Y),
        "variance": K.variance_2d(Y),
        "spread_std": K.std_2d(Y),
    }
    for t in lags:
        out[f"ac{t}_td"] = K.ac_timedomain_2d(Y, t)
    b, bk = K.burstiness_2d(Y)
    out["burst_b"] = b
    out["burst_b_kim"] = bk
    return out


def test_tier0_finalize_matches_direct():
    rng = np.random.default_rng(7)
    y = rng.standard_normal(64 * 37 + 13) * 2 + 5
    Y = K.make_buffer(y, 64)
    fin = S.finalize(S.states_from_windows(Y, LAGS), LAGS)
    direct = _direct_features(Y, LAGS)
    for k in direct:
        np.testing.assert_allclose(fin[k], direct[k], rtol=1e-9, err_msg=k)


@pytest.mark.parametrize("group", [2, 4, 16])
def test_merged_tier_matches_direct_on_big_windows(group):
    rng = np.random.default_rng(11)
    W = 64
    y = rng.standard_normal(W * group * 9 + W * 3 + 7) * 3 + 1
    state0 = S.states_from_windows(K.make_buffer(y, W), LAGS)
    merged = S.merge_groups(state0, group, LAGS)
    Ybig = K.make_buffer(y, W * group)
    assert len(merged["n"]) == Ybig.shape[0]
    fin = S.finalize(merged, LAGS)
    direct = _direct_features(Ybig, LAGS)
    for k in direct:
        np.testing.assert_allclose(fin[k], direct[k], rtol=1e-8, err_msg=k)


def test_double_cascade_16_then_16_equals_256():
    rng = np.random.default_rng(13)
    W = 64
    y = rng.standard_normal(W * 256 * 2 + 100)
    s0 = S.states_from_windows(K.make_buffer(y, W), LAGS)
    s2 = S.merge_groups(S.merge_groups(s0, 16, LAGS), 16, LAGS)
    direct = _direct_features(K.make_buffer(y, W * 256), LAGS)
    fin = S.finalize(s2, LAGS)
    for k in direct:
        np.testing.assert_allclose(fin[k], direct[k], rtol=1e-8, err_msg=k)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=2, max_value=5),
    st.sampled_from([8, 16, 32]),
)
def test_merge_property_random(seed, group, w):
    rng = np.random.default_rng(seed)
    n = w * group * rng.integers(1, 6)
    y = rng.normal(rng.uniform(-5, 5), rng.uniform(0.1, 10), n)
    s0 = S.states_from_windows(K.make_buffer(y, w), LAGS)
    merged = S.merge_groups(s0, group, LAGS)
    fin = S.finalize(merged, LAGS)
    direct = _direct_features(K.make_buffer(y, w * group), LAGS)
    for k in direct:
        np.testing.assert_allclose(
            fin[k], direct[k], rtol=1e-7, atol=1e-10, err_msg=k
        )


def test_lag_products_cross_boundary_exact():
    # hand-checkable tiny case: two windows of 4, lag 1 and 2
    y = np.arange(8.0)
    lags = [1, 2]
    s = S.states_from_windows(K.make_buffer(y, 4), lags)
    m = S.merge_groups(s, 2, lags)
    assert m["sxy"][0, 0] == pytest.approx(np.sum(y[:-1] * y[1:]))
    assert m["sxy"][0, 1] == pytest.approx(np.sum(y[:-2] * y[2:]))
    assert m["s1"][0] == y.sum()
    np.testing.assert_array_equal(m["head"][0], y[:2])
    np.testing.assert_array_equal(m["tail"][0], y[-2:])
