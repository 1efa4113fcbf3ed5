"""Registry grid expansion + label mangling + distributed feature
extraction end-to-end."""

import numpy as np
import pytest

from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.plans.default_ops import default_feature_set
from pyhctsa_spark.plans.registry import Feature, FeatureSet, Operation, expand, format_value


def test_format_value_mangling():
    # reference rules (calculator.py:16-39): '-' -> m, '.' -> p, lists join
    assert format_value(-1) == "m1"
    assert format_value(2.0) == "2p0"
    assert format_value(-0.5) == "m0p5"
    assert format_value([1, 2]) == "1_2"
    assert format_value("seg") == "seg"


def test_expand_grid_and_raw_suffix():
    def f(y, tau=1):
        return float(np.mean(y)) + tau

    ops = [Operation(f, "TEST", ["tau"],
                     [{"tau": [1, 2], "zscore": True}, {"tau": 3}])]
    feats = expand(ops)
    labels = [x.label for x in feats]
    assert labels == ["TEST_1", "TEST_2", "TEST_3_raw"]
    y = np.random.default_rng(0).standard_normal(100) * 5 + 3
    # zscore applied for the first two, not the third
    assert feats[0](y) == pytest.approx(1.0, abs=1e-9)
    assert feats[2](y) == pytest.approx(np.mean(y) + 3)


def test_default_feature_set_coverage():
    fs = default_feature_set()
    # breadth check: the compiled catalog is a substantial op surface
    assert len(fs.features) > 150
    assert len(fs.columns) > 300
    assert len(set(fs.columns)) == len(fs.columns)  # labels unique


def test_feature_set_error_isolation():
    def boom(y):
        raise RuntimeError("kernel error")

    fs = FeatureSet([Feature("ok", lambda y: float(np.mean(y)), False, False),
                     Feature("bad", boom, False, False)])
    vals, nerr = fs.compute(np.arange(10.0))
    assert vals[0] == 4.5
    assert np.isnan(vals[1])
    assert nerr == 1


def test_extract_features_spark_roundtrip(spark):
    from pyhctsa_spark.operators.features import extract_features, make_feature_counters
    from pyhctsa_spark.sources.synthetic import make_doc, sequences_df

    fs = FeatureSet(expand([
        Operation(K.mean_, "DN_Mean"),
        Operation(K.spread_std, "DN_Spread_std"),
        Operation(K.autocorr_fourier, "AC", ["tau"], [{"tau": [1, 2]}]),
        Operation(K.burstiness, "DN_Burstiness"),
        Operation(K.trev, "CO_trev", ["tau"], [{"tau": [1]}]),
    ]))
    df = sequences_df(spark, 12, partitions=2)
    out = extract_features(df, fs, window=64).toPandas()
    assert set(fs.columns) <= set(out.columns)
    # golden check against in-process kernels for one doc
    doc_id = out["doc_id"].iloc[0]
    _, toks, _ = make_doc(int(doc_id[3:]))
    Y = K.make_buffer(toks.astype(np.float64), 64)
    g = out[out.doc_id == doc_id].sort_values("window_idx")
    assert len(g) == Y.shape[0]
    np.testing.assert_allclose(
        g["DN_Mean"].to_numpy(), Y.mean(axis=1), rtol=1e-12
    )
    np.testing.assert_allclose(
        g["AC_1"].to_numpy(),
        [K.autocorr_fourier(row, 1) for row in Y],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        g["DN_Burstiness_B"].to_numpy(),
        [K.burstiness(row)["B"] for row in Y],
        rtol=1e-10,
    )


def test_extract_features_whole_series(spark):
    from pyhctsa_spark.operators.features import extract_features
    from pyhctsa_spark.sources.synthetic import sequences_df

    fs = FeatureSet(expand([Operation(K.mean_, "DN_Mean")]))
    df = sequences_df(spark, 6, partitions=2)
    out = extract_features(df, fs, window=None).toPandas()
    assert len(out) == 6
    assert (out["window_idx"] == 0).all()


def test_compute_matrix_batched_bit_equal_scalar():
    """The *_2d batched dispatch must be bit-identical to the per-window
    scalar path (the driver's oracle hash depends on it)."""
    fs = FeatureSet(
        expand(
            [
                Operation(K.mean_, "DN_Mean"),
                Operation(K.spread_std, "DN_Spread_std"),
                Operation(K.spread_iqr, "DN_Spread_iqr"),
                Operation(K.burstiness, "DN_Burstiness"),
                Operation(K.autocorr_timedomain, "ACtd", ["tau"], [{"tau": [1, 2]}]),
                Operation(K.autocorr_fourier, "ACf", ["tau"], [{"tau": [1], "zscore": True}]),
                Operation(K.trev, "CO_trev", ["tau"], [{"tau": [1]}]),
            ]
        )
    )
    rng = np.random.default_rng(5)
    Y = np.round(rng.standard_normal((30, 16)) * 25 + 60)
    Y[4] = 7.0  # constant row: zscored features -> NaN + error count
    got, errs = fs.compute_matrix(Y)
    want = np.empty_like(got)
    werrs = 0
    for i in range(Y.shape[0]):
        vals, ne = fs.compute(Y[i])
        want[i] = vals
        werrs += ne
    assert np.array_equal(got, want, equal_nan=True)
    assert errs == werrs
