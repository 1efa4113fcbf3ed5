"""Registry-extended rollup tiers: the FeatureSet contributes extra
per-window feature columns at every tier, matching in-process kernels."""

import numpy as np

from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.operators.rollup import rollup_tiers
from pyhctsa_spark.plans.registry import FeatureSet, Operation, expand
from pyhctsa_spark.sources.synthetic import make_doc, sequences_df


def test_rollup_with_feature_set_matches_kernels(spark):
    fs = FeatureSet(
        expand(
            [
                Operation(K.trev, "CO_trev", ["tau"], [{"tau": [1]}]),
                Operation(K.perm_entropy, "EN_PermEn_norm", ["m"], [{"m": [3]}]),
                Operation(K.spread_mad, "DN_Spread_mad"),
            ]
        )
    )
    df = sequences_df(spark, 8, partitions=2)
    out = rollup_tiers(df, window=32, n_tiers=2, feature_set=fs).toPandas()
    assert set(fs.columns) <= set(out.columns)
    for tier, wlen in ((0, 32), (1, 512)):
        sub = out[out.tier == tier]
        if sub.empty:
            continue
        doc_id = sub.doc_id.iloc[0]
        _, toks, _ = make_doc(int(doc_id[3:]))
        Y = K.make_buffer(toks.astype(np.float64), wlen)
        g = sub[sub.doc_id == doc_id].sort_values("window_idx")
        np.testing.assert_allclose(
            g["CO_trev_1_raw"].to_numpy()
            if "CO_trev_1_raw" in g
            else g["CO_trev_1"].to_numpy(),
            [K.trev(row, 1)["raw"] for row in Y],
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            g["DN_Spread_mad"].to_numpy(),
            [K.spread_mad(row) for row in Y],
            rtol=1e-12,
        )
    # base columns unchanged
    assert {"mean", "variance", "ac1_td", "state_bin"} <= set(out.columns)
