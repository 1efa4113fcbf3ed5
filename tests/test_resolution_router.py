"""Resolution router: the coarsest tier serves each requested bucket
size; residual merges are exact for ALG features."""

import pandas as pd
from pyspark.sql import functions as F

from pyhctsa_spark.operators.rollup import (
    cascade_from_store,
    rollup_at_resolution,
    rollup_tiers,
)
from pyhctsa_spark.sources.synthetic import sequences_df

ALG = ["n", "mean", "variance", "spread_std", "ac1_td", "ac2_td",
       "burst_b", "burst_b_kim"]


def _tiers(spark):
    return rollup_tiers(
        sequences_df(spark, 24), window=8, group=4, n_tiers=3
    ).persist()


def _sorted(df, cols):
    return (
        df.select("doc_id", "window_idx", *cols)
        .orderBy("doc_id", "window_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_exact_tier_hit_serves_directly(spark):
    tiers = _tiers(spark)
    # bucket = 16 base windows = group^2 -> tier 2 rows verbatim
    out = rollup_at_resolution(tiers, 16, group=4, n_tiers=3)
    want = tiers.where("tier = 2")
    pd.testing.assert_frame_equal(
        _sorted(out, ALG + ["spread_iqr", "ac1_fourier"]),
        _sorted(want, ALG + ["spread_iqr", "ac1_fourier"]),
    )
    # HOL columns intact on a direct hit
    assert out.where(F.col("spread_iqr").isNotNull()).count() > 0


def test_residual_merge_equals_direct_cascade(spark):
    tiers = _tiers(spark)
    # bucket = 8 = 4^1 * 2 -> tier 1 with residual group 2
    out = rollup_at_resolution(tiers, 8, group=4, n_tiers=3)
    want = cascade_from_store(tiers.where("tier = 1"), group=2)
    pd.testing.assert_frame_equal(_sorted(out, ALG), _sorted(want, ALG))
    # and equals the same buckets built straight from tier 0 (exact
    # ALG merge algebra: any merge tree gives identical states)
    from_t0 = cascade_from_store(tiers.where("tier = 0"), group=8)
    pd.testing.assert_frame_equal(_sorted(out, ALG), _sorted(from_t0, ALG))


def test_router_reads_the_coarsest_tier(spark):
    tiers = _tiers(spark)
    # bucket 16 must come from tier 2 (1/16th the rows of tier 1)
    out = rollup_at_resolution(tiers, 16, group=4, n_tiers=3)
    assert set(out.select("tier").distinct().toPandas()["tier"]) == {2}
    # bucket 4 -> tier 1 direct
    out4 = rollup_at_resolution(tiers, 4, group=4, n_tiers=3)
    assert set(out4.select("tier").distinct().toPandas()["tier"]) == {1}
    # bucket 6 -> no tier divides beyond tier 0: residual 6 from tier 0
    out6 = rollup_at_resolution(tiers, 6, group=4, n_tiers=3)
    assert set(out6.select("tier").distinct().toPandas()["tier"]) == {1}
    tiers.unpersist()


def test_cascade_handles_multi_tier_input(spark):
    """cascade_from_store over the WHOLE multi-tier store cascades each
    tier independently instead of silently returning nothing (found by
    review: tier was missing from the groupBy)."""
    tiers = _tiers(spark)
    out = cascade_from_store(tiers, group=4)
    got = set(out.select("tier").distinct().toPandas()["tier"])
    # tier-0 children -> tier 1, tier-1 -> tier 2, tier-2 -> tier 3
    assert got == {1, 2, 3}
    # each slice equals the single-tier cascade
    import pandas as pd

    one = cascade_from_store(tiers.where("tier = 0"), group=4)
    pd.testing.assert_frame_equal(
        _sorted(out.where("tier = 1"), ALG), _sorted(one, ALG))
    tiers.unpersist()
