"""Spark SQL surface for the kernel library.

``register_sql_udfs(spark)`` exposes the most-used kernels as
Arrow-batched pandas UDFs over ``array<double>`` (or ``array<int>``)
columns, so the feature math is reachable from plain SQL:

    SELECT doc_id, hctsa_ac(tokens, 1) AS ac1,
           hctsa_sampen(tokens)        AS sampen2
    FROM sequences

Each UDF is vectorized per Arrow batch (one python invocation per batch,
numpy kernel per row). For the full catalog, batch windows, or tiered
output, use operators/features.extract_features and
operators/rollup.rollup_tiers — these SQL functions are the ad-hoc
interactive surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from pyhctsa_spark.functions import entropy as E
from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.functions import physics as PH


def _periodicity_th2(y):
    from pyhctsa_spark.functions.embedding import periodicity_wang

    return periodicity_wang(y)["th2"]


def _series_udf(fn):
    """Wrap f(1-D float64) -> float as a pandas UDF over array columns."""

    @pandas_udf("double")
    def udf(col: pd.Series) -> pd.Series:
        out = np.empty(len(col))
        for i, v in enumerate(col):
            try:
                out[i] = fn(np.asarray(v, dtype=np.float64))
            except Exception:
                out[i] = np.nan
        return pd.Series(out)

    return udf


def _series_param_udf(fn):
    """Wrap f(y, p) -> float with a per-call long parameter column."""

    @pandas_udf("double")
    def udf(col: pd.Series, p: pd.Series) -> pd.Series:
        out = np.empty(len(col))
        for i, (v, pi) in enumerate(zip(col, p)):
            try:
                out[i] = fn(np.asarray(v, dtype=np.float64), int(pi))
            except Exception:
                out[i] = np.nan
        return pd.Series(out)

    return udf


# built lazily: pandas_udf type parsing needs an active SparkSession
_SCALAR_KERNELS = {
    "hctsa_mean": K.mean_,
    "hctsa_std": K.spread_std,
    "hctsa_iqr": K.spread_iqr,
    "hctsa_burstiness": lambda y: K.burstiness(y)["B"],
    "hctsa_burstiness_kim": lambda y: K.burstiness(y)["B_Kim"],
    "hctsa_trev": lambda y: K.trev(y, 1)["raw"],
    "hctsa_tc3": lambda y: K.tc3(y, 1)["raw"],
    "hctsa_first_crossing_ac": lambda y: K.first_crossing_ac(y)["firstCrossing"],
    "hctsa_sampen": lambda y: E.sample_entropy(y, 2)["sampen2"],
    "hctsa_permen": lambda y: E.perm_entropy_ref(y, 3)["normPermEn"],
    "hctsa_lzcomplexity": lambda y: E.lz_complexity(y, 2),
    "hctsa_dfa": PH.fast_dfa,
    "hctsa_trend_slope": lambda y: K.trend(y)["gradient"],
    "hctsa_statav5": lambda y: K.stat_av(y, "seg", 5),
    "hctsa_cv": lambda y: K.cv(y, 1),
    "hctsa_skew_pearson": lambda y: K.custom_skewness(y, "pearson"),
    "hctsa_trimmed_mean10": lambda y: K.trimmed_mean(y, 10.0),
    "hctsa_rad": lambda y: K.rad(y, 2),
    "hctsa_motif2_uu": lambda y: K.motif_two(y, "diff")["uu"],
    "hctsa_motif2_hhhh": lambda y: K.motif_two(y, "diff")["hhhh"],
    "hctsa_periodicity_wang": lambda y: _periodicity_th2(y),
    "hctsa_cid_ce": lambda y: K.cid_ce(y)["CE1"],
}
_PARAM_KERNELS = {
    "hctsa_ac": K.autocorr_fourier,
    "hctsa_ac_td": K.autocorr_timedomain,
}


def register_sql_udfs(spark: SparkSession) -> list[str]:
    """Register all SQL kernel functions; returns the registered names."""
    names = []
    for name, fn in _SCALAR_KERNELS.items():
        spark.udf.register(name, _series_udf(fn))
        names.append(name)
    for name, fn in _PARAM_KERNELS.items():
        spark.udf.register(name, _series_param_udf(fn))
        names.append(name)
    return sorted(names)
