"""SQL-surface kernels: registered pandas UDFs match in-process kernels."""

import numpy as np
import pytest

from pyhctsa_spark.functions import kernels as K
from pyhctsa_spark.functions.sql_udfs import register_sql_udfs
from pyhctsa_spark.sources.synthetic import make_doc, sequences_df


def test_sql_udfs_match_kernels(spark):
    names = register_sql_udfs(spark)
    assert "hctsa_ac" in names and "hctsa_sampen" in names
    df = sequences_df(spark, 6, partitions=2)
    df.createOrReplaceTempView("seq_sql_test")
    out = spark.sql(
        """
        SELECT doc_id,
               hctsa_mean(tokens)   AS m,
               hctsa_std(tokens)    AS s,
               hctsa_ac(tokens, 1)  AS ac1,
               hctsa_burstiness(tokens) AS b,
               hctsa_trend_slope(tokens) AS slope
        FROM seq_sql_test
        """
    ).toPandas().set_index("doc_id")
    for doc_id, row in out.iterrows():
        _, toks, _ = make_doc(int(doc_id[3:]))
        y = toks.astype(np.float64)
        assert row["m"] == pytest.approx(np.mean(y), rel=1e-12)
        assert row["s"] == pytest.approx(np.std(y, ddof=1), rel=1e-12)
        assert row["ac1"] == pytest.approx(K.autocorr_fourier(y, 1), rel=1e-9)
        assert row["b"] == pytest.approx(K.burstiness(y)["B"], rel=1e-10)
        assert row["slope"] == pytest.approx(K.trend(y)["gradient"], rel=1e-8)


def test_sql_udfs_error_isolation(spark):
    register_sql_udfs(spark)
    spark.sql("SELECT array(1, 1, 1) AS tokens").createOrReplaceTempView("const_seq")
    row = spark.sql(
        "SELECT hctsa_ac(tokens, 1) AS ac, hctsa_mean(tokens) AS m FROM const_seq"
    ).first()
    assert row["m"] == 1.0
    assert row["ac"] is None or np.isnan(row["ac"])  # constant -> NaN, not error
