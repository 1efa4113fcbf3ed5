"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship 3-tier rollup over token sequences derived
from the sf0.001 test tables. ``queries()`` / ``oracle_sql()`` — the
SQL-native operator catalog (pyhctsa_spark/plans/oracle_queries.py) with
DuckDB oracles, plus rows-only entries for ops whose semantics are not
ANSI-SQL-expressible (noted in each docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyhctsa_spark.plans import oracle_queries as OQ  # noqa: E402


def _sequences_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View the events table as one pre-tokenized sequence per user:
    tokens = round(value) ordered by event_id (input_hint shape)."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "_entry_events"
    )
    return spark.sql(
        """
        SELECT CAST(user_id AS STRING)                       AS doc_id,
               transform(
                 array_sort(collect_list(struct(event_id, value))),
                 s -> CAST(round(s.value) AS INT))           AS tokens,
               CAST(count(*) AS INT)                         AS n_tok,
               concat('evt', CAST(pmod(user_id, 4) AS STRING)) AS source,
               CAST(NULL AS LONG)                            AS tok_checksum
        FROM _entry_events
        GROUP BY user_id
        """
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-tier continuous-aggregate rollup on sf0.001."""
    from pyhctsa_spark.operators.rollup import rollup_tiers

    seq = _sequences_from_events(spark, "/root/testdata/sf0.001")
    return rollup_tiers(seq, window=8, group=4, n_tiers=3, lags=[1, 2])


def _mk(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        OQ.register_views(spark, sf_dir)
        return spark.sql(OQ.spark_sql_for(name))

    run.__name__ = f"q_{name}"
    return run


def _rollup_events_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: full engine rollup (mapInPandas kernels, ALG merge
    states, Fourier ACF, hazen IQR) over event-derived sequences. Not
    ANSI-SQL-expressible (FFT ACF + hazen quantiles); ALG columns are
    cross-checked against the SQL oracles via the win_* queries."""
    from pyhctsa_spark.operators.rollup import rollup_tiers

    seq = _sequences_from_events(spark, sf_dir)
    return rollup_tiers(seq, window=8, group=4, n_tiers=3, lags=[1, 2]).drop(
        "state_bin"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _mk(name) for name in OQ.QUERIES
    }
    out["rollup_tiers_events"] = _rollup_events_query
    return out


def oracle_sql() -> dict[str, str]:
    return {name: OQ.duck_sql_for(name) for name in OQ.QUERIES}
