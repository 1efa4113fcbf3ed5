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


def _minhash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: MinHash-LSH near-dup candidate pairs on documents
    (signature hashing is xxhash64-seeded — not reproducible in ANSI SQL;
    the exact-jaccard analogue is oracle-checked as doc_ngram_jaccard)."""
    from pyhctsa_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup_pairs(docs, threshold=0.3)


def _simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: SimHash fingerprints + near pairs (bit-vote fingerprint
    verified against an independent numpy implementation in tests)."""
    from pyhctsa_spark.operators.dedup import simhash64, simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_pairs(simhash64(docs), max_hamming=6)


def _knn_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: IVF approximate nearest neighbors (recall vs the exact
    knn_cosine_top3 oracle is asserted in tests)."""
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.similarity import knn_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_ivf(emb, emb.where(F.col("vec_id") < 5), k=3)


def _media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: multimodal decode->featurize plumbing on the synthetic
    media table (deterministic fake decoder; see operators/multimodal)."""
    from pyhctsa_spark.operators.multimodal import (
        extract_media_features,
        synth_media_df,
    )

    return extract_media_features(synth_media_df(spark, 48))


def _feature_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: hctsa-style feature-matrix extraction (a compact
    registry subset) over event-derived sequences — the generic
    extract_features operator; per-kernel math is golden-tested."""
    from pyhctsa_spark.functions import kernels as K
    from pyhctsa_spark.operators.features import extract_features
    from pyhctsa_spark.plans.registry import FeatureSet, Operation, expand

    fs = FeatureSet(
        expand(
            [
                Operation(K.mean_, "DN_Mean"),
                Operation(K.spread_std, "DN_Spread_std"),
                Operation(K.autocorr_fourier, "AC", ["tau"], [{"tau": [1, 2, 3]}]),
                Operation(K.burstiness, "DN_Burstiness"),
                Operation(K.trev, "CO_trev", ["tau"], [{"tau": [1]}]),
                Operation(K.perm_entropy, "EN_PermEn_norm", ["m"], [{"m": [3]}]),
            ]
        )
    )
    seq = _sequences_from_events(spark, sf_dir)
    return extract_features(seq, fs, window=16)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _mk(name) for name in OQ.QUERIES
    }
    out["rollup_tiers_events"] = _rollup_events_query
    out["minhash_dedup_pairs"] = _minhash_dedup_query
    out["simhash_near_pairs"] = _simhash_query
    out["knn_ivf"] = _knn_ivf_query
    out["media_features"] = _media_features_query
    out["feature_matrix"] = _feature_matrix_query
    return out


def oracle_sql() -> dict[str, str]:
    return {name: OQ.duck_sql_for(name) for name in OQ.QUERIES}
