"""Optimization-round-6 equivalence tests: every operator whose
execution shape changed this round must produce BIT-IDENTICAL output
to the pre-optimization formulation (the driver hashes values, so
"close" is not enough — see OPTIMIZATION_r06.md)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

needs_sf = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="sf0.01 testdata not present"
)


def _positive_pairs_join_reference(emb, docs, min_cos):
    """The pre-round-6 formulation (id-ordered self-join, dot/norm as
    interpreted higher-order-function folds) — kept verbatim as the
    bit-exactness reference for the blocked numpy rewrite."""
    from pyhctsa_spark.operators.similarity import _as_double, _dot, _norm

    v = emb.select(
        F.col("vec_id").alias("vid"), _as_double(F.col("embedding")).alias("e")
    )
    a = v.select(F.col("vid").alias("id_a"), F.col("e").alias("ea"))
    b = v.select(F.col("vid").alias("id_b"), F.col("e").alias("eb"))
    zero = F.lit(0.0).cast("double")
    cos = _dot(F.col("ea"), F.col("eb")) / F.nullif(
        _norm(F.col("ea")) * _norm(F.col("eb")), zero
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos6"))
        .where(
            F.col("cos6").isNotNull()
            & ~F.isnan("cos6")
            & (F.col("cos6") >= F.lit(float(min_cos)).cast("double"))
        )
    )
    fp = docs.select(
        F.col("doc_id").alias("_fpid"), F.md5(F.col("text")).alias("_fp")
    )
    fpa = fp.select(F.col("_fpid").alias("id_a"), F.col("_fp").alias("_fp_a"))
    fpb = fp.select(F.col("_fpid").alias("id_b"), F.col("_fp").alias("_fp_b"))
    return (
        pairs.join(F.broadcast(fpa), "id_a")
        .join(F.broadcast(fpb), "id_b")
        .where(~F.col("_fp_a").eqNullSafe(F.col("_fp_b")))
        .select("id_a", "id_b", "cos6")
    )


@needs_sf
def test_positive_pairs_bit_identical_to_join_formulation(spark):
    from pyhctsa_spark.operators.similarity import positive_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = sorted(
        (r.id_a, r.id_b, r.cos6)
        for r in positive_pairs(emb, docs, min_cos=0.4).collect()
    )
    old = sorted(
        (r.id_a, r.id_b, r.cos6)
        for r in _positive_pairs_join_reference(emb, docs, 0.4).collect()
    )
    assert len(new) == len(old) and len(new) > 0
    # exact equality, not allclose: the numpy fold replays the JVM
    # aggregate fold op-for-op, and Spark still does the round-6
    for got, want in zip(new, old):
        assert got == want
