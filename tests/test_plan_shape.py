"""Physical-plan regression gates: the flagship must stay shuffle-free
and column-pruned; the cascade's only exchange is its fine-grained
groupBy."""

from pyhctsa_spark.operators.rollup import cascade_from_store, rollup_tiers
from pyhctsa_spark.sources.synthetic import sequences_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_plan_has_no_exchange(spark):
    df = sequences_df(spark, 10, partitions=2, binary=True)
    plan = _plan(rollup_tiers(df))
    assert "Exchange" not in plan  # zero shuffles end-to-end
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_rollup_prunes_columns_from_parquet_scan(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq") / "p")
    sequences_df(spark, 10, partitions=2, binary=True).write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path)
    plan = _plan(rollup_tiers(df.drop("n_tok")))
    # the parquet scan must not read n_tok (dropped) — ReadSchema pruned
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "n_tok" not in read_schema


def test_cascade_plan_single_exchange_on_doc_keys(spark):
    df = sequences_df(spark, 10, partitions=2, binary=True)
    t0 = rollup_tiers(df, n_tiers=1)
    plan = _plan(cascade_from_store(t0))
    # exactly one shuffle, keyed on (doc_id, parent_idx) — no source keys
    assert plan.count("Exchange hashpartitioning") == 1
    assert "doc_id" in plan.split("Exchange hashpartitioning", 1)[1].splitlines()[0]
