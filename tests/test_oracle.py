"""Driver-contract gate: every queries() entry vs its DuckDB oracle at
sf0.001 (fast tier; scripts/check_oracle.py runs the same at sf0.01)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_oracle_all_queries_match(spark, monkeypatch):
    monkeypatch.setenv("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    import importlib

    import scripts.check_oracle as co

    importlib.reload(co)
    assert co.main() == 0


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    assert "mean" in df.columns and "tier" in df.columns


def test_queries_oracle_keys_consistent():
    import __spark_entry__ as em

    q = em.queries()
    o = em.oracle_sql()
    assert set(o) <= set(q)
    # the only oracle-less query is the full-schema rollup (HOL columns)
    assert set(q) - set(o) == {"rollup_full_events"}
