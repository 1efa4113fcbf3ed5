"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare
row-count, column names, and order-insensitive values."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyhctsa_spark.plans.oracle_queries import TABLES  # noqa: E402
from pyhctsa_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            # DuckDB int32 vs Spark int64 on identical values must not
            # read as a value mismatch (Series.equals is dtype-strict)
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

    own_session = SparkSession.getActiveSession() is None
    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    only = os.environ.get("ORACLE_ONLY")
    if only:
        keep = only.split(",")
        unknown = [k for k in keep if k not in qs]
        if unknown:
            # a typo must not shrink the gate to a vacuous pass
            print(f"FATAL: unknown ORACLE_ONLY names: {unknown}")
            return 1
        qs = {k: v for k, v in qs.items() if k in keep}
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad_cols = []
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                b[c].dtype, np.floating
            ):
                av = a[c].to_numpy(np.float64)
                bv = b[c].to_numpy(np.float64)
                ok = np.allclose(av, bv, rtol=0, atol=1.5e-6, equal_nan=True)
                exact = np.array_equal(av, bv, equal_nan=True)
                if not ok:
                    bad_cols.append(c)
                elif not exact:
                    n_diff = int(np.sum(av != bv))
                    print(f"  note {name}.{c}: {n_diff} values differ below 1.5e-6")
            else:
                if not a[c].equals(b[c]):
                    bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                mask = ~np.isclose(
                    pd.to_numeric(a[c], errors="coerce"),
                    pd.to_numeric(b[c], errors="coerce"),
                    rtol=0, atol=1.5e-6, equal_nan=True,
                ) if np.issubdtype(a[c].dtype, np.floating) else (a[c] != b[c])
                print("   spark:", a.loc[mask].head(3).to_dict("records"))
                print("   duck :", b.loc[mask].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    if own_session:
        spark.stop()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
