"""Compressed rollup store: Gorilla values + delta-of-delta offsets.

The materialized store holds one row per (doc_id, tier) BLOCK rather than
per window: window indices are delta-of-delta encoded and each feature
stream is Gorilla-XOR encoded into a BINARY column (functions/codec.py),
with per-block checksums and raw/compressed byte counters. This is the
retention-tier layout — long-lived tiers compress ~5-20x vs plain
doubles while staying random-accessible per doc.

``write_compressed_store`` groups by (doc_id, tier) — fine-grained keys,
so the shuffle has no source-level skew. ``read_compressed_store``
restores the plain per-window table (ALG + HOL feature columns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pyhctsa_spark.functions.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

FEATURES = [
    "mean", "variance", "spread_std", "spread_iqr",
    "ac1_td", "ac2_td", "ac1_fourier", "burst_b", "burst_b_kim",
]

_BLOCK_SCHEMA = (
    "doc_id string, source string, tier int, n_windows int, n long, "
    "widx_bin binary, "
    + ", ".join(f"{f}_bin binary" for f in FEATURES)
    + ", raw_bytes long, comp_bytes long"
)


def _encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("window_idx")
    widx = pdf["window_idx"].to_numpy(np.int64)
    blobs = {"widx_bin": dod_encode(widx)}
    raw = widx.nbytes
    for f in FEATURES:
        vals = pdf[f].to_numpy(np.float64)
        blobs[f"{f}_bin"] = gorilla_encode(vals)
        raw += vals.nbytes
    comp = sum(len(b) for b in blobs.values())
    return pd.DataFrame(
        [{
            "doc_id": pdf["doc_id"].iloc[0],
            "source": pdf["source"].iloc[0],
            "tier": int(pdf["tier"].iloc[0]),
            "n_windows": len(pdf),
            "n": int(pdf["n"].iloc[0]),
            **blobs,
            "raw_bytes": raw,
            "comp_bytes": comp,
        }]
    )


def write_compressed_store(tier_df: DataFrame, path: str) -> None:
    (
        tier_df.groupBy("doc_id", "tier")
        .applyInPandas(_encode_block, schema=_BLOCK_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_tier_bucketed(
    tier_df: DataFrame, table: str, path: str, num_buckets: int = 256,
) -> None:
    """Materialize a rollup tier bucketed by doc_id.

    HashPartitioning(doc_id) satisfies the clustered distribution of
    every downstream per-doc operation, so reads from this table feed
    ``cascade_from_store`` (groupBy doc_id, parent_idx) and any per-doc
    rollup/aggregation with ZERO shuffle — the Exchange disappears from
    the plan (pytest-enforced). This is the continuous-aggregate layout
    at warehouse scale: each retention cascade is a bucket-local
    map-side aggregation; size num_buckets to the cluster (e.g. 2-4x
    executor count).
    """
    (
        tier_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "doc_id")
        .sortBy("doc_id")
        .option("path", path)
        .saveAsTable(table)
    )


def read_tier_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed tier table (bucket metadata preserved, so
    downstream per-doc groupings stay exchange-free)."""
    return spark.table(table)


_DECODED_SCHEMA = (
    "doc_id string, source string, tier int, window_idx long, n long, "
    + ", ".join(f"{f} double" for f in FEATURES)
)


def _decode_blocks(batches):
    for pdf in batches:
        outs = []
        for row in pdf.itertuples(index=False):
            widx = dod_decode(row.widx_bin)
            cols = {
                "doc_id": [row.doc_id] * len(widx),
                "source": [row.source] * len(widx),
                "tier": np.full(len(widx), row.tier, dtype=np.int32),
                "window_idx": widx,
                "n": np.full(len(widx), row.n, dtype=np.int64),
            }
            for f in FEATURES:
                cols[f] = gorilla_decode(getattr(row, f"{f}_bin"))
            outs.append(pd.DataFrame(cols))
        if outs:
            yield pd.concat(outs, ignore_index=True)


def read_compressed_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).mapInPandas(
        _decode_blocks, schema=_DECODED_SCHEMA
    )


def compression_report(spark: SparkSession, path: str) -> dict:
    row = (
        spark.read.parquet(path)
        .selectExpr(
            "sum(raw_bytes) AS raw",
            "sum(comp_bytes) AS comp",
            "count(*) AS blocks",
            "sum(n_windows) AS windows",
        )
        .first()
    )
    return {
        "raw_bytes": row["raw"],
        "comp_bytes": row["comp"],
        "blocks": row["blocks"],
        "windows": row["windows"],
        "ratio": round(row["raw"] / row["comp"], 2) if row["comp"] else None,
    }
