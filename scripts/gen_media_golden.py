"""Generate the golden snapshot for the media_features oracle.

The multimodal fake decoder (operators/multimodal._fake_decode) is
seeded by payload bytes and fully deterministic, so the engine output
for synth_media_df(48) is reproducible bit-for-bit. This script runs
the exact driver query (__spark_entry__._media_features_query) and
writes one parquet file the DuckDB oracle reads back verbatim.

Regenerate with: python scripts/gen_media_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyhctsa_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "media_features_48.parquet",
)


def main() -> None:
    spark = get_spark("gen-media-golden", master="local[4]")
    pdf = entrymod._media_features_query(spark, "").toPandas()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
