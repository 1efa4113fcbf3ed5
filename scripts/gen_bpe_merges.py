"""Train and commit the BPE merges table from the sf0.01 document corpus.

Offline, driver-side (the merges file is a model artifact, like IVF
centroids): word frequencies via DuckDB, classic BPE training
(operators/bpe.train_bpe_merges — deterministic tie-breaks), written to
resources/bpe_merges.json.

Regenerate: python scripts/gen_bpe_merges.py
Verify only: python scripts/gen_bpe_merges.py --check
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pyhctsa_spark.operators.bpe import MERGES_PATH, train_bpe_merges  # noqa: E402

CORPUS = "/root/testdata/sf0.01/documents.parquet"
NUM_MERGES = 80


def main() -> int:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, count(*) AS c FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS w FROM read_parquet('{CORPUS}')) WHERE w <> '' GROUP BY w"
    ).fetchall()
    merges = train_bpe_merges({w: c for w, c in rows}, NUM_MERGES)
    payload = {"trained_on": "sf0.01/documents.parquet",
               "num_merges": len(merges),
               "merges": [list(m) for m in merges]}
    if "--check" in sys.argv:
        with open(MERGES_PATH) as f:
            old = json.load(f)
        same = old["merges"] == payload["merges"]
        print(f"merges match committed: {same} ({len(merges)} merges)")
        return 0 if same else 1
    os.makedirs(os.path.dirname(MERGES_PATH), exist_ok=True)
    with open(MERGES_PATH, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {len(merges)} merges -> {MERGES_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
