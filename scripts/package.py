"""Build the spark-submit --py-files artifact.

Zips the pure-python ``pyhctsa_spark`` package (sorted entries, fixed
timestamps — byte-reproducible builds) into ``dist/pyhctsa_spark.zip``
and prints the submit command. The package has no compiled modules and
its only worker-side dependencies (numpy, pandas, pyarrow) ship with
every Spark runtime image, so the one zip is the whole deployment.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "pyhctsa_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "pyhctsa_spark")
    entries = []
    for dirpath, _, filenames in os.walk(pkg_root):
        for fn in filenames:
            # .py modules plus committed data resources (resources/
            # *.json — the BPE merges table is loaded via
            # importlib.resources, which reads from the zip)
            if not (fn.endswith(".py") or fn.endswith(".json")):
                continue
            if "__pycache__" in dirpath:
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    path = build()
    print(f"built {path} ({os.path.getsize(path)} bytes)")
    print(
        "submit with:\n"
        f"  spark-submit --py-files {path} jobs/rollup_job.py "
        "--input <sequences/> --store <store/>"
    )
