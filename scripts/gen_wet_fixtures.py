"""WET ingestion fixtures + golden — derived from the WARC SPEC, not
the engine (no pyhctsa_spark import: this script carries its own
minimal record serializer, so the committed archives and the expected
parse are both spec-side; the engine's parser is the thing under test).

Writes tests/fixtures/wet/part-0000{0,1,2}.warc.wet.gz — three archives
of 30 deterministic conversion records each (one gzip member per
record, mtime=0, the Common Crawl layout) plus a leading warcinfo
record — and tests/golden/wet_ingest_90.parquet with the expected
parsed rows (doc_id, url, ts, content_type, n_bytes, n_words,
text_md5).

Texts are seeded word salad over a fixed vocabulary with deliberate
edge content: empty text, unicode, embedded lone LF and CRLF sequences
(payload bytes must be length-delimited, not terminator-delimited),
and a text that itself starts with "WARC/1.0".

Regenerate: python scripts/gen_wet_fixtures.py
Verify only: python scripts/gen_wet_fixtures.py --check
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX_DIR = os.path.join(ROOT, "tests", "fixtures", "wet")
GOLDEN = os.path.join(ROOT, "tests", "golden", "wet_ingest_90.parquet")
N_FILES = 3
RECS_PER_FILE = 30

VOCAB = ("the quick brown fox jumps over lazy dog data spark rollup "
         "tier window token stream crawl web page text corpus "
         "training pipeline dedup quality filter shard").split()


def make_text(rng: np.random.Generator, i: int) -> str:
    k = int(rng.integers(5, 80))
    words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), k)]
    text = " ".join(words)
    if i % 17 == 3:
        return ""  # empty conversion payload
    if i % 17 == 5:
        return "naïve café — 絵文字 " + text  # unicode
    if i % 17 == 7:
        return text[:10] + "\nline two\r\nline three\r\n\r\n" + text[10:]
    if i % 17 == 11:
        return "WARC/1.0 looks like a header but is payload " + text
    return text


def record_bytes(rec_type: str, headers: dict[str, str],
                 payload: bytes) -> bytes:
    head = ["WARC/1.0", f"WARC-Type: {rec_type}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    head.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build() -> tuple[dict[str, bytes], pd.DataFrame]:
    files: dict[str, bytes] = {}
    rows = []
    for f in range(N_FILES):
        buf = io.BytesIO()

        def member(chunk: bytes) -> None:
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(chunk)

        member(record_bytes("warcinfo", {
            "WARC-Record-ID": f"<urn:uuid:info-{f:04d}>",
            "Content-Type": "application/warc-fields",
        }, b"software: fixture\r\n"))
        for r in range(RECS_PER_FILE):
            i = f * RECS_PER_FILE + r
            rng = np.random.default_rng(7000 + i)
            text = make_text(rng, i)
            payload = text.encode("utf-8")
            url = f"https://example-{i % 7}.org/page/{i}"
            ts = f"2026-01-{(i % 28) + 1:02d}T0{i % 10}:00:00Z"
            rid = f"<urn:uuid:{i:08d}-0000-0000-0000-00000000{i:04d}>"
            member(record_bytes("conversion", {
                "WARC-Target-URI": url,
                "WARC-Date": ts,
                "WARC-Record-ID": rid,
                "Content-Type": "text/plain",
            }, payload))
            rows.append({
                "doc_id": rid,
                "url": url,
                "ts": ts,
                "content_type": "text/plain",
                "n_bytes": len(payload),
                "n_words": len(text.split()),
                "text_md5": hashlib.md5(payload).hexdigest(),
            })
        files[f"part-{f:05d}.warc.wet.gz"] = buf.getvalue()
    pdf = pd.DataFrame(rows)
    pdf["n_bytes"] = pdf["n_bytes"].astype("int32")
    pdf["n_words"] = pdf["n_words"].astype("int32")
    return files, pdf


def main() -> int:
    files, pdf = build()
    if "--check" in sys.argv:
        ok = True
        for name, data in files.items():
            path = os.path.join(FIX_DIR, name)
            ok &= os.path.exists(path) and open(path, "rb").read() == data
        old = pd.read_parquet(GOLDEN)
        ok &= old[pdf.columns].equals(pdf)
        print(f"fixtures+golden match vs committed: {bool(ok)}")
        return 0 if ok else 1
    os.makedirs(FIX_DIR, exist_ok=True)
    for stale in glob.glob(os.path.join(FIX_DIR, "*.gz")):
        os.remove(stale)
    for name, data in files.items():
        with open(os.path.join(FIX_DIR, name), "wb") as fh:
            fh.write(data)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pdf.to_parquet(GOLDEN, index=False)
    print(f"wrote {len(files)} archives -> {FIX_DIR}; "
          f"{len(pdf)} golden rows -> {GOLDEN}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
