"""WARC / WET web-crawl ingestion source (the Common Crawl formats).

A 100 TB training-data pipeline starts from crawl archives: gzipped
WARC files (ISO 28500) or their plain-text WET conversions, ~1 GB each,
tens of thousands per dump. The scalable Spark shape — used by Common
Crawl's own cc-pyspark — is one file per task:

    spark.read.format("binaryFile").load("s3://.../\\*.warc.wet.gz")

gives (path, content) rows WITHOUT splitting (gzip is not splittable),
so parallelism equals file count (64k+ files per dump saturates any
cluster) and each task stream-parses its own archive. This module
provides the pure-Python record parser (stdlib gzip + bytes scanning,
no external libs), the Arrow-batched Spark wiring, and a fixture-grade
WET/WARC writer for tests.

Format essentials (public ISO 28500 / WARC 1.0 spec):
- A record = version line ``WARC/1.0\\r\\n``, CRLF-separated
  ``Name: value`` headers, blank line, ``Content-Length`` payload
  bytes, then TWO CRLFs.
- Archives are CONCATENATED gzip members (one record per member, per
  the spec's recommendation); ``gzip.decompress`` handles concatenated
  members natively.
- WET files are WARC files whose records are ``warcinfo`` +
  ``conversion`` records; conversion payloads are UTF-8 text.

At 100 TB scale nothing here shuffles: ingestion is a scan-side
``mapInPandas`` over file rows; downstream curation (quality → dedup →
pack) owns the shuffles.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_DOC_SCHEMA = (
    "doc_id string, url string, ts string, rec_type string, "
    "content_type string, text string, n_bytes int, source string"
)


def parse_warc(raw: bytes) -> Iterator[dict]:
    """Stream WARC records out of (possibly gzipped, possibly
    multi-member) archive bytes. Yields dicts with lower-cased header
    keys plus ``payload`` bytes. Tolerates LF-only header endings and
    trailing garbage after the last record."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # concatenated members supported
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        line_end = raw.find(b"\n", pos)
        if line_end < 0:
            return
        version = raw[pos:line_end].strip()
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC/x.y version line at offset {pos}, "
                f"got {version[:40]!r}"
            )
        # header block ends at the FIRST blank line, whichever line
        # ending this record uses (a mixed archive can contain both)
        crlf_end = raw.find(b"\r\n\r\n", line_end)
        lf_end = raw.find(b"\n\n", line_end)
        if crlf_end >= 0 and (lf_end < 0 or crlf_end <= lf_end):
            hdr_end, sep = crlf_end, 4
        elif lf_end >= 0:
            hdr_end, sep = lf_end, 2
        else:
            raise ValueError("WARC header block not terminated")
        headers: dict[str, str] = {}
        for hline in raw[line_end + 1 : hdr_end].splitlines():
            if b":" not in hline:
                continue
            k, v = hline.split(b":", 1)
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + sep
        payload = raw[body_start : body_start + length]
        headers["payload"] = payload
        yield headers
        pos = body_start + length


def wet_text_records(raw: bytes) -> Iterator[dict]:
    """Yield only ``conversion`` (WET text) records, payload decoded as
    UTF-8, as dicts: url, ts, record_id, content_type, text, n_bytes."""
    for rec in parse_warc(raw):
        if rec.get("warc-type") != "conversion":
            continue
        payload: bytes = rec["payload"]
        yield {
            "url": rec.get("warc-target-uri", ""),
            "ts": rec.get("warc-date", ""),
            "record_id": rec.get("warc-record-id", ""),
            "content_type": rec.get("content-type", ""),
            "text": payload.decode("utf-8", "replace"),
            "n_bytes": len(payload),
        }


def read_wet(spark: SparkSession, path: str,
             source: str = "commoncrawl") -> DataFrame:
    """WET archives -> documents DataFrame, one task per file.

    ``path`` is any binaryFile-compatible glob. Output columns follow
    WARC_DOC_SCHEMA; ``doc_id`` is the WARC-Record-ID (globally unique
    per spec). The plan is Scan -> MapInPandas (no shuffle); downstream
    repartitioning is the caller's choice (e.g. salted_repartition on
    a hash of doc_id before heavy curation).
    """
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_val, content in zip(pdf["path"], pdf["content"]):
                fname = str(path_val)
                for r in wet_text_records(bytes(content)):
                    rows.append((
                        r["record_id"], r["url"], r["ts"], "conversion",
                        r["content_type"], r["text"], r["n_bytes"],
                        source if source else fname,
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "url", "ts", "rec_type", "content_type",
                "text", "n_bytes", "source",
            ])

    return files.select("path", "content").mapInPandas(
        gen, schema=WARC_DOC_SCHEMA)


def read_warc_responses(spark: SparkSession, path: str,
                        source: str = "commoncrawl") -> DataFrame:
    """Full WARC archives -> one row per ``response`` record with the
    raw HTTP payload body (headers stripped) as ``text`` (UTF-8,
    replacement-decoded). Non-response records are skipped."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content)):
                    if rec.get("warc-type") != "response":
                        continue
                    payload: bytes = rec["payload"]
                    # strip the HTTP response header block if present
                    if payload[:5] in (b"HTTP/",):
                        for sep in (b"\r\n\r\n", b"\n\n"):
                            cut = payload.find(sep)
                            if cut >= 0:
                                payload = payload[cut + len(sep):]
                                break
                    rows.append((
                        rec.get("warc-record-id", ""),
                        rec.get("warc-target-uri", ""),
                        rec.get("warc-date", ""),
                        "response",
                        rec.get("content-type", ""),
                        payload.decode("utf-8", "replace"),
                        len(payload),
                        source,
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "url", "ts", "rec_type", "content_type",
                "text", "n_bytes", "source",
            ])

    return files.select("content").mapInPandas(gen, schema=WARC_DOC_SCHEMA)


# ---------------------------------------------------------------------------
# fixture-grade writers (spec-shaped output; used by tests and goldens)
# ---------------------------------------------------------------------------

def _record_bytes(rec_type: str, headers: dict[str, str],
                  payload: bytes) -> bytes:
    head = [f"WARC/1.0"]
    head.append(f"WARC-Type: {rec_type}")
    for k, v in headers.items():
        head.append(f"{k}: {v}")
    head.append(f"Content-Length: {len(payload)}")
    block = "\r\n".join(head).encode() + b"\r\n\r\n"
    return block + payload + b"\r\n\r\n"


def write_wet(records: list[dict], gzip_members: bool = True) -> bytes:
    """Serialize WET conversion records (dicts with url/ts/record_id/
    text) as a spec-shaped WET archive: a warcinfo record followed by
    one conversion record each, one gzip member per record when
    ``gzip_members`` (the Common Crawl layout) else plain bytes."""
    out: list[bytes] = []
    info = _record_bytes("warcinfo", {
        "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        "Content-Type": "application/warc-fields",
    }, b"software: pyhctsa_spark fixture writer\r\n")
    out.append(info)
    for r in records:
        payload = r["text"].encode("utf-8")
        out.append(_record_bytes("conversion", {
            "WARC-Target-URI": r["url"],
            "WARC-Date": r["ts"],
            "WARC-Record-ID": r["record_id"],
            "Content-Type": "text/plain",
        }, payload))
    if not gzip_members:
        return b"".join(out)
    buf = io.BytesIO()
    for chunk in out:  # one member per record, per the WARC spec
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(chunk)
    return buf.getvalue()
