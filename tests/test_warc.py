"""WARC/WET crawl-archive ingestion: spec-bytes parser cases, the
committed fixture golden, and the Spark binaryFile -> mapInPandas path
(plan shape: no shuffle)."""

import glob
import gzip
import hashlib
import sys
from os.path import abspath, dirname, join

import pandas as pd
import pytest

sys.path.insert(0, dirname(dirname(abspath(__file__))))

from pyhctsa_spark.sources.warc import (  # noqa: E402
    parse_warc,
    read_warc_responses,
    read_wet,
    wet_text_records,
    write_wet,
)

REPO = dirname(dirname(abspath(__file__)))
FIX_GLOB = join(REPO, "tests", "fixtures", "wet", "*.warc.wet.gz")
GOLDEN = join(REPO, "tests", "golden", "wet_ingest_90.parquet")


def _hand_built_record(rec_type=b"conversion", payload=b"hello world",
                       lf_only=False):
    sep = b"\n" if lf_only else b"\r\n"
    head = sep.join([
        b"WARC/1.0",
        b"WARC-Type: " + rec_type,
        b"WARC-Target-URI: https://x.test/a",
        b"WARC-Date: 2026-01-01T00:00:00Z",
        b"WARC-Record-ID: <urn:uuid:42>",
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(payload)).encode(),
    ])
    return head + sep + sep + payload + b"\r\n\r\n"


def test_parse_hand_built_spec_bytes():
    recs = list(parse_warc(_hand_built_record()))
    assert len(recs) == 1
    r = recs[0]
    assert r["warc-type"] == "conversion"
    assert r["warc-target-uri"] == "https://x.test/a"
    assert r["payload"] == b"hello world"


def test_parse_lf_only_headers_and_multiple_records():
    raw = _hand_built_record(lf_only=True) + _hand_built_record()
    assert len(list(parse_warc(raw))) == 2


def test_payload_is_length_delimited_not_terminator_delimited():
    # payload containing CRLFCRLF and a fake WARC version line must
    # not confuse record framing
    tricky = b"part one\r\n\r\nWARC/1.0\r\nnot a header\r\n\r\npart two"
    raw = _hand_built_record(payload=tricky) + _hand_built_record()
    recs = list(parse_warc(raw))
    assert len(recs) == 2
    assert recs[0]["payload"] == tricky


def test_empty_payload_and_non_conversion_skip():
    raw = (_hand_built_record(rec_type=b"warcinfo", payload=b"sw: x\r\n")
           + _hand_built_record(payload=b""))
    texts = list(wet_text_records(raw))
    assert len(texts) == 1
    assert texts[0]["text"] == ""
    assert texts[0]["n_bytes"] == 0


def test_concatenated_gzip_members():
    m1 = gzip.compress(_hand_built_record(payload=b"alpha"))
    m2 = gzip.compress(_hand_built_record(payload=b"beta"))
    recs = list(parse_warc(m1 + m2))
    assert [r["payload"] for r in recs] == [b"alpha", b"beta"]


def test_garbage_raises():
    with pytest.raises(ValueError):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnot warc"))


def test_writer_parser_round_trip():
    recs = [{"url": f"http://t/{i}", "ts": "2026-02-02T00:00:00Z",
             "record_id": f"<urn:uuid:{i}>",
             "text": f"text {i} with unicode é and\r\nnewlines"}
            for i in range(5)]
    for gz in (True, False):
        back = list(wet_text_records(write_wet(recs, gzip_members=gz)))
        assert [b["text"] for b in back] == [r["text"] for r in recs]
        assert [b["url"] for b in back] == [r["url"] for r in recs]


def test_committed_fixtures_match_golden_without_spark():
    golden = pd.read_parquet(GOLDEN)
    rows = []
    for p in sorted(glob.glob(FIX_GLOB)):
        with open(p, "rb") as fh:
            for r in wet_text_records(fh.read()):
                rows.append((r["record_id"], r["url"], r["ts"],
                             r["content_type"], r["n_bytes"],
                             len(r["text"].split()),
                             hashlib.md5(r["text"].encode()).hexdigest()))
    got = pd.DataFrame(rows, columns=["doc_id", "url", "ts", "content_type",
                                      "n_bytes", "n_words", "text_md5"])
    got["n_bytes"] = got["n_bytes"].astype("int32")
    got["n_words"] = got["n_words"].astype("int32")
    assert got.equals(golden[got.columns])


def test_read_wet_spark_end_to_end(spark):
    docs = read_wet(spark, FIX_GLOB).cache()
    try:
        assert docs.count() == 90
        # one task per archive, no shuffle in the ingestion plan
        plan = docs._sc._jvm.PythonSQLUtils.explainString(
            docs._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan
        row = docs.filter("url = 'https://example-0.org/page/0'").first()
        assert row.rec_type == "conversion"
        assert row.source == "commoncrawl"
        # unicode record survives
        uni = docs.filter("doc_id like '%00000005-%'").first()
        assert "naïve café" in uni.text
    finally:
        docs.unpersist()


def test_wet_feeds_curation_funnel_end_to_end(spark):
    """Crawl ingestion -> curation: read_wet output plugs straight into
    the curation funnel (quality -> near-dup -> passage dedup -> PII ->
    mix -> pack -> shuffle) with string doc ids."""
    from jobs.curation_job import curate

    docs = read_wet(spark, FIX_GLOB)
    segments, addresses, stats = curate(
        spark, docs, threshold=0.05, seq_len=128,
        pack_shards=2, shuffle_shards=2)
    assert stats["docs_in"] == 90
    assert stats["after_quality"] > 0
    assert stats["segments"] > 0
    assert addresses.count() == stats["sequences"]


def test_read_warc_responses_strips_http_headers(spark, tmp_path):
    body = b"<html>hi</html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://r.test/\r\n"
           b"WARC-Record-ID: <urn:uuid:r1>\r\n"
           b"Content-Length: " + str(len(http)).encode()
           + b"\r\n\r\n" + http + b"\r\n\r\n")
    p = tmp_path / "one.warc.gz"
    p.write_bytes(gzip.compress(rec))
    out = read_warc_responses(spark, str(p)).collect()
    assert len(out) == 1
    assert out[0].text == "<html>hi</html>"
    assert out[0].n_bytes == len(body)
