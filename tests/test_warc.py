"""WARC (raw crawl archive) source: parse fidelity, record-type
filtering, status/content-type extraction, round-trip, and the
enrich_pages R26 integration."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from search_engine_spark.sources.pages import enrich_pages
from search_engine_spark.sources.warc import read_warc, write_warc

WARC_SAMPLE = (
    "WARC/1.0\r\n"
    "WARC-Type: warcinfo\r\n"
    "WARC-Date: 2024-03-01T00:00:00Z\r\n"
    "Content-Type: application/warc-fields\r\n"
    "Content-Length: 25\r\n"
    "\r\n"
    "software: test-generator\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: request\r\n"
    "WARC-Target-URI: https://a.example/page1\r\n"
    "WARC-Date: 2024-03-01T01:02:03Z\r\n"
    "Content-Type: application/http; msgtype=request\r\n"
    "\r\n"
    "GET /page1 HTTP/1.1\r\n"
    "Host: a.example\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://a.example/page1\r\n"
    "WARC-Date: 2024-03-01T01:02:03Z\r\n"
    "Content-Type: application/http; msgtype=response\r\n"
    "\r\n"
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/html; charset=UTF-8\r\n"
    "Server: nginx\r\n"
    "\r\n"
    "<html><head><title>One</title></head>"
    "<body><p>alpha beta gamma</p></body></html>\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://b.example/missing\r\n"
    "WARC-Date: 2024-03-02T00:00:00Z\r\n"
    "Content-Type: application/http; msgtype=response\r\n"
    "\r\n"
    "HTTP/1.1 404 Not Found\r\n"
    "Content-Type: text/html\r\n"
    "\r\n"
    "<html><body>not found</body></html>\r\n"
    "\r\n"
)


def _write(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_parse_sample(spark, tmp_path):
    path = _write(tmp_path, "sample.warc", WARC_SAMPLE.encode())
    rows = {r["url"]: r for r in read_warc(spark, path).collect()}
    # warcinfo + request records filtered, both responses kept
    assert set(rows) == {
        "https://a.example/page1",
        "https://b.example/missing",
    }
    ok = rows["https://a.example/page1"]
    assert ok["code"] == 200
    assert ok["content_type"] == "text/html"
    assert ok["warc_ts"] == "2024-03-01T01:02:03Z"
    assert ok["html"].startswith("<html><head><title>One</title>")
    assert ok["html"].endswith("</html>")
    assert rows["https://b.example/missing"]["code"] == 404


def test_gzip_input(spark, tmp_path):
    path = _write(
        tmp_path, "sample.warc.gz", gzip.compress(WARC_SAMPLE.encode())
    )
    assert read_warc(spark, path).count() == 2


def test_round_trip(spark, tmp_path):
    src = _write(tmp_path, "sample.warc", WARC_SAMPLE.encode())
    df = read_warc(spark, src)
    out = str(tmp_path / "rt")
    write_warc(df, out, code_col="code")
    back = read_warc(spark, out)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_enrich_pages_r26_integration(spark, tmp_path):
    """read_warc → enrich_pages(use_html=True): the 404 page drops at
    the R26 guard, the 200 page gets extracted text + site."""
    path = _write(tmp_path, "sample.warc", WARC_SAMPLE.encode())
    pages = (
        read_warc(spark, path)
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit("english"))
    )
    enriched = enrich_pages(pages, use_html=True).collect()
    assert len(enriched) == 1
    row = enriched[0]
    assert row["url"] == "https://a.example/page1"
    assert row["site"] == "a.example"
    assert "alpha beta gamma" in row["text"]
