"""WET (Common Crawl extracted-text) source: parse fidelity,
gzip handling, round-trip, and enrich_pages integration."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages
from search_engine_spark.sources.wet import read_wet, write_wet

WET_SAMPLE = (
    "WARC/1.0\r\n"
    "WARC-Type: warcinfo\r\n"
    "WARC-Date: 2024-03-01T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:aaaa>\r\n"
    "Content-Type: application/warc-fields\r\n"
    "Content-Length: 25\r\n"
    "\r\n"
    "software: test-generator\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Target-URI: https://a.example/page1\r\n"
    "WARC-Date: 2024-03-01T01:02:03Z\r\n"
    "WARC-Record-ID: <urn:uuid:bbbb>\r\n"
    "WARC-Identified-Content-Language: eng,rus\r\n"
    "Content-Type: text/plain\r\n"
    "Content-Length: 43\r\n"
    "\r\n"
    "First paragraph line one.\n\nSecond paragraph.\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: metadata\r\n"
    "WARC-Target-URI: https://a.example/page1\r\n"
    "WARC-Date: 2024-03-01T01:02:03Z\r\n"
    "Content-Length: 4\r\n"
    "\r\n"
    "meta\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Target-URI: https://b.example/page2\r\n"
    "WARC-Date: 2024-03-02T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:cccc>\r\n"
    "Content-Type: text/plain\r\n"
    "Content-Length: 19\r\n"
    "\r\n"
    "no language header\r\n"
    "\r\n"
)


def _expected():
    return {
        (
            "https://a.example/page1",
            "2024-03-01T01:02:03Z",
            "First paragraph line one.\n\nSecond paragraph.",
            "eng",
        ),
        (
            "https://b.example/page2",
            "2024-03-02T00:00:00Z",
            "no language header",
            None,
        ),
    }


def _rows_as_set(df):
    return {
        (r["url"], r["warc_ts"], r["text"], r["lang"])
        for r in df.collect()
    }


def test_parse_plain(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "seg-00000.warc.wet").write_text(WET_SAMPLE, newline="")
    got = read_wet(spark, str(p))
    assert _rows_as_set(got) == _expected()


def test_parse_gzip(spark, tmp_path):
    p = tmp_path / "crawlgz"
    p.mkdir()
    with gzip.open(p / "seg-00000.warc.wet.gz", "wb") as fh:
        fh.write(WET_SAMPLE.encode())
    got = read_wet(spark, str(p))
    assert _rows_as_set(got) == _expected()


def test_record_id_passthrough(spark, tmp_path):
    p = tmp_path / "ids"
    p.mkdir()
    (p / "f.wet").write_text(WET_SAMPLE, newline="")
    got = read_wet(spark, str(p), keep_record_id=True)
    ids = {r["record_id"] for r in got.collect()}
    assert ids == {"urn:uuid:bbbb", "urn:uuid:cccc"}


def test_roundtrip_write_read(spark, tmp_path):
    pages = enrich_pages(pages_df(spark, 60, n_sites=3, seed=7))
    src = pages.select(
        "url", F.lit("2024-03-01T00:00:00Z").alias("warc_ts"), "text"
    )
    out = str(tmp_path / "export.wet")
    write_wet(src, out)
    back = read_wet(spark, out)
    want = {(r["url"], r["text"]) for r in src.collect()}
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == want and len(got) == 60


def test_written_file_is_wet_shaped(spark, tmp_path):
    pages = enrich_pages(pages_df(spark, 5, n_sites=2, seed=7))
    src = pages.select(
        "url", F.lit("2024-03-01T00:00:00Z").alias("warc_ts"), "text"
    ).coalesce(1)
    out = str(tmp_path / "shape.wet")
    write_wet(src, out)
    part = next(
        f for f in os.listdir(out)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    raw = open(os.path.join(out, part), "rb").read().decode()
    assert raw.startswith("WARC/1.0\r\nWARC-Type: conversion\r\n")
    assert raw.count("WARC/1.0\r\n") == 5
    assert "Content-Length: " in raw


def test_enrich_and_index_from_wet(spark, tmp_path):
    """WET output feeds the standard build path end to end."""
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.search import search

    pages = enrich_pages(pages_df(spark, 80, n_sites=3, seed=11))
    src = pages.select(
        "url", F.lit("2024-01-01T00:00:00Z").alias("warc_ts"), "text"
    )
    out = str(tmp_path / "corpus.wet")
    write_wet(src, out)

    wet_pages = read_wet(spark, out)
    idx = build_index(enrich_pages(wet_pages))
    # parity: same corpus through the parquet-shaped path
    idx_ref = build_index(enrich_pages(pages.select(
        "url", "text", F.lit(None).cast("string").alias("lang"))))
    q = "crystal meadow"
    got = [(r["url"], round(r["score"], 9))
           for r in search(idx, q, limit=20).collect()]
    want = [(r["url"], round(r["score"], 9))
            for r in search(idx_ref, q, limit=20).collect()]
    assert got == want and got
