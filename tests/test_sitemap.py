"""Sitemap source (sources/sitemap.py): urlset parse, sitemap-index
parse, and the stale/new re-crawl worklist."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.sources.sitemap import (
    parse_sitemap,
    sitemap_index_entries,
    stale_urls,
)

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/p1</loc>
    <lastmod>2024-03-05T00:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc> https://a.example/p2 </loc>
  </url>
  <url>
    <lastmod>2024-01-01T00:00:00Z</lastmod>
  </url>
</urlset>
"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://a.example/sitemap-1.xml</loc>
    <lastmod>2024-02-01T00:00:00Z</lastmod>
  </sitemap>
  <sitemap>
    <loc>https://a.example/sitemap-2.xml</loc>
  </sitemap>
</sitemapindex>
"""


def _sm(spark, rows):
    return spark.createDataFrame(
        rows, "site string, sitemap_xml string"
    )


def test_parse_urlset(spark):
    rows = sorted(
        map(tuple, parse_sitemap(_sm(spark, [("a.example", SITEMAP)]))
            .collect())
    )
    # loc-less entry dropped; whitespace-padded loc trimmed
    assert rows == [
        ("a.example", "https://a.example/p1",
         "2024-03-05T00:00:00Z", "daily", 0.8),
        ("a.example", "https://a.example/p2", None, None, None),
    ]


def test_parse_index(spark):
    rows = sorted(
        map(
            tuple,
            sitemap_index_entries(
                _sm(spark, [("a.example", SITEMAP_INDEX)])
            ).collect(),
        )
    )
    assert rows == [
        ("a.example", "https://a.example/sitemap-1.xml",
         "2024-02-01T00:00:00Z"),
        ("a.example", "https://a.example/sitemap-2.xml", None),
    ]


def test_stale_urls(spark):
    corpus = spark.createDataFrame(
        [
            # crawled BEFORE lastmod → stale
            ("https://a.example/p1", "2024-03-01T00:00:00Z"),
            # p2 has no lastmod → never stale
            ("https://a.example/p2", "2020-01-01T00:00:00Z"),
        ],
        "url string, warc_ts string",
    )
    sm = _sm(
        spark,
        [(
            "a.example",
            SITEMAP.replace(
                "</urlset>",
                "<url><loc>https://a.example/p9</loc></url></urlset>",
            ),
        )],
    )
    got = {
        (r["url"], r["reason"]) for r in stale_urls(corpus, sm).collect()
    }
    assert got == {
        ("https://a.example/p1", "stale"),
        ("https://a.example/p9", "new"),
    }


def test_fresh_corpus_empty_worklist(spark):
    corpus = spark.createDataFrame(
        [("https://a.example/p1", "2025-01-01T00:00:00Z"),
         ("https://a.example/p2", "2025-01-01T00:00:00Z")],
        "url string, warc_ts string",
    )
    assert (
        stale_urls(corpus, _sm(spark, [("a.example", SITEMAP)])).count()
        == 0
    )
