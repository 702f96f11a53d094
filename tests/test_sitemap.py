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


def test_recrawl_plan(spark):
    from search_engine_spark.sources.sitemap import recrawl_plan

    sm_xml = (
        "<urlset>"
        "<url><loc>https://a.example/hot</loc>"
        "<lastmod>2024-06-01</lastmod><priority>0.9</priority></url>"
        "<url><loc>https://a.example/blocked</loc>"
        "<lastmod>2024-06-02</lastmod><priority>1.0</priority></url>"
        "<url><loc>https://a.example/cold</loc>"
        "<lastmod>2024-05-01</lastmod><priority>0.2</priority></url>"
        "<url><loc>https://a.example/fresh</loc>"
        "<lastmod>2024-01-01</lastmod></url>"
        "</urlset>"
    )
    robots_txt = (
        "User-agent: *\nDisallow: /blocked\nCrawl-delay: 2\n"
    )
    corpus = spark.createDataFrame(
        [
            # crawled before lastmod → stale
            ("https://a.example/hot", "2024-02-01"),
            ("https://a.example/cold", "2024-02-01"),
            # crawled after lastmod → NOT in the worklist
            ("https://a.example/fresh", "2024-12-01"),
        ],
        "url string, warc_ts string",
    )
    sm = _sm(spark, [("a.example", sm_xml)])
    robots = spark.createDataFrame(
        [("a.example", robots_txt)], "site string, robots_txt string"
    )
    plan = sorted(
        map(tuple, recrawl_plan(corpus, sm, robots).collect()),
        key=lambda r: r[3],
    )
    # blocked (robots Disallow) and fresh (up-to-date) are absent;
    # order is priority desc → hot (0.9) before cold (0.2); offsets
    # step by the site's Crawl-delay (2 s)
    assert plan == [
        ("a.example", "https://a.example/hot", "stale", 1, 0.0),
        ("a.example", "https://a.example/cold", "stale", 2, 2.0),
    ]


def test_recrawl_plan_blocks_robots(spark):
    from search_engine_spark.sources.sitemap import recrawl_plan

    sm = _sm(
        spark,
        [(
            "a.example",
            "<urlset><url><loc>https://a.example/x</loc>"
            "<lastmod>2024-06-01</lastmod></url></urlset>",
        )],
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x\n")],
        "site string, robots_txt string",
    )
    corpus = spark.createDataFrame(
        [("https://a.example/x", "2024-01-01")],
        "url string, warc_ts string",
    )
    assert recrawl_plan(corpus, sm, robots).count() == 0


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
