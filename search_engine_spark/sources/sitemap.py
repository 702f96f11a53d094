"""XML sitemap source (sitemaps.org protocol) — the discovery-side
companion of the robots.txt policy gate.

A refresh/re-crawl pipeline over the input_hint corpus needs two
per-site control files: ``robots.txt`` decides what MAY be fetched
(:mod:`search_engine_spark.operators.robots`) and ``sitemap.xml``
declares what EXISTS and when it changed — the url inventory that
drives re-crawl scheduling (``lastmod`` vs the corpus ``warc_ts``)
and priority ordering.

Parsing is pure JVM regex over the XML body (``regexp_extract_all``
on ``<url>``/``<sitemap>`` blocks, then per-block field extraction)
— sitemaps are machine-generated flat XML, the regex subset is
RE2∩Java-safe, and bodies exist per SITE (metadata scale), so a
DuckDB oracle can replay the parse and the frame broadcast-joins
anything page-sized.

Both record kinds are handled: urlset entries (``parse_sitemap``)
and sitemap-index entries pointing at child sitemaps
(``sitemap_index_entries`` — fetch scheduling for the 50k-url shard
files large sites must split into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SM_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*([^<\s][^<]*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*([^<\s][^<]*?)\s*</lastmod>"
_PRIORITY = r"(?s)<priority>\s*([^<\s][^<]*?)\s*</priority>"
_CHANGEFREQ = r"(?s)<changefreq>\s*([^<\s][^<]*?)\s*</changefreq>"


def _field(block, pat):
    v = F.regexp_extract(block, pat, 1)
    return F.when(v != "", v)


def parse_sitemap(
    sitemaps: DataFrame,
    site_col: str = "site",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Per-site sitemap bodies → ``(site, url, lastmod, changefreq,
    priority)`` — one row per ``<url>`` entry; optional fields NULL
    when absent; entries without a ``<loc>`` are dropped."""
    blocks = sitemaps.select(
        F.col(site_col).alias("site"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
        ).alias("_b"),
    )
    return (
        blocks.select(
            "site",
            _field(F.col("_b"), _LOC).alias("url"),
            _field(F.col("_b"), _LASTMOD).alias("lastmod"),
            _field(F.col("_b"), _CHANGEFREQ).alias("changefreq"),
            _field(F.col("_b"), _PRIORITY)
            .cast("double")
            .alias("priority"),
        )
        .filter(F.col("url").isNotNull())
    )


def sitemap_index_entries(
    sitemaps: DataFrame,
    site_col: str = "site",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap-INDEX bodies → ``(site, sitemap_url, lastmod)`` — the
    child shard files a crawler must fetch next."""
    blocks = sitemaps.select(
        F.col(site_col).alias("site"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK), 1)
        ).alias("_b"),
    )
    return (
        blocks.select(
            "site",
            _field(F.col("_b"), _LOC).alias("sitemap_url"),
            _field(F.col("_b"), _LASTMOD).alias("lastmod"),
        )
        .filter(F.col("sitemap_url").isNotNull())
    )


def recrawl_plan(
    corpus: DataFrame,
    sitemaps: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    default_delay: float = 1.0,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    site_col: str = "site",
    sitemap_col: str = "sitemap_xml",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Politeness-scheduled re-crawl plan — the composition of the
    whole crawl-control surface: :func:`stale_urls` (what needs
    fetching), :func:`operators.robots.filter_by_robots` (what MAY be
    fetched) and :func:`operators.robots.crawl_delays` (how fast per
    site).

    Returns ``(site, url, reason, fetch_rank, fetch_offset_sec)``:
    per-site fetch order is (priority desc NULLS LAST, lastmod desc
    NULLS LAST, url asc) — declared-important and recently-changed
    pages first — and ``fetch_offset_sec`` = (rank−1) × the site's
    Crawl-delay (``default_delay`` when the site declares none), i.e.
    the earliest polite start time relative to the site's crawl
    start. Per-site ranking windows are bounded by each site's OWN
    worklist (metadata scale), never the corpus."""
    from pyspark.sql import Window

    from search_engine_spark.operators.robots import (
        crawl_delays,
        filter_by_robots,
    )

    work = stale_urls(
        corpus, sitemaps, url_col, ts_col, site_col, sitemap_col
    )
    entries = parse_sitemap(sitemaps, site_col, sitemap_col).select(
        "url", "priority",
    )
    allowed = filter_by_robots(
        work.join(entries, "url", "left"),
        robots, agent, "url", "site", robots_col,
    )
    delays = crawl_delays(robots, agent, site_col, robots_col)
    w = Window.partitionBy("site").orderBy(
        F.desc_nulls_last("priority"),
        F.desc_nulls_last("lastmod"),
        F.asc("url"),
    )
    return (
        allowed.withColumn("fetch_rank", F.row_number().over(w))
        .join(F.broadcast(delays), "site", "left")
        .withColumn(
            "fetch_offset_sec",
            (F.col("fetch_rank") - 1)
            * F.coalesce(F.col("crawl_delay"), F.lit(default_delay)),
        )
        .select(
            "site", "url", "reason", "fetch_rank", "fetch_offset_sec"
        )
    )


def stale_urls(
    corpus: DataFrame,
    sitemaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    site_col: str = "site",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Re-crawl worklist: sitemap entries that are NEW (url absent
    from the corpus) or STALE (``lastmod`` after the crawled
    ``warc_ts``, string-compared — both are ISO-8601, where
    lexicographic order IS chronological order). Returns
    ``(site, url, lastmod, reason)`` with reason ∈ {new, stale}."""
    entries = parse_sitemap(sitemaps, site_col, xml_col)
    have = corpus.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("_ts")
    )
    joined = entries.join(have, "url", "left")
    return (
        joined.withColumn(
            "reason",
            F.when(F.col("_ts").isNull(), F.lit("new")).when(
                F.col("lastmod").isNotNull()
                & (F.col("lastmod") > F.col("_ts")),
                F.lit("stale"),
            ),
        )
        .filter(F.col("reason").isNotNull())
        .select("site", "url", "lastmod", "reason")
    )
