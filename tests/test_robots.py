"""robots.txt crawl policy (operators/robots.py): RFC 9309 parser
grouping, agent selection, wildcard/anchor matching, precedence."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.robots import (
    filter_by_robots,
    robots_allowed,
    robots_rules,
)

ROBOTS = """# comment line
User-agent: googlebot
User-agent: mybot
Disallow: /private/
Allow: /private/ok*   # trailing comment
Disallow: /tmp/*.pdf$

User-agent: *
Disallow: /
Allow: /public/
"""


def _robots(spark, rows):
    return spark.createDataFrame(
        rows, "site string, robots_txt string"
    )


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _verdicts(spark, urls, agent, robots_rows):
    df = robots_allowed(
        _pages(spark, urls), _robots(spark, robots_rows), agent
    )
    return {r["url"]: r["crawl_allowed"] for r in df.collect()}


URLS = [
    "https://a.example/private/secret.html",
    "https://a.example/private/okay/page",
    "https://a.example/tmp/file.pdf",
    "https://a.example/tmp/file.pdfx",
    "https://a.example/public/x",
    "https://a.example/other",
]


def test_exact_agent_group(spark):
    got = _verdicts(spark, URLS, "mybot", [("a.example", ROBOTS)])
    assert got == {
        # Disallow /private/ beats nothing; Allow /private/ok* is
        # longer → wins on the okay page
        "https://a.example/private/secret.html": False,
        "https://a.example/private/okay/page": True,
        # $-anchored wildcard: .pdf blocked, .pdfx not
        "https://a.example/tmp/file.pdf": False,
        "https://a.example/tmp/file.pdfx": True,
        # exact group exists → the * group does NOT apply
        "https://a.example/public/x": True,
        "https://a.example/other": True,
    }


def test_wildcard_group_fallback(spark):
    got = _verdicts(spark, URLS, "otherbot", [("a.example", ROBOTS)])
    # * group: Disallow / with Allow /public/ carve-out
    assert got["https://a.example/public/x"] is True
    assert all(
        v is False
        for u, v in got.items()
        if "/public/" not in u
    )


def test_empty_disallow_and_missing_site(spark):
    rows = [("b.example", "User-agent: *\nDisallow:\n")]
    got = _verdicts(
        spark,
        ["https://b.example/x", "https://c.example/y"],
        "anybot",
        rows,
    )
    # empty Disallow = no restriction; site without robots = allowed
    assert got == {
        "https://b.example/x": True,
        "https://c.example/y": True,
    }


def test_rules_table_shape(spark):
    rules = robots_rules(_robots(spark, [("a.example", ROBOTS)]),
                         agent="mybot")
    rows = {
        (r["allow"], r["path"], r["pattern"])
        for r in rules.collect()
    }
    assert rows == {
        (False, "/private/", "^/private/"),
        (True, "/private/ok*", "^/private/ok.*"),
        (False, "/tmp/*.pdf$", r"^/tmp/.*\.pdf$"),
    }


def test_regex_metachars_escaped(spark):
    rows = [("a.example", "User-agent: *\nDisallow: /a+b(c).d\n")]
    got = _verdicts(
        spark,
        ["https://a.example/a+b(c).d/x", "https://a.example/aab_cxd"],
        "bot",
        rows,
    )
    assert got["https://a.example/a+b(c).d/x"] is False
    # would match if +().  were treated as regex metachars
    assert got["https://a.example/aab_cxd"] is True


def test_filter_by_robots_gate(spark):
    kept = filter_by_robots(
        _pages(spark, URLS), _robots(spark, [("a.example", ROBOTS)]),
        "mybot",
    )
    urls = {r["url"] for r in kept.collect()}
    assert "https://a.example/private/secret.html" not in urls
    assert "https://a.example/public/x" in urls
    assert "crawl_allowed" not in kept.columns


def test_crawl_delays(spark):
    from search_engine_spark.operators.robots import crawl_delays

    body = (
        "User-agent: mybot\nCrawl-delay: 2.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    rows = [("a.example", body),
            ("b.example", "User-agent: *\nDisallow: /\n")]
    got = {
        r["site"]: r["crawl_delay"]
        for r in crawl_delays(_robots(spark, rows), "mybot").collect()
    }
    # exact group's delay wins over *; b has no delay → absent
    assert got == {"a.example": 2.5}
    got_star = {
        r["site"]: r["crawl_delay"]
        for r in crawl_delays(_robots(spark, rows), "other").collect()
    }
    assert got_star == {"a.example": 10.0}


def test_root_path_default(spark):
    rows = [("a.example", "User-agent: *\nDisallow: /\n")]
    got = _verdicts(
        spark, ["https://a.example", "https://a.example/"], "bot", rows
    )
    # a bare host url normalizes to path "/" and is blocked
    assert got == {
        "https://a.example": False,
        "https://a.example/": False,
    }
