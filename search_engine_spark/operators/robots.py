"""robots.txt crawl-policy evaluation (RFC 9309, the Robots
Exclusion Protocol).

Completes the crawl-policy surface next to URL canonicalization and
the domain blocklist: given a per-site ``robots.txt`` body, decide
for every page URL whether the configured agent may fetch it. The
reference descopes live crawling (BASELINE input_hint is a crawled
corpus), but a re-crawl / refresh pipeline over that corpus still
needs the policy gate — this is it.

Everything — INCLUDING the group-stateful robots.txt parser — is
pure JVM window/regex column work, no UDF anywhere, so both the
parser and the matcher are DuckDB-oracle-checkable:

- **Parser** (:func:`robots_rules`): lines are exploded with
  positions; a ``User-agent`` line STARTS a new group unless the
  previous directive line was also ``User-agent`` (RFC group
  grammar); the group id is a running sum of group-starts (one
  window), rules join their group's agent set, and group selection
  is exact-agent-beats-``*`` (if any group names the agent exactly,
  only those groups apply; otherwise the ``*`` groups do).
- **Matcher** (:func:`robots_allowed` / :func:`filter_by_robots`):
  rule paths support RFC wildcards — ``*`` matches any run, a
  trailing ``$`` anchors the end; every other regex metacharacter is
  escaped, the pattern is anchored at the path start, and the
  longest-path rule wins with allow beating disallow on equal length
  (RFC precedence). No matching rule ⇒ allowed.

Scale shape: robots bodies exist per SITE (corpus-metadata scale,
orders of magnitude below pages), so the parsed rule table
broadcast-joins the page stream by site; per-page work is one
regex match per candidate rule of its own site plus one
max_by aggregate — no shuffle of the page stream beyond the
broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _wildcard_regex(path: Column) -> Column:
    """RFC 9309 rule path → anchored Java/RE2-safe regex string:
    escape metacharacters, ``*`` → ``.*``, trailing ``$`` → ``$``."""
    # does the rule end-anchor? (a literal trailing '$')
    anchored = path.endswith("$")
    body = F.regexp_replace(path, r"\$$", "")
    esc = F.regexp_replace(
        body, r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    site_col: str = "site",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-site robots.txt bodies → applicable rule table
    ``(site, allow, path, pattern, plen)`` for ``agent``.

    Group-stateful parse with two windows (lag + running sum) — see
    module docstring. Empty-path rules are dropped (RFC: an empty
    ``Disallow:`` imposes no restriction). Agent matching is
    exact-or-``*`` with exact groups taking precedence."""
    grouped, applicable = _grouped_and_applicable(
        robots, agent, site_col, robots_col
    )
    rules = (
        grouped.filter(
            F.col("key").isin("allow", "disallow")
            & (F.col("value") != "")
        )
        .join(applicable, ["site", "gid"])
        .select(
            "site",
            (F.col("key") == "allow").alias("allow"),
            F.col("value").alias("path"),
        )
        .distinct()
    )
    return rules.select(
        "site", "allow", "path",
        _wildcard_regex(F.col("path")).alias("pattern"),
        F.length("path").alias("plen"),
    )


def _grouped_and_applicable(
    robots: DataFrame,
    agent: str,
    site_col: str,
    robots_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared parse core: (grouped directive lines with gid,
    applicable (site, gid) groups for ``agent``)."""
    a = agent.lower()
    lines = robots.select(
        F.col(site_col).alias("site"),
        F.posexplode(
            F.split(F.col(robots_col), "\n")
        ).alias("ln", "_raw"),
    ).select(
        "site", "ln",
        # comments stripped, whitespace trimmed
        F.trim(F.regexp_replace("_raw", "#.*", "")).alias("_line"),
    ).select(
        "site", "ln",
        F.lower(
            F.regexp_extract("_line", r"^([A-Za-z-]+)\s*:", 1)
        ).alias("key"),
        F.trim(
            F.regexp_extract("_line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)
        ).alias("value"),
    ).filter(
        F.col("key").isin(
            "user-agent", "allow", "disallow", "crawl-delay"
        )
    )

    from pyspark.sql import Window

    w = Window.partitionBy("site").orderBy("ln")
    is_ua = (F.col("key") == "user-agent").cast("int")
    grouped = (
        lines.withColumn("_ua", is_ua)
        .withColumn("_prev_ua", F.lag("_ua", 1, 0).over(w))
        .withColumn(
            "_start",
            ((F.col("_ua") == 1) & (F.col("_prev_ua") == 0)).cast("int"),
        )
        .withColumn(
            "gid",
            F.sum("_start").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    agents = (
        grouped.filter(F.col("key") == "user-agent")
        .select(
            "site", "gid", F.lower(F.col("value")).alias("agent")
        )
        .distinct()
    )
    # exact groups beat '*' groups: keep exact-match groups when the
    # site has any, else the wildcard groups
    matching = agents.filter(
        (F.col("agent") == a) | (F.col("agent") == "*")
    )
    best = matching.groupBy("site").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_has_exact")
    )
    applicable = (
        matching.join(best, "site")
        .filter(
            (F.col("agent") == a)
            | ((F.col("_has_exact") == 0) & (F.col("agent") == "*"))
        )
        .select("site", "gid")
        .distinct()
    )
    return grouped, applicable


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    site_col: str = "site",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-site ``Crawl-delay`` (the de-facto politeness extension) →
    ``(site, crawl_delay)`` seconds as double, for the groups that
    apply to ``agent`` (same exact-beats-``*`` selection as
    :func:`robots_rules`); the minimum wins when several applicable
    groups declare one. Sites without a parseable delay are absent —
    left-join and coalesce to the crawler's default."""
    grouped, applicable = _grouped_and_applicable(
        robots, agent, site_col, robots_col
    )
    return (
        grouped.filter(
            (F.col("key") == "crawl-delay")
            & F.col("value").rlike(r"^\d+(\.\d+)?$")
        )
        .join(applicable, ["site", "gid"])
        .groupBy("site")
        .agg(F.min(F.col("value").cast("double")).alias("crawl_delay"))
    )


def robots_allowed(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    site_col: str = "site",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``pages`` + ``crawl_allowed`` boolean per RFC 9309 precedence
    (longest matching rule wins; allow wins length ties; no match ⇒
    allowed; site absent from ``robots`` ⇒ allowed)."""
    rules = robots_rules(robots, agent, site_col, robots_col)
    path = F.regexp_replace(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    with_site = (
        pages.withColumn("_path", path)
        if site_col in pages.columns
        else pages.withColumn(
            "_path", path
        ).withColumn(
            site_col, F.parse_url(F.col(url_col), F.lit("HOST"))
        )
    )
    hits = (
        with_site.select(url_col, site_col, "_path")
        .join(F.broadcast(rules), site_col, "inner")
        .filter(F.regexp_like(F.col("_path"), F.col("pattern")))
        .groupBy(url_col)
        .agg(
            # RFC precedence: longest path wins, allow wins ties —
            # max over (plen, allow) struct, one map-side-combined agg
            F.max(F.struct(F.col("plen"), F.col("allow"))).alias("_m")
        )
        .select(url_col, F.col("_m.allow").alias("_verdict"))
    )
    return (
        with_site.join(hits, url_col, "left")
        .withColumn(
            "crawl_allowed", F.coalesce(F.col("_verdict"), F.lit(True))
        )
        .drop("_verdict", "_path")
    )


def filter_by_robots(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    site_col: str = "site",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Only the pages ``agent`` may fetch (the crawl-policy gate)."""
    return (
        robots_allowed(
            pages, robots, agent, url_col, site_col, robots_col
        )
        .filter(F.col("crawl_allowed"))
        .drop("crawl_allowed")
    )
