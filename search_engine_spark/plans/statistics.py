"""Grouped statistics report (SURVEY §2.3 R22).

Reference ``GET /api/statistics``
(services/impl/StatisticsServiceImpl.java:29-77): per site → page
count + lemma count, totals, sites sorted by pages desc; plus the
overall indexing flag.  Here per-site lemma count = distinct terms
among the site's postings, page count from doc stats — two aggregates
and a join, ordered pages desc with name-asc tiebreak (the
reference's order on equal page counts is unstable)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def site_statistics(
    postings_with_site: DataFrame, doc_lens: DataFrame
) -> DataFrame:
    """``(site, pages, lemmas)`` ordered by pages desc, site asc.

    ``postings_with_site`` must carry (term, site); ``doc_lens``
    carries one row per live doc with its site."""
    pages = doc_lens.groupBy("site").agg(
        F.count(F.lit(1)).alias("pages")
    )
    lemmas = postings_with_site.groupBy("site").agg(
        F.countDistinct("term").alias("lemmas")
    )
    return (
        pages.join(lemmas, "site", "left")
        .select(
            "site",
            "pages",
            F.coalesce("lemmas", F.lit(0)).alias("lemmas"),
        )
        .orderBy(F.desc("pages"), F.asc("site"))
    )


def statistics_report(index) -> dict:
    """Full response mirroring dto/statistics/StatisticsResponse:
    {total: {sites, pages, lemmas, indexing}, detailed: [...]}.

    Accepts an :class:`InvertedIndex` (exploded postings) or a
    :class:`CompactIndex` (segments are decoded for the per-site
    distinct-term count — an offline report, not a query path)."""
    from search_engine_spark.operators.compact import (
        CompactIndex,
        decode_segments,
    )

    id_col = index.id_col
    if isinstance(index, CompactIndex):
        doc_lens = index.doc_map.select("doc_id", "site")
        posts = decode_segments(index.segments).join(
            doc_lens, "doc_id"
        )
    else:
        doc_lens = index.doc_lens.select(id_col, "site")
        posts = index.postings.join(doc_lens, id_col)

    detailed = [
        r.asDict()
        for r in site_statistics(
            posts.select("term", "site"), doc_lens
        ).collect()
    ]
    total_lemmas = index.term_stats.count()
    return {
        "total": {
            "sites": len(detailed),
            "pages": index.n_docs,
            "lemmas": total_lemmas,
            "indexing": False,
        },
        "detailed": detailed,
    }


def corpus_rollup(
    docs: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    chars_col: str = "n_chars",
) -> DataFrame:
    """Multi-level corpus totals in ONE pass: ``ROLLUP(dims)`` →
    (dim…, n_docs, chars) with NULL dims on subtotal/grand-total rows.

    The R22 per-site report generalized the way a 100 TB corpus
    dashboard needs it: Catalyst expands the rollup into a single
    partial-aggregated shuffle (``Expand`` + one hash aggregate), so
    per-(site, lang), per-site and grand totals cost one job instead
    of three."""
    return docs.rollup(*[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(chars_col)).cast("long").alias("chars"),
    )
