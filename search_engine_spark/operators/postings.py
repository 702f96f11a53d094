"""Posting-list construction + corpus statistics (SURVEY §2 R7–R10, N1).

The reference materializes postings row-at-a-time into a relational
``index`` table with an upsert per (page, lemma)
(services/impl/LemmaServiceImpl.java:53-78); here the whole build is
one declarative pass:

    pages → tokens (JVM) → per-doc lemma counts (Arrow UDF, map-side —
    no shuffle for tf counting) → explode → postings(term, doc, tf)

Document frequency (reference ``lemma.frequency``,
model/Lemma.java:30-34) and corpus stats (``AVG(p.length)``,
repositories/PageRepository.java:26-27) are plain aggregates computed
once at build and broadcast at query time.

Skew note (N1): exploded postings are Zipf-skewed by term.  The only
per-term shuffle in the *plain* layout is the df aggregate, which is a
partial-aggregate (map-side combine) — safe under skew.  The compacted
layout (operators/compact.py) is where explicit term-salting applies.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.functions.textproc import lemma_counts_udf


def build_postings(
    enriched: DataFrame,
    id_col: str = "url",
    analyzer: str = "lemma",
) -> DataFrame:
    """``postings(term, <id_col>, tf)`` — one row per (lemma, doc).

    analyzer="lemma": reference semantics T5+T6+T7 (particle filter +
    first normal form) fused in one Arrow UDF; tf counted per-doc
    map-side, so the explode produces final postings with NO shuffle.

    analyzer="tokens": raw-token postings (no lemmatization) — the
    SQL-expressible twin used for DuckDB oracle parity; tf via
    explode + partial-aggregating groupBy.
    """
    if analyzer == "lemma":
        if "analyzed" in enriched.columns:
            # fused path (enrich_pages(compute_tokens=False)): counts
            # were produced together with doc_len in one Arrow pass
            # as parallel primitive arrays — re-zipped JVM-side
            counts = enriched.select(
                F.col(id_col),
                F.explode(
                    F.arrays_zip(
                        F.col("analyzed.terms").alias("term"),
                        F.col("analyzed.tfs").alias("tf"),
                    )
                ).alias("tc"),
            )
        else:
            counts = enriched.select(
                F.col(id_col),
                F.explode(
                    lemma_counts_udf(F.col("tokens"), F.col("lang"))
                ).alias("tc"),
            )
        return counts.select(
            F.col("tc.term").alias("term"),
            F.col(id_col),
            F.col("tc.tf").alias("tf"),
        )
    if analyzer == "tokens":
        exploded = enriched.select(
            F.col(id_col), F.explode(F.col("tokens")).alias("term")
        )
        return exploded.groupBy("term", id_col).agg(
            F.count(F.lit(1)).cast("int").alias("tf")
        )
    raise ValueError(f"unknown analyzer: {analyzer}")


def term_stats(postings: DataFrame) -> DataFrame:
    """``term_stats(term, df)`` — global document frequency (R9).

    Reference quirk preserved: df is summed across ALL sites
    (services/impl/SearchServiceImpl.java:244-255) regardless of any
    site restriction at query time.
    """
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def site_stats(doc_lens: DataFrame) -> DataFrame:
    """``site_stats(site, pages)`` — page count per site (R8)."""
    return doc_lens.groupBy("site").agg(F.count(F.lit(1)).alias("pages"))


def doc_lens_table(enriched: DataFrame, id_col: str = "url") -> DataFrame:
    cols = [F.col(id_col), F.col("site"), F.col("doc_len")]
    if "title" in enriched.columns:
        cols.append(F.col("title"))
    return enriched.select(*cols)


@dataclass
class InvertedIndex:
    """Logical index: the rebuild's counterpart of the reference's
    page/lemma/index tables (SURVEY §1.2) as DataFrames + broadcast
    scalars."""

    postings: DataFrame          # (term, id, tf)
    doc_lens: DataFrame          # (id, site, doc_len[, title])
    term_stats: DataFrame        # (term, df)
    site_stats: DataFrame        # (site, pages)
    n_docs: int
    avg_len: float
    stoplist: tuple[str, ...]    # R14: the `stoplist_size` most common
    id_col: str = "url"
    # exact integer Σ doc_len — lets maintenance ops update avg_len
    # arithmetically (O(1)) instead of rescanning the docs table;
    # -1 = unknown (logical views that never persist a descriptor)
    sum_len: int = -1
    config: EngineConfig = field(default_factory=lambda: DEFAULT)
    # frames .cache()d during build (for explicit release: Spark's SQL
    # cache matches by logical plan, so a leaked cache silently feeds
    # later plan-identical builds — poison for benchmarks)
    cached: tuple = ()

    def unpersist(self) -> None:
        for df in self.cached:
            try:
                df.unpersist()
            except Exception:
                pass


def compute_stoplist(
    tstats: DataFrame, n_docs: int, size: int
) -> tuple[str, ...]:
    """R14: the ``size`` lowest-IDF (most common) lemmas.

    Reference computes this from all lemma rows at first query
    (services/impl/SearchServiceImpl.java:71-75, :228-235).  IDF is
    monotone-decreasing in df, so lowest-IDF == highest-df; normative
    tie-break: term asc (the reference's order is HashMap-iteration
    nondeterministic).
    """
    rows = (
        tstats.orderBy(F.desc("df"), F.asc("term")).limit(size).collect()
    )
    return tuple(r["term"] for r in rows)


def build_index(
    enriched: DataFrame,
    id_col: str = "url",
    analyzer: str = "lemma",
    config: EngineConfig = DEFAULT,
    cache: bool = True,
) -> InvertedIndex:
    """End-to-end logical index build from an enriched pages frame."""
    if cache:
        # doc_lens and postings both consume the enrichment; caching
        # it runs tokenization (and the optional T1 UDF) exactly once.
        # Cache ONLY the columns later stages consume: the input
        # text/html/warc_ts columns are dead after analysis, and at
        # corpus scale they dominate the cached bytes — storage-memory
        # pressure (eviction → UDF recompute) and materialization
        # bandwidth both scale with what's cached, not what's read.
        keep = [c for c in (id_col, "site", "doc_len", "title")
                if c in enriched.columns]
        for extra in ("analyzed", "tokens", "lang"):
            # analyzer inputs: fused path needs `analyzed`; token and
            # unfused-lemma paths need `tokens` (+ `lang` for lemmas)
            if extra in enriched.columns:
                keep.append(extra)
        enriched = enriched.select(*keep).cache()
    dl = doc_lens_table(enriched, id_col)
    post = build_postings(enriched, id_col, analyzer)
    if cache:
        dl = dl.cache()
        # NB: `post` itself is NOT cached.  With `enriched` cached,
        # re-deriving postings is a JVM-side explode of the cached
        # counts column (no UDF re-run); caching the exploded rows
        # would roughly double the cached bytes to save only that
        # explode — a loss on storage-memory-bound clusters.
    # exact integer sum / count -> bit-deterministic avg_len (matches
    # the DuckDB oracle's SUM::DOUBLE / COUNT regardless of row order)
    agg = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_len").alias("len_sum"),
    ).collect()[0]
    n_docs = int(agg["n"])
    avg_len = (int(agg["len_sum"]) / n_docs) if n_docs else 0.0
    if "analyzed" in enriched.columns and analyzer == "lemma":
        # fused path: df = one row per (doc, term), and terms are
        # already unique per doc — count straight off the terms
        # array, skipping the arrays_zip struct explode the full
        # postings frame pays (term_stats(post) is row-identical;
        # this just reads half the bytes out of the cached frame)
        tstats = (
            enriched.select(F.explode("analyzed.terms").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    else:
        tstats = term_stats(post)
    if cache:
        tstats = tstats.cache()
    stop = compute_stoplist(tstats, n_docs, config.stoplist_size)
    return InvertedIndex(
        postings=post,
        doc_lens=dl,
        term_stats=tstats,
        site_stats=site_stats(dl),
        n_docs=n_docs,
        avg_len=avg_len,
        stoplist=stop,
        id_col=id_col,
        sum_len=int(agg["len_sum"] or 0),
        config=config,
        cached=(enriched, dl, tstats) if cache else (),
    )
