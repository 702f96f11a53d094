"""Input-corpus sources (SURVEY §2.1 S1–S3).

The reference crawls the web itself (RecursiveWebParser fork/join,
services/utils/RecursiveWebParser.java:56-92); per BASELINE.json
input_hint, the rebuild's input is an already-crawled Common-Crawl-style
table ``(url, warc_ts, html, text, lang)``.  Iceberg when the runtime
has the iceberg catalog configured, hive-partitioned parquet otherwise —
every table op used (append / overwrite / partition-pruned read) exists
in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.textproc import (
    doc_len_col,
    extract_text_udf,
    title_col,
    tokens_col,
)

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
# optional extra column: ``code`` (int HTTP status).  When present,
# error pages (code >= 400) are excluded from indexing — R26, the
# reference's LemmaServiceImpl guard (services/impl/
# LemmaServiceImpl.java:32-34 skips pages whose stored code is 4xx/5xx).
HTTP_ERROR_CODE = 400


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the input corpus (iceberg table name or parquet path)."""
    if "/" not in path_or_table and "." in path_or_table:
        try:
            return spark.read.table(path_or_table)
        except Exception:
            pass
    return spark.read.parquet(path_or_table)


def enrich_pages(
    pages: DataFrame,
    use_html: bool = False,
    compute_tokens: bool = True,
) -> DataFrame:
    """Derive site / text / title / tokens / doc_len.

    - ``site`` = url host (reference ``PageIntrospect.getDomain``,
      services/utils/PageIntrospect.java:22-40 → built-in ``parse_url``)
    - ``text`` comes straight from the input column when populated
      (input_hint provides both html and text); ``use_html=True`` runs
      the T1 pandas UDF instead.  The UDF is only *referenced* on that
      path — Spark evaluates extracted Python UDFs unconditionally, so
      putting it inside a coalesce would decode every page's html even
      when the text column is already there.
    - ``html`` (the widest column by far) is projected away BEFORE the
      dedup shuffle: title is derived first, then the exchange moves
      only url/text/lang/title.
    - crawl dedup (reference Redis visited-set,
      RecursiveWebParser.java:164-169) → ``dropDuplicates(url)``.
    - R26 status-code guard: when the input carries a ``code`` column,
      error pages (code >= 400) are dropped before any processing
      (LemmaServiceImpl.java:32-34); NULL code = assumed fetched OK.
    - null-text fallback: when ``use_html=False`` but a row's ``text``
      is NULL and ``html`` is populated, the T1 extractor runs on
      JUST that subset (filter precedes the UDF, so the
      unconditional-eval coalesce trap is avoided) — rows aren't
      silently indexed as empty documents.
    """
    df = pages
    if "code" in df.columns:
        df = df.filter(
            F.col("code").isNull() | (F.col("code") < HTTP_ERROR_CODE)
        ).drop("code")
    if "html" in df.columns:
        if use_html:
            df = df.withColumn("text", extract_text_udf(F.col("html")))
        elif "text" in df.columns:
            missing = df.filter(F.col("text").isNull()).withColumn(
                "text", extract_text_udf(F.col("html"))
            )
            df = df.filter(F.col("text").isNotNull()).unionByName(missing)
        else:
            df = df.withColumn("text", extract_text_udf(F.col("html")))
        df = df.withColumn("title", title_col(F.col("html")))
        df = df.drop("html")
    df = df.dropDuplicates(["url"])
    df = df.withColumn("site", F.parse_url(F.col("url"), F.lit("HOST")))
    if compute_tokens:
        df = df.withColumn(
            "tokens", tokens_col(F.col("text"), F.col("lang"))
        )
        df = df.withColumn("doc_len", doc_len_col(F.col("tokens")))
    else:
        # fused analysis (T3–T7 in one Arrow pass): no tokens array is
        # ever materialized — doc_len and per-doc lemma counts come
        # from a single UDF column (build_postings explodes it)
        from search_engine_spark.functions.textproc import analyze_text_udf

        df = df.withColumn(
            "analyzed", analyze_text_udf(F.col("text"), F.col("lang"))
        )
        df = df.withColumn("doc_len", F.col("analyzed.doc_len"))
    return df


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the pages shape.

    documents(doc_id, text, lang, source, n_chars) → url is synthesized
    as ``doc://{source}/{doc_id}`` so `site` == source; used by the
    DuckDB-checked queries in __spark_entry__.py.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.col("source").alias("site"),
    )
    df = df.withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
    df = df.withColumn("doc_len", doc_len_col(F.col("tokens")))
    return df
