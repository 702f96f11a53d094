"""Common-Crawl WET (WARC-encapsulated extracted text) source.

The input_hint corpus ``(url, warc_ts, html, text, lang)`` is exactly
what a Common Crawl monthly drop provides, and WET is the format the
text side actually ships in: a concatenation of WARC records

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: http://host/path\r\n
    WARC-Date: 2024-01-01T00:00:00Z\r\n
    ...
    Content-Length: 1234\r\n
    \r\n
    <plain-text payload>
    \r\n\r\n

Parsing is 100% JVM-side (no Python in the scan path): the text
datasource splits records on the ``WARC/1.0\r\n`` magic via a custom
``lineSep``, then one ``split(limit=2)`` separates the header block
from the payload and ``regexp_extract`` pulls the header fields.

Scale posture:

- **Uncompressed WET**: Hadoop's line reader aligns input splits on
  the custom delimiter, so one large file still fans out across
  executors.
- **``.wet.gz`` (the Common Crawl layout)**: gzip members are not
  splittable — parallelism comes from the file count, which is the
  natural unit anyway (a crawl ships ~10^4-10^5 segment files of
  ~150 MB; one task per file is the standard and right plan).
- Header fields are tiny; the payload column is projected/consumed
  exactly like the parquet ``text`` column downstream
  (``enrich_pages`` never touches html when absent).

Known limitation (shared by every delimiter-split WARC reader, e.g.
the archive-analysis Spark input formats): a payload line that itself
begins with ``WARC/1.0`` would split a record early.  The WET writer
never emits one (payloads are extracted text, and the magic is
followed by a strict header block which the type filter rejects), and
malformed fragments drop out at the ``WARC-Type: conversion`` filter
instead of poisoning the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WET_MAGIC = "WARC/1.0\r\n"

# WARC named-field grammar: token ':' SP value
_F_TYPE = r"WARC-Type:\s*(\S+)"
_F_URI = r"WARC-Target-URI:\s*(\S+)"
_F_DATE = r"WARC-Date:\s*(\S+)"
_F_LANG = r"WARC-Identified-Content-Language:\s*([A-Za-z,\-]+)"


def read_wet(
    spark: SparkSession,
    path: str,
    keep_record_id: bool = False,
) -> DataFrame:
    """WET file(s) → ``(url, warc_ts, text, lang)`` DataFrame.

    Only ``WARC-Type: conversion`` records survive (the warcinfo
    preamble and any revisit/metadata records are filtered out).
    ``lang`` is the first language of the optional
    ``WARC-Identified-Content-Language`` field (NULL when absent —
    downstream ``lang_id`` can fill it).  The result plugs straight
    into :func:`search_engine_spark.sources.pages.enrich_pages`.
    """
    raw = spark.read.text(path, lineSep=WET_MAGIC)
    # value = one record: header block \r\n\r\n payload (+ trailing
    # record separator newlines, trimmed below)
    parts = F.split(F.col("value"), r"\r\n\r\n", 2)
    header = parts.getItem(0)
    payload = parts.getItem(1)
    rec = raw.select(
        F.regexp_extract(header, _F_TYPE, 1).alias("warc_type"),
        F.regexp_extract(header, _F_URI, 1).alias("url"),
        F.regexp_extract(header, _F_DATE, 1).alias("warc_ts"),
        F.regexp_extract(header, _F_LANG, 1).alias("_langs"),
        F.regexp_extract(header, r"WARC-Record-ID:\s*<([^>]+)>", 1).alias(
            "record_id"
        ),
        # payload runs to the next magic; the inter-record \r\n\r\n
        # separator (and nothing else) is what we strip
        F.regexp_replace(payload, r"[\r\n]+$", "").alias("text"),
    )
    out = (
        rec.filter(
            (F.col("warc_type") == "conversion") & (F.col("url") != "")
        )
        .withColumn(
            "lang",
            F.when(
                F.col("_langs") != "",
                F.lower(F.split(F.col("_langs"), ",").getItem(0)),
            ),
        )
        .drop("warc_type", "_langs")
    )
    cols = ["url", "warc_ts", "text", "lang"]
    if keep_record_id:
        cols.append("record_id")
    return out.select(*cols)


def write_wet(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> None:
    """Inverse of :func:`read_wet` for tests and corpus exports:
    serialize ``(url, warc_ts, text)`` rows as WET conversion records
    (one text-datasource part file per partition; ``lineSep`` framing
    compatible with :func:`read_wet` round-trips).

    The record text is built as one JVM ``concat`` — no Python in the
    write path either.  Each row carries its own leading magic so the
    output is byte-shaped like a real WET file (magic BEFORE every
    record; read_wet's splitter then sees an empty first fragment,
    which the type filter drops).
    """
    rec = df.select(
        F.concat(
            F.lit(WET_MAGIC),
            F.lit("WARC-Type: conversion\r\n"),
            F.lit("WARC-Target-URI: "),
            F.col(url_col),
            F.lit("\r\n"),
            F.lit("WARC-Date: "),
            F.coalesce(
                F.col(ts_col).cast("string"),
                F.lit("1970-01-01T00:00:00Z"),
            ),
            F.lit("\r\n"),
            F.lit("Content-Type: text/plain\r\n"),
            F.lit("Content-Length: "),
            F.length(F.col(text_col).cast("string")).cast("string"),
            F.lit("\r\n\r\n"),
            F.coalesce(F.col(text_col), F.lit("")),
            F.lit("\r\n"),
        ).alias("value")
    )
    rec.write.mode("overwrite").option("lineSep", "\r\n").text(path)
