"""Common-Crawl WARC (raw crawl archive) source — the HTML twin of
:mod:`search_engine_spark.sources.wet`.

Where WET ships extracted text, the primary WARC files ship the raw
HTTP exchanges: ``response`` records whose payload is a full HTTP
response (status line + headers, blank line, HTML body). Reading
them yields ``(url, warc_ts, code, content_type, html)`` — exactly
the html side of the input_hint corpus, with the HTTP status feeding
the R26 status-code guard in ``enrich_pages`` (error pages dropped
before any processing) and the body feeding ``extract_text``
(``use_html=True``).

Parsing is 100% JVM-side, identical in strategy to the WET reader:
the text datasource splits records on the ``WARC/1.0\\r\\n`` magic
via ``lineSep``, then ONE three-way ``split`` on ``\\r\\n\\r\\n``
separates WARC headers / HTTP headers / body, and ``regexp_extract``
pulls the fields. ``warcinfo`` / ``request`` / ``metadata`` records
(and any fragment without a target URI) drop at the type filter.

Scale posture mirrors WET: uncompressed archives split on the
delimiter across executors; ``.warc.gz`` parallelism comes from the
file count (a crawl ships ~10^5 ~1 GB segment files — one task per
file is the natural plan). The same known delimiter-split limitation
applies: a BODY line that itself begins with the magic would split a
record early; real HTML bodies don't produce one, and fragments
missing the strict header block drop at the type filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_MAGIC = "WARC/1.0\r\n"

_F_TYPE = r"WARC-Type:\s*(\S+)"
_F_URI = r"WARC-Target-URI:\s*(\S+)"
_F_DATE = r"WARC-Date:\s*(\S+)"
_F_STATUS = r"^HTTP/\d\.\d\s+(\d+)"
_F_CTYPE = r"(?i)Content-Type:\s*([^\r\n;]+)"


def read_warc(
    spark: SparkSession,
    path: str,
) -> DataFrame:
    """WARC file(s) → ``(url, warc_ts, code, content_type, html)``.

    Only ``WARC-Type: response`` records with a target URI survive.
    ``code`` is the HTTP status as an int (NULL when the payload
    isn't an HTTP response); ``content_type`` is the response's
    media type without parameters (lowercased, e.g. ``text/html``).
    The result feeds ``enrich_pages(..., use_html=True)`` — its R26
    guard then drops ``code >= 400`` rows."""
    raw = spark.read.text(path, lineSep=WARC_MAGIC)
    parts = F.split(F.col("value"), r"\r\n\r\n", 3)
    warc_hdr = parts.getItem(0)
    http_hdr = parts.getItem(1)
    body = parts.getItem(2)
    rec = raw.select(
        F.regexp_extract(warc_hdr, _F_TYPE, 1).alias("warc_type"),
        F.regexp_extract(warc_hdr, _F_URI, 1).alias("url"),
        F.regexp_extract(warc_hdr, _F_DATE, 1).alias("warc_ts"),
        F.regexp_extract(http_hdr, _F_STATUS, 1).alias("_code"),
        F.regexp_extract(http_hdr, _F_CTYPE, 1).alias("_ctype"),
        # body runs to the next magic; strip the inter-record
        # separator newlines only
        F.regexp_replace(body, r"[\r\n]+$", "").alias("html"),
    )
    return (
        rec.filter(
            (F.col("warc_type") == "response") & (F.col("url") != "")
        )
        .select(
            "url",
            "warc_ts",
            F.when(
                F.col("_code") != "", F.col("_code").cast("int")
            ).alias("code"),
            F.when(
                F.col("_ctype") != "",
                F.lower(F.trim(F.col("_ctype"))),
            ).alias("content_type"),
            "html",
        )
    )


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    code_col: str | None = None,
) -> None:
    """Inverse of :func:`read_warc` for tests and corpus exports:
    serialize rows as WARC response records wrapping an HTTP/1.1
    response (status from ``code_col``, default 200). One JVM
    ``concat`` per record — no Python in the write path."""
    code = (
        F.coalesce(F.col(code_col).cast("string"), F.lit("200"))
        if code_col
        else F.lit("200")
    )
    rec = df.select(
        F.concat(
            F.lit(WARC_MAGIC),
            F.lit("WARC-Type: response\r\n"),
            F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
            F.lit("WARC-Date: "),
            F.coalesce(
                F.col(ts_col).cast("string"),
                F.lit("1970-01-01T00:00:00Z"),
            ),
            F.lit("\r\n"),
            F.lit("Content-Type: application/http; msgtype=response\r\n"),
            F.lit("\r\n"),
            F.lit("HTTP/1.1 "), code, F.lit(" OK\r\n"),
            F.lit("Content-Type: text/html; charset=utf-8\r\n"),
            F.lit("\r\n"),
            F.coalesce(F.col(html_col), F.lit("")),
            F.lit("\r\n"),
        ).alias("value")
    )
    # lineSep framing note: text-datasource writes value + lineSep; an
    # empty lineSep is not supported, so the record carries its own
    # leading magic and the writer separates records with \r\n —
    # read_warc's splitter sees an empty first fragment per file,
    # which the type filter drops (same framing as write_wet)
    rec.write.mode("overwrite").text(path, lineSep="\r\n")
