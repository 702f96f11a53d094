"""JSON-Lines source/sink for the input_hint corpus.

Besides parquet/Iceberg (``sources/pages.py``) and WET
(``sources/wet.py``), the third format web corpora actually ship in
is JSONL — one JSON object per line, the interchange format of
Dolma-/FineWeb-style released LLM training sets.  This module maps
JSONL files to and from the canonical input_hint schema
``(url, warc_ts, html, text, lang)``.

Wire representation (one object per line):

    {"url": "...", "warc_ts": "2024-03-01T01:02:03Z",
     "html_b64": "...", "text": "...", "lang": "en"}

JSON has no binary type, so ``html`` travels base64-encoded under
``html_b64``; the reader decodes it back to ``binary`` with the JVM
``unbase64`` (no Python anywhere in either direction).  ``warc_ts``
travels as an ISO-8601 UTC string — parsing and formatting are done
by the JSON datasource itself via the ``timeZone`` /
``timestampFormat`` options, so round-trips are exact regardless of
the session/host timezone.

Scale posture:

- **Explicit schema, never inference.** ``spark.read.json`` without
  a schema runs a full extra pass over the data to infer one; at
  100 TB that doubles the scan.  The reader always passes
  :data:`JSONL_WIRE_SCHEMA`.
- **Splittability.** Uncompressed / bzip2 / zstd JSONL splits on
  newlines, so one large file fans out across executors.  gzip
  members are not splittable — as with ``.wet.gz``, parallelism then
  comes from the file count, which released corpora provide
  naturally (thousands of ~100-500 MB shards).
- **Malformed lines** are dropped (``mode=DROPMALFORMED``) rather
  than poisoning the frame; pass ``permissive=True`` to keep them as
  all-NULL rows for auditing (Spark's default PERMISSIVE mode).
- Column pruning pushes into the JSON parser (Spark materializes
  only the fields the plan reads), so a text-only pipeline never
  pays for base64-decoding ``html_b64``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wire schema of one JSONL line (html base64-packed; warc_ts parsed
# by the datasource itself with the options below).
JSONL_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_TS_OPTS = {
    "timeZone": "UTC",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss'Z'",
}


def read_jsonl(
    spark: SparkSession,
    path: str,
    permissive: bool = False,
) -> DataFrame:
    """JSONL file(s) → canonical ``(url, warc_ts, html, text, lang)``
    DataFrame ready for
    :func:`search_engine_spark.sources.pages.enrich_pages`.

    Rows without a ``url`` are dropped (they cannot participate in
    indexing, dedup or the per-url reference invariant).
    """
    reader = spark.read.schema(JSONL_WIRE_SCHEMA).options(**_TS_OPTS)
    if not permissive:
        reader = reader.option("mode", "DROPMALFORMED")
    return (
        reader.json(path)
        .filter(F.col("url").isNotNull())
        .select(
            "url",
            "warc_ts",
            F.unbase64(F.col("html_b64")).alias("html"),
            "text",
            "lang",
        )
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
) -> None:
    """Inverse of :func:`read_jsonl`: canonical pages frame → JSONL.

    ``html`` is base64-packed JVM-side; ``warc_ts`` is serialized as
    ISO-8601 UTC by the datasource.  ``compression`` accepts the
    Spark JSON codecs (``gzip``, ``bzip2``, ``zstd`` …); prefer
    bzip2/zstd or none for splittable output, gzip only for
    Common-Crawl-style one-task-per-file layouts.
    """
    cols = []
    for c in df.columns:
        if c == "html":
            cols.append(F.base64(F.col("html")).alias("html_b64"))
        else:
            cols.append(F.col(c))
    writer = (
        df.select(*cols).write.mode("overwrite").options(**_TS_OPTS)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
