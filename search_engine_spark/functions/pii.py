"""PII detection and redaction for training-data curation.

Pure JVM column expressions (`regexp_count` / `regexp_replace`, whole-
stage codegen — zero Python in the hot path), so the operator costs one
projection over the corpus scan at 100 TB: no shuffle, no UDF, filters
and column pruning push down through it.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle): no backreferences, no lookaround, so
the DuckDB contract oracle reproduces detection and redaction
byte-for-byte.

No reference counterpart (KonstantinLi/search_engine indexes already-
public site text and has no curation layer); this extends the pipeline
the same way `functions/analysis.py` does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top-to-bottom, and order matters — e.g.
# SSN-shaped digit groups must be consumed before the phone pattern can
# see them.  Keep this list and the placeholders in sync with
# `PII_ORACLE_SQL` fragments in __spark_entry__.py.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("credit_card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"),
    ("phone", r"\+?\d{1,3}[ -]\d{3}[ -]\d{4}\b"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (long) as named columns.

    `F.regexp_count` is JVM-side and codegen-friendly; the DuckDB twin
    is `len(regexp_extract_all(text, pattern))`.
    """
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder like `<EMAIL>`.

    Sequential `regexp_replace` in `PII_PATTERNS` order — each pattern
    sees the previous pattern's output, mirroring the oracle exactly.
    """
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def annotate_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-type counts, a total, and a `redacted` text column.

    One narrow projection — at 100 TB this fuses into whatever scan or
    filter stage already touches `text_col`.
    """
    counts = pii_counts(F.col(text_col))
    out = df
    for cname, cexpr in counts.items():
        out = out.withColumn(cname, cexpr)
    total = None
    for cname in counts:
        total = F.col(cname) if total is None else total + F.col(cname)
    return out.withColumn("n_pii", total.cast("long")).withColumn(
        "redacted", redact_pii(F.col(text_col))
    )
