"""JSONL source: parse fidelity, malformed-line handling, binary
round-trip, gzip, and parquet-path parity through enrich_pages."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.jsonl import read_jsonl, write_jsonl
from search_engine_spark.sources.pages import enrich_pages

JSONL_SAMPLE = "\n".join(
    [
        '{"url": "https://a.example/p1", '
        '"warc_ts": "2024-03-01T01:02:03Z", '
        '"html_b64": "PGgxPmhpPC9oMT4=", '
        '"text": "hello world", "lang": "en"}',
        # no url -> dropped
        '{"warc_ts": "2024-03-01T00:00:00Z", "text": "orphan"}',
        # malformed JSON -> dropped under DROPMALFORMED
        '{"url": "https://bad.example", "text": "unclosed',
        # minimal record: null html/lang survive
        '{"url": "https://b.example/p2", '
        '"warc_ts": "2024-03-02T10:20:30Z", "text": "second doc"}',
    ]
)


def _write_sample(tmp_path, name="sample.jsonl", payload=JSONL_SAMPLE):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as fh:
        fh.write(payload + "\n")
    return p


def test_read_jsonl_parses_and_drops(spark, tmp_path):
    p = _write_sample(tmp_path)
    rows = {r["url"]: r for r in read_jsonl(spark, p).collect()}
    assert set(rows) == {
        "https://a.example/p1",
        "https://b.example/p2",
    }
    r1 = rows["https://a.example/p1"]
    assert bytes(r1["html"]) == b"<h1>hi</h1>"
    assert r1["text"] == "hello world"
    assert r1["lang"] == "en"
    assert r1["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S") == (
        "2024-03-01T01:02:03"
    )
    r2 = rows["https://b.example/p2"]
    assert r2["html"] is None and r2["lang"] is None


def test_read_jsonl_permissive_keeps_null_row(spark, tmp_path):
    p = _write_sample(tmp_path)
    n_strict = read_jsonl(spark, p).count()
    # PERMISSIVE keeps the malformed line as an all-NULL row, which
    # the url filter then drops anyway -> same surviving rows
    n_perm = read_jsonl(spark, p, permissive=True).count()
    assert n_strict == n_perm == 2


def test_jsonl_round_trip(spark, tmp_path):
    src = pages_df(spark, 40, n_sites=3, seed=7)
    out = os.path.join(str(tmp_path), "rt")
    write_jsonl(src, out)
    back = read_jsonl(spark, out)
    a = {
        r["url"]: (
            r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["text"],
            r["lang"],
        )
        for r in src.collect()
    }
    b = {
        r["url"]: (
            r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["text"],
            r["lang"],
        )
        for r in back.collect()
    }
    assert a == b


def test_jsonl_gzip(spark, tmp_path):
    # gzip-compressed .jsonl.gz reads transparently (codec inferred
    # from the extension); parallelism = file count, as documented
    p = os.path.join(str(tmp_path), "part-00000.jsonl.gz")
    with gzip.open(p, "wt") as fh:
        fh.write(JSONL_SAMPLE + "\n")
    assert read_jsonl(spark, str(tmp_path)).count() == 2


def test_jsonl_compressed_write_round_trip(spark, tmp_path):
    src = pages_df(spark, 10, n_sites=2, seed=3)
    out = os.path.join(str(tmp_path), "gz")
    write_jsonl(src, out, compression="gzip")
    assert any(f.endswith(".gz") for f in os.listdir(out))
    assert read_jsonl(spark, out).count() == 10


def test_jsonl_enrich_parity_with_parquet_path(spark, tmp_path):
    """The JSONL path feeds enrich_pages identically to the native
    DataFrame path: same doc set, same doc_len per url."""
    src = pages_df(spark, 30, n_sites=3, seed=11)
    out = os.path.join(str(tmp_path), "parity")
    write_jsonl(src, out)
    direct = enrich_pages(src).select("url", "doc_len")
    via_jsonl = enrich_pages(read_jsonl(spark, out)).select(
        "url", "doc_len"
    )
    a = dict(direct.collect())
    b = dict(via_jsonl.collect())
    assert a == b


def test_jsonl_column_pruning_skips_html(spark, tmp_path):
    """A text-only projection never references html_b64 in the scan
    schema (pruning pushes into the JSON parser)."""
    src = pages_df(spark, 10, n_sites=2, seed=5)
    out = os.path.join(str(tmp_path), "prune")
    write_jsonl(src, out)
    plan = (
        read_jsonl(spark, out)
        .select("url", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "html_b64" not in plan
