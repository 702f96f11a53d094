"""C4-style three-sentence duplicate-span removal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    duplicate_spans,
    remove_duplicate_spans,
    span_table,
)

BOILER = "All rights reserved. Terms apply here. Contact the webmaster."

DOCS = [
    (1, f"Unique opening line one. Second thought follows. {BOILER} A closing remark."),
    (2, f"Different intro sentence. Another body sentence. {BOILER} Entirely new ending."),
    (3, "Totally original document. Nothing here repeats. Every sentence is fresh. Final words."),
    # doc 4 repeats doc 3's full text => its spans duplicate doc 3's
    (3 + 1, "Totally original document. Nothing here repeats. Every sentence is fresh. Final words."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_span_table_shape(spark, docs):
    rows = span_table(docs).collect()
    # doc 1 has 6 sentences -> 4 spans, doc 3 has 4 -> 2 spans
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["span_idx"])
    assert sorted(per_doc[1]) == [0, 1, 2, 3]
    assert sorted(per_doc[3]) == [0, 1]
    # identical docs produce identical fingerprints
    fp3 = {r["span_fp"] for r in rows if r["doc_id"] == 3}
    fp4 = {r["span_fp"] for r in rows if r["doc_id"] == 4}
    assert fp3 == fp4


def test_duplicate_spans(spark, docs):
    dups = duplicate_spans(docs).collect()
    # the boiler block straddles docs 1 and 2 at different offsets:
    # only the span fully inside the shared region duplicates; plus the
    # two full-doc spans of docs 3/4
    assert all(r["n_occ"] == 2 and r["n_docs"] == 2 for r in dups)
    assert len(dups) == 3


def test_remove_duplicate_spans_keep_one(spark, docs):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(docs).collect()
    }
    # keeper = lowest (doc_id, span_idx): doc 3 keeps everything,
    # doc 4 (duplicate of doc 3) loses its duplicated spans entirely
    assert "Totally original document" in out[3]
    assert "Totally original document" not in out[4]
    # doc 1 (lower id) keeps the boiler span; doc 2 loses it
    assert "All rights reserved" in out[1]
    assert "All rights reserved" not in out[2]
    # doc 2's unique sentences survive
    assert "Different intro sentence" in out[2]
    assert "Entirely new ending" in out[2]
    # non-duplicated docs keep every sentence in order
    assert out[3] == (
        "Totally original document. Nothing here repeats. "
        "Every sentence is fresh. Final words."
    )


def test_remove_spans_no_dups_is_identity_modulo_terminators(spark):
    df = spark.createDataFrame(
        [(1, "One sentence here. And two. And three.")], ["doc_id", "text"]
    )
    out = remove_duplicate_spans(df).collect()[0]["clean_text"]
    assert out == "One sentence here. And two. And three."
