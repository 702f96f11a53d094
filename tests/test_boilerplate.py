"""Site-level boilerplate line removal (CCNet-style line dedup)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.curation import (
    remove_boilerplate_lines,
)

FOOTER = "All Rights Reserved — ACME Corp"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, site string, text string"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a", f"alpha one\n{FOOTER}\nunique tail 1"),
        (2, "a", f"beta two\n{footer_case()}\nunique tail 2"),
        (3, "a", f"gamma three\n{FOOTER}\nunique tail 3"),
        # same footer on site b, but only ONE doc there -> kept
        (4, "b", f"delta four\n{FOOTER}\nunique tail 4"),
        # doc of blank lines (never boilerplate)
        (5, "a", "\n\nkeep me\n\n"),
        (6, "a", ""),
    ]
    return _df(spark, rows)


def footer_case():
    return FOOTER.upper()  # normalization is lower(trim(...))


def _clean(df, **kw):
    return {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_lines(df, **kw).collect()
    }


def test_recurring_site_line_dropped(corpus):
    out = _clean(corpus, max_df=2)
    assert out[1] == "alpha one\nunique tail 1"
    assert out[2] == "beta two\nunique tail 2"   # case-folded match
    assert out[3] == "gamma three\nunique tail 3"


def test_other_site_below_threshold_kept(corpus):
    out = _clean(corpus, max_df=2)
    assert out[4] == f"delta four\n{FOOTER}\nunique tail 4"


def test_blank_lines_and_empty_docs_survive(corpus):
    out = _clean(corpus, max_df=2)
    assert out[5] == "\n\nkeep me\n\n"
    assert out[6] == ""


def test_corpus_wide_scope(corpus):
    # group_col=None: footer recurs in 4 docs corpus-wide > 3
    out = _clean(corpus, max_df=3, group_col=None)
    assert out[4] == "delta four\nunique tail 4"


def test_line_order_preserved(spark):
    df = _df(spark, [
        (1, "a", "z last\nboiler\nm middle\na first"),
        (2, "a", "boiler\nother"),
        (3, "a", "boiler\nmore"),
    ])
    out = _clean(df, max_df=2)
    assert out[1] == "z last\nm middle\na first"


def test_all_columns_pass_through(spark):
    df = _df(spark, [(1, "a", "x"), (2, "a", "x"), (3, "a", "x")])
    res = remove_boilerplate_lines(df, max_df=2)
    assert set(res.columns) == {"doc_id", "site", "text", "clean_text"}
    got = {r.doc_id: (r.text, r.clean_text) for r in res.collect()}
    assert got[1] == ("x", "")  # original text untouched
