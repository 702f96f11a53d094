"""Boolean mini query language: parser units, equivalence with the
underlying candidate modes, NOT semantics, and phrase intersection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.boolquery import (
    parse_simple_query,
    search_boolean,
)
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


def test_parser_units():
    p = parse_simple_query(
        '+alpha -beta gamma "delta epsilon" +zeta site:h.example'
    )
    assert p["must"] == ["alpha", "zeta"]
    assert p["must_not"] == ["beta"]
    assert p["should"] == ["gamma"]
    assert p["phrases"] == [["delta", "epsilon"]]
    assert p["sites"] == ["h.example"]


def test_parser_edge_cases():
    assert parse_simple_query("") == {
        "must": [], "should": [], "must_not": [], "phrases": [],
        "sites": [], "titles": [], "nears": [],
    }
    # ~N after a quoted group is a NEAR unit, not a phrase
    p = parse_simple_query('"alpha beta"~3 "gamma delta"')
    assert p["nears"] == [(["alpha", "beta"], 3)]
    assert p["phrases"] == [["gamma", "delta"]]
    with pytest.raises(ValueError):
        parse_simple_query('-"a b"~2')
    # stray operators, empty quotes and empty site:/title: are dropped
    p = parse_simple_query('+ - "" site: title: alpha')
    assert p["should"] == ["alpha"] and p["phrases"] == []
    assert p["sites"] == [] and p["titles"] == []
    with pytest.raises(ValueError):
        parse_simple_query('-"no negated phrases"')
    with pytest.raises(ValueError):
        parse_simple_query("-site:h.example")
    with pytest.raises(ValueError):
        parse_simple_query("-title:foo")
    # title words tokenize to surface forms
    assert parse_simple_query("title:Alpha-Beta x")["titles"] == [
        "alpha", "beta"
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return enrich_pages(
        pages_df(spark, 200, n_sites=4, seed=42)
    ).cache()


@pytest.fixture(scope="module")
def idx(docs):
    return build_index(docs, id_col="url", analyzer="tokens")


def _rows(df):
    return [
        (r["url"], round(r["score"], 9), r["rn"]) for r in df.collect()
    ]


def test_bare_terms_equal_union_mode(idx):
    q = "crystal falcon nebula"
    a = _rows(search_boolean(idx, q, limit=15, analyzer="tokens"))
    b = _rows(search(idx, q, limit=15, analyzer="tokens",
                     candidates="union"))
    assert a == b and len(a) > 0


def test_all_musts_equal_all_mode(idx):
    a = _rows(search_boolean(
        idx, "+crystal +falcon", limit=15, analyzer="tokens"
    ))
    b = _rows(search(idx, "crystal falcon", limit=15,
                     analyzer="tokens", candidates="all"))
    assert a == b and len(a) > 0


def test_and_mode_is_subset_of_union(idx):
    q = "crystal falcon"
    allm = {r[0] for r in _rows(search(
        idx, q, limit=200, analyzer="tokens", candidates="all"))}
    union = {r[0] for r in _rows(search(
        idx, q, limit=200, analyzer="tokens", candidates="union"))}
    assert allm and allm <= union


def test_must_not_excludes(idx, docs):
    got = search_boolean(
        idx, "+crystal -falcon", limit=200, analyzer="tokens"
    )
    hits = {r["url"] for r in got.collect()}
    assert hits
    offenders = {
        r["url"]
        for r in docs.filter(
            F.array_contains(F.col("tokens"), "falcon")
        ).collect()
    }
    assert not (hits & offenders)


def test_phrase_requires_enriched(idx):
    with pytest.raises(ValueError):
        search_boolean(idx, '"crystal falcon"', analyzer="tokens")


def test_phrase_intersects_candidates(idx, docs):
    # pick a bigram that provably occurs and isn't fully stoplisted,
    # then check every hit really contains the consecutive pair
    rows = docs.select("url", "tokens").collect()
    stop = set(idx.stoplist)
    bigram = None
    for r in rows:
        toks = list(r["tokens"])
        for i in range(len(toks) - 1):
            if toks[i] not in stop or toks[i + 1] not in stop:
                bigram = (toks[i], toks[i + 1])
                break
        if bigram:
            break
    assert bigram is not None
    res = search_boolean(
        idx, f'"{bigram[0]} {bigram[1]}"', enriched=docs,
        limit=300, analyzer="tokens",
    )
    hits = {r["url"] for r in res.collect()}
    truth = {
        r["url"]
        for r in rows
        if any(
            (t0, t1) == bigram
            for t0, t1 in zip(r["tokens"], r["tokens"][1:])
        )
    }
    assert hits and hits == truth


def test_boolean_compact_rank_identity(idx, docs):
    """Compact-index boolean executor == logical executor (same
    analysis, same shared scoring expression)."""
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )

    renamed = replace(
        idx,
        postings=idx.postings.withColumnRenamed("url", "nat_id"),
        doc_lens=idx.doc_lens.withColumnRenamed("url", "nat_id"),
        id_col="nat_id",
        cached=(),
    )
    cidx = compact_index(renamed, n_segments=4)
    for q in (
        "+crystal +falcon",
        "+crystal -falcon meadow",
        "crystal falcon nebula",
    ):
        a = _rows(search_boolean(idx, q, limit=25, analyzer="tokens"))
        b = [
            (r["nat_id"], round(r["score"], 9), r["rn"])
            for r in search_boolean_compact(
                cidx, q, limit=25, analyzer="tokens"
            ).collect()
        ]
        assert a == b and len(a) > 0


def test_site_field_restricts(idx):
    base = search_boolean(
        idx, "crystal falcon", limit=300, analyzer="tokens"
    ).collect()
    assert {r["site"] for r in base} > {"site00.example"}
    only = search_boolean(
        idx, "crystal falcon site:site00.example", limit=300,
        analyzer="tokens",
    ).collect()
    assert only and {r["site"] for r in only} == {"site00.example"}
    # site: matches search(sites=[...]) exactly (same idf-N quirk)
    via_arg = search(
        idx, "crystal falcon", sites=["site00.example"], limit=300,
        analyzer="tokens", candidates="union",
    ).collect()
    assert _rows_df(only) == _rows_df(via_arg)
    # disjoint restriction intersection -> empty, not unrestricted
    none = search_boolean(
        idx, "crystal falcon site:site00.example", limit=300,
        analyzer="tokens", sites=["site01.example"],
    )
    assert none.count() == 0


def _rows_df(rows):
    return sorted(
        (r["url"], round(r["score"], 9), r["rn"]) for r in rows
    )


def test_title_field_restricts(idx, docs):
    from search_engine_spark.functions.textproc import tokenize_py

    # pick a title word that appears in SOME but not all titles
    rows = docs.select("url", "title").collect()
    from collections import Counter

    c = Counter(
        t for r in rows for t in set(tokenize_py(r["title"] or ""))
    )
    word, n_with = next(
        (w, n) for w, n in c.most_common() if 0 < n < len(rows)
    )
    with_title = {
        r["url"]
        for r in rows
        if word in tokenize_py(r["title"] or "")
    }
    base = search_boolean(
        idx, "crystal falcon", limit=300, analyzer="tokens"
    ).collect()
    got = search_boolean(
        idx, f"crystal falcon title:{word}", enriched=docs,
        limit=300, analyzer="tokens",
    ).collect()
    assert {r["url"] for r in got} == {
        r["url"] for r in base
    } & with_title
    # scores are unchanged by the filter (pure restriction)
    base_s = {r["url"]: r["score"] for r in base}
    for r in got:
        assert r["score"] == pytest.approx(base_s[r["url"]], rel=1e-9)
    # enriched frame is required
    with pytest.raises(ValueError):
        search_boolean(idx, f"crystal title:{word}", analyzer="tokens")


def test_title_field_compact_matches_logical(idx, docs):
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )

    renamed = replace(
        idx,
        postings=idx.postings.withColumnRenamed("url", "nat_id"),
        doc_lens=idx.doc_lens.withColumnRenamed("url", "nat_id"),
        id_col="nat_id",
        cached=(),
    )
    cidx = compact_index(renamed, n_segments=4)
    q = "crystal falcon title:the"
    a = _rows(search_boolean(
        idx, q, enriched=docs, limit=50, analyzer="tokens"
    ))
    b = [
        (r["nat_id"], round(r["score"], 9), r["rn"])
        for r in search_boolean_compact(
            cidx, q,
            enriched=docs.withColumnRenamed("url", "nat_id"),
            limit=50, analyzer="tokens",
        ).collect()
    ]
    assert a == b


def test_near_unit_restricts_and_scores_like_shoulds(idx, docs):
    from search_engine_spark.operators.phrases import (
        near_match,
        positional_postings,
    )

    q = '"token lemma"~4 crystal'
    got = search_boolean(
        idx, q, enriched=docs, limit=300, analyzer="tokens"
    ).collect()
    assert got
    pp = positional_postings(docs, id_col="url")
    allowed = {
        r["url"]
        for r in near_match(
            pp, ["token", "lemma"], 4, id_col="url"
        ).collect()
    }
    assert {r["url"] for r in got} <= allowed
    # near words contribute to scoring like bare shoulds: the same
    # docs scored via the plain union query agree on score
    base = {
        r["url"]: r["score"]
        for r in search(
            idx, "token lemma crystal", limit=500,
            analyzer="tokens", candidates="union",
        ).collect()
    }
    for r in got:
        assert r["score"] == pytest.approx(base[r["url"]], rel=1e-9)
    # slop 0 is a (possibly reordered) adjacency constraint -> subset
    tight = search_boolean(
        idx, '"token lemma"~0 crystal', enriched=docs, limit=300,
        analyzer="tokens",
    ).collect()
    assert {r["url"] for r in tight} <= {r["url"] for r in got}


def test_near_unit_compact_parity(idx, docs):
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )

    renamed = replace(
        idx,
        postings=idx.postings.withColumnRenamed("url", "nat_id"),
        doc_lens=idx.doc_lens.withColumnRenamed("url", "nat_id"),
        id_col="nat_id",
        cached=(),
    )
    cidx = compact_index(renamed, n_segments=4)
    q = '"token lemma"~4 crystal'
    a = _rows(search_boolean(
        idx, q, enriched=docs, limit=50, analyzer="tokens"
    ))
    b = [
        (r["nat_id"], round(r["score"], 9), r["rn"])
        for r in search_boolean_compact(
            cidx, q,
            enriched=docs.withColumnRenamed("url", "nat_id"),
            limit=50, analyzer="tokens",
        ).collect()
    ]
    assert a == b and len(a) > 0
