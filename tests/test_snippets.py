"""T8–T12 snippet semantics (SentenceUtil.java / SearchServiceImpl.java
cites in plans/snippets.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.plans.snippets import (
    LIMIT_SENTENCE_LENGTH,
    attach_snippets,
    find_lemmas_in_sentence,
    limit_sentence,
    make_snippet_py,
    search_response,
    sort_sentences,
    split_sentences_py,
)


def test_split_sentences_keeps_terminators():
    text = "First one. Second here! Third? tail without end"
    parts = split_sentences_py(text)
    assert "".join(parts) == text
    assert parts[0] == "First one. "
    assert parts[-1] == "tail without end"


def test_split_sentences_empty():
    assert split_sentences_py("") == []


def test_find_lemmas_highlights_all_occurrences_lowercased():
    # SentenceUtil.java:45-67 — replaceIgnoreCase over the lowercased
    # token wraps EVERY occurrence, and substring matches count too.
    idf = {"crystal": 2.0}
    out, found = find_lemmas_in_sentence(
        "Crystal towers and crystal caves.", "english", idf
    )
    assert found == {"crystal": 2.0}
    # the replacement literal is the LOWERCASED token (the reference
    # passes splitToWords output into replaceIgnoreCase), so the
    # capitalized occurrence is rewritten lowercase too
    assert out == "<b>crystal</b> towers and <b>crystal</b> caves."


def test_find_lemmas_inflected_form_matches_lemma():
    idf = {"query": 1.5}
    out, found = find_lemmas_in_sentence(
        "Many queries arrive.", "english", idf
    )
    assert found == {"query": 1.5}
    assert "<b>queries</b>" in out


def test_find_lemmas_none_found():
    out, found = find_lemmas_in_sentence(
        "Nothing relevant here.", "english", {"crystal": 2.0}
    )
    assert found == {} and "<b>" not in out


def test_limit_sentence_short_passthrough():
    s = "short sentence with <b>word</b> inside."
    assert limit_sentence(s) == s


def test_limit_sentence_crops_around_first_highlight():
    prefix = "alpha " * 30               # 180 chars before the mark
    suffix = " omega" * 30
    s = prefix + "<b>target</b>" + suffix
    out = limit_sentence(s)
    assert len(s) > LIMIT_SENTENCE_LENGTH
    assert "<b>target</b>" in out
    assert out.startswith("...") and out.endswith("...")


def test_limit_sentence_giant_span():
    # SentenceUtil.java:24-25: span longer than the limit → span only
    inner = "x" * 150
    s = "start words <b>" + inner + "</b> end words " + "y" * 50
    out = limit_sentence(s)
    assert out == "...<b>" + inner + "</b>..."


def test_limit_sentence_crop_at_start():
    # highlight near the beginning → start stays 0, only tail cropped
    s = "<b>lead</b> " + "word " * 40
    out = limit_sentence(s)
    assert out.startswith("<b>lead</b>")
    assert out.endswith("...")
    assert len(out) <= LIMIT_SENTENCE_LENGTH + 10


def test_sort_sentences_reference_comparator():
    # ascending sorted-IDF vectors compared lexicographically; equal
    # prefix → more lemmas first; remaining ties stable.
    a = ("A", {"x": 3.0})
    b = ("B", {"y": 1.0})
    c = ("C", {"x": 3.0, "y": 1.0})   # vector [1,3]
    d = ("D", {"z": 1.0})             # ties with b on [1.0] prefix,
    #                                   same size → stable after b
    out = sort_sentences([a, b, c, d])
    # [1,3] vs [1]: first elements tie, shorter exhausts → size desc
    # puts C before B and D; A ([3]) sorts after every [1...] vector.
    assert out == ["C", "B", "D", "A"]


def test_make_snippet_limit_300():
    idf = {"crystal": 2.0}
    text = " ".join(
        f"crystal sentence number {'pad ' * 20}{i}." for i in range(30)
    )
    snip = make_snippet_py(text, "english", idf)
    assert "<b>crystal</b>" in snip
    # builder stops once ≥300 chars; one sentence may overflow past it
    assert len(snip) <= 300 + LIMIT_SENTENCE_LENGTH + 4


def test_make_snippet_no_match_empty():
    assert make_snippet_py("Nothing here.", "english", {"zz": 1.0}) == ""


def test_attach_snippets_spark(spark):
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.search import (
        analyze_query,
        query_term_idf,
        search,
    )
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    pages = pages_df(spark, 120, n_sites=3, seed=42)
    enriched = enrich_pages(pages)
    idx = build_index(enriched, analyzer="lemma")
    query = "crystal falcon"
    res = search(idx, query, limit=5)
    terms = [
        t
        for t in analyze_query(query)
        if t not in set(idx.stoplist)
    ]
    idf = query_term_idf(idx, terms)
    out = attach_snippets(res, enriched, idf).collect()
    assert 0 < len(out) <= 5
    assert [r["rn"] for r in out] == sorted(r["rn"] for r in out)
    texts = {
        r["url"]: (r["text"], r["lang"])
        for r in enriched.select("url", "text", "lang").collect()
    }
    for r in out:
        assert "<b>" in r["snippet"]
        # UDF output == driver-side twin (same function, but proves
        # the Arrow path serializes faithfully)
        t, lg = texts[r["url"]]
        assert r["snippet"] == make_snippet_py(t, lg, idf)

    resp = search_response(out, total=len(out))
    assert resp["result"] is True and resp["count"] == len(out)
    item = resp["data"][0]
    assert set(item) == {
        "site", "siteName", "uri", "title", "snippet", "relevance"
    }
    assert item["site"].startswith("https://")
