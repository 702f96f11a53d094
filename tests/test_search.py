"""End-to-end rank-identity: Spark engine vs pure-Python oracle.

Covers the reference query set shapes (FIXTURES.md §2): single rare
term, stop-listed head term (empty result), multi-term mixed rarity,
absent term, inflected forms, site-restricted (global-df/local-N
quirk), and offset/limit pagination.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import search, search_total
from search_engine_spark.sources.fixtures import generate_pages_pdf, pages_df
from search_engine_spark.sources.pages import enrich_pages
from tests.oracle import OracleDoc, OracleIndex

QUERIES = [
    "crystal meadow",              # two mid/rare terms
    "falcon",                      # single rare term
    "spark",                       # head term (likely stop-listed)
    "zzzzunknownzzzz",             # absent from corpus
    "queries indexing searched",   # inflected forms -> lemmas
    "nebula orchid prairie quartz",  # multi-term
    "the and of",                  # all particles -> empty
    "glacier horizon the running",  # mixed: particles + content
]


@pytest.fixture(scope="module")
def corpus():
    return generate_pages_pdf(200, n_sites=4, seed=42)


@pytest.fixture(scope="module")
def spark_index(spark, corpus):
    df = pages_df(spark, 200, n_sites=4, seed=42, n_partitions=8)
    return build_index(enrich_pages(df))


@pytest.fixture(scope="module")
def oracle_index(corpus):
    docs = [
        OracleDoc(
            doc_id=r["url"],
            site=r["url"].split("/")[2],
            text=r["text"],
            lang=r["lang"],
        )
        for _, r in corpus.iterrows()
    ]
    return OracleIndex(docs)


def _assert_rank_identical(got_rows, expect, id_col="url"):
    got = [(r[id_col], r["score"]) for r in got_rows]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gid, gs), (eid, es) in zip(got, expect):
        assert math.isclose(gs, es, rel_tol=1e-6), (gid, gs, es)


def test_stoplist_matches(spark_index, oracle_index):
    assert set(spark_index.stoplist) == set(oracle_index.stoplist)
    assert tuple(sorted(spark_index.stoplist)) == tuple(
        sorted(oracle_index.stoplist)
    )


def test_corpus_stats_match(spark_index, oracle_index):
    assert spark_index.n_docs == oracle_index.n_docs
    assert math.isclose(
        spark_index.avg_len, oracle_index.avg_len, rel_tol=1e-9
    )


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_top10(spark_index, oracle_index, query):
    got = search(spark_index, query, limit=10).collect()
    expect = oracle_index.search(query, limit=10)
    _assert_rank_identical(got, expect)


def test_site_restricted(spark_index, oracle_index):
    sites = ["site00.example", "site02.example"]
    q = "crystal meadow falcon"
    got = search(spark_index, q, sites=sites, limit=10).collect()
    expect = oracle_index.search(q, sites=sites, limit=10)
    _assert_rank_identical(got, expect)
    for r in got:
        assert r["site"] in sites


def test_pagination(spark_index, oracle_index):
    q = "crystal meadow"
    full = oracle_index.search(q, limit=50)
    if len(full) < 7:
        pytest.skip("corpus too small for pagination case")
    got = search(spark_index, q, offset=3, limit=4).collect()
    expect = oracle_index.search(q, offset=3, limit=4)
    _assert_rank_identical(got, expect)
    assert [r["rn"] for r in got] == [4, 5, 6, 7]


def test_total_count(spark_index, oracle_index):
    q = "crystal meadow"
    assert search_total(spark_index, q) == oracle_index.total(q)


def test_df_quirk_site_restriction_changes_scores(
    spark_index, oracle_index
):
    """df stays global while N shrinks to the selected sites — scores
    must shift exactly as the oracle says (the quirk is preserved)."""
    q = "falcon glacier"
    all_scores = {r[0]: r[1] for r in oracle_index.search(q, limit=50)}
    one_site = oracle_index.search(q, sites=["site01.example"], limit=50)
    got = search(
        spark_index, q, sites=["site01.example"], limit=50
    ).collect()
    _assert_rank_identical(got, one_site)
    # sanity: restricting sites changes N hence scores differ
    if one_site and one_site[0][0] in all_scores:
        assert not math.isclose(
            one_site[0][1], all_scores[one_site[0][0]], rel_tol=1e-12
        )


def test_empty_query_returns_empty(spark_index):
    assert search(spark_index, "").count() == 0
    assert search(spark_index, "...!!!").count() == 0


def test_bm25f_title_boost(spark):
    from search_engine_spark.plans.search import bm25f_topk

    rows = [
        # same body tf for 'spark'; doc 1 also has it in the title.
        # enough non-matching docs that idf stays positive (df=2,
        # n=6 → ln(4.5/2.5) > 0; Robertson negatives are kept by
        # design, which would invert the comparison)
        (0, ["spark", "query", "engine", "fast"], ["other", "title"]),
        (1, ["spark", "query", "engine", "slow"], ["spark", "title"]),
        (2, ["nothing", "relevant", "here", "at"], ["all", "today"]),
        (3, ["more", "filler", "content", "words"], ["some", "page"]),
        (4, ["yet", "another", "plain", "doc"], ["boring", "one"]),
        (5, ["final", "padding", "row", "data"], ["last", "entry"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, "
              "title_tokens array<string>",
    )
    got = bm25f_topk(df, ["spark"], title_weight=2.0, limit=10).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1 and 2 not in ids  # title hit wins; non-match absent
    # weight 0 → pure body scoring: equal tf, equal len → id tiebreak
    flat = bm25f_topk(df, ["spark"], title_weight=0.0, limit=10).collect()
    assert [r["doc_id"] for r in flat] == [0, 1]
    assert flat[0]["score"] == flat[1]["score"]
    # empty query and absent term degrade to empty results
    assert bm25f_topk(df, [], limit=5).count() == 0
    assert bm25f_topk(df, ["zzz"], limit=5).count() == 0


def test_search_many_rank_identical_per_query(spark_index):
    from search_engine_spark.plans.search import search, search_many

    idx = spark_index
    queries = [
        "crystal meadow",
        "crystals meadows rivers",
        "zzzqqq",                 # no surviving terms → absent
        "spark query index",      # all stop-listed head terms
        "velvet",
    ]
    batch = search_many(idx, queries, limit=7).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["rn"], r["url"], r["site"], round(r["score"], 9))
        )
    for qid, q in enumerate(queries):
        single = [
            (r["rn"], r["url"], r["site"], round(r["score"], 9))
            for r in search(idx, q, limit=7).collect()
        ]
        got = sorted(by_q.get(qid, []))
        assert got == sorted(single), (qid, q)


def test_search_many_site_restriction(spark_index):
    from search_engine_spark.plans.search import search, search_many

    idx = spark_index
    sites = ["site00.example"]
    batch = search_many(
        idx, ["crystal meadow"], sites=sites, limit=5
    ).collect()
    single = search(idx, "crystal meadow", sites=sites, limit=5).collect()
    assert {(r["url"], r["rn"]) for r in batch} == {
        (r["url"], r["rn"]) for r in single
    }


# ---------------------------------------------------------------------------
# host-crowding collapse (search_collapsed)
# ---------------------------------------------------------------------------


def _collapse_expect(pool_rows, per_site, offset, limit):
    """Python reference: per-site top-N by (score desc, url asc),
    then global rank and pagination."""
    by_site = {}
    for r in sorted(pool_rows, key=lambda r: (-r["score"], r["url"])):
        by_site.setdefault(r["site"], []).append(r)
    keep = [r for rs in by_site.values() for r in rs[:per_site]]
    keep.sort(key=lambda r: (-r["score"], r["url"]))
    return [(r["url"], r["score"]) for r in keep[offset:offset + limit]]


def test_collapsed_large_per_site_equals_plain_search(spark_index):
    from search_engine_spark.plans.search import search_collapsed

    plain = search(spark_index, "glacier horizon", limit=10).collect()
    coll = search_collapsed(
        spark_index, "glacier horizon", per_site=10 ** 6, limit=10
    ).collect()
    assert [(r.url, r.score, r.rn) for r in coll] == [
        (r.url, r.score, r.rn) for r in plain
    ]


def test_collapsed_per_site_one(spark_index):
    from search_engine_spark.plans.search import search_collapsed

    pool = search(
        spark_index, "glacier horizon", limit=10 ** 6
    ).collect()
    assert len({r.site for r in pool}) < len(pool)  # crowding exists
    got = search_collapsed(
        spark_index, "glacier horizon", per_site=1, limit=10
    ).collect()
    sites = [r.site for r in got]
    assert len(sites) == len(set(sites))  # no site repeats
    want = _collapse_expect(
        [r.asDict() for r in pool], 1, 0, 10
    )
    assert [(r.url, r.score) for r in got] == want
    assert [r.rn for r in got] == list(range(1, len(got) + 1))


def test_collapsed_pagination_and_per_site_two(spark_index):
    from search_engine_spark.plans.search import search_collapsed

    pool = search(
        spark_index, "glacier horizon the running", limit=10 ** 6
    ).collect()
    want = _collapse_expect([r.asDict() for r in pool], 2, 2, 3)
    got = search_collapsed(
        spark_index, "glacier horizon the running",
        per_site=2, offset=2, limit=3,
    ).collect()
    assert [(r.url, r.score) for r in got] == want
    assert [r.rn for r in got] == [3, 4, 5]


def test_collapsed_empty_query(spark_index):
    from search_engine_spark.plans.search import search_collapsed

    out = search_collapsed(spark_index, "the and of", per_site=1)
    assert out.count() == 0
    assert out.columns == ["url", "site", "score", "rn"]


# ---------------------------------------------------------------------------
# static-prior boosted ranking (search_with_priors)
# ---------------------------------------------------------------------------


def test_priors_neutral_equals_plain(spark, spark_index):
    from search_engine_spark.plans.search import search_with_priors

    plain = search(spark_index, "glacier horizon", limit=10).collect()
    ones = spark_index.doc_lens.select(
        "url", F.lit(1.0).alias("prior")
    )
    got = search_with_priors(
        spark_index, "glacier horizon", ones, prior_weight=5.0,
        limit=10,
    ).collect()
    assert [(r.url, round(r.score, 9), r.rn) for r in got] == [
        (r.url, round(r.score, 9), r.rn) for r in plain
    ]


def test_priors_reorder_matches_python_reference(spark, spark_index):
    from search_engine_spark.plans.search import search_with_priors

    pool = search(
        spark_index, "glacier horizon the running", limit=10 ** 6
    ).collect()
    # deterministic synthetic prior: 1 + (len(url) % 7)
    prior = {r.url: 1.0 + (len(r.url) % 7) for r in pool}
    pr_df = spark.createDataFrame(
        [(u, p) for u, p in prior.items()], "url string, prior double"
    )
    w = 0.5
    want = sorted(
        ((u, s + w * math.log(prior[u])) for u, s in
         ((r.url, r.score) for r in pool)),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = search_with_priors(
        spark_index, "glacier horizon the running", pr_df,
        prior_weight=w, limit=10,
    ).collect()
    assert [r.url for r in got] == [u for u, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r.score - s) < 1e-9
    # the boost actually changed the order vs plain BM25
    assert [r.url for r in got] != [r.url for r in pool[:10]]


def test_priors_missing_docs_get_default(spark, spark_index):
    from search_engine_spark.plans.search import search_with_priors

    pool = search(spark_index, "glacier horizon", limit=10 ** 6).collect()
    assert len(pool) >= 2
    # prior only for the current #2: boost it above #1
    pr_df = spark.createDataFrame(
        [(pool[1].url, 10.0 ** 6)], "url string, prior double"
    )
    got = search_with_priors(
        spark_index, "glacier horizon", pr_df, prior_weight=1.0,
        limit=3,
    ).collect()
    assert got[0].url == pool[1].url
    # default_prior below 1 demotes the unlisted docs further
    got2 = search_with_priors(
        spark_index, "glacier horizon", pr_df, prior_weight=1.0,
        default_prior=0.5, limit=3,
    ).collect()
    others = [r for r in got2 if r.url != pool[1].url]
    plain_scores = {r.url: r.score for r in pool}
    for r in others:
        assert r.score < plain_scores[r.url]


# ---------------------------------------------------------------------------
# search_after cursor pagination
# ---------------------------------------------------------------------------


def test_search_after_walks_offset_slices(spark_index):
    from search_engine_spark.plans.search import search, search_after

    q = "crystal meadow falcon"
    full = search(
        spark_index, q, limit=30, candidates="union"
    ).collect()
    assert len(full) >= 12
    pages = []
    after = None
    for _ in range(3):
        page = search_after(
            spark_index, q, after=after, limit=4,
            candidates="union",
        ).collect()
        assert [r["rn"] for r in page] == [1, 2, 3, 4]
        pages.extend(page)
        after = (page[-1]["score"], page[-1]["url"])
    want = [(r["url"], round(r["score"], 9)) for r in full[:12]]
    got = [(r["url"], round(r["score"], 9)) for r in pages]
    assert got == want


def test_search_after_none_is_page_one(spark_index):
    from search_engine_spark.plans.search import search, search_after

    q = "crystal meadow"
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_after(spark_index, q, limit=10).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search(spark_index, q, limit=10).collect()
    ]
    assert a == b and len(a) > 0


def test_search_after_past_end_empty(spark_index):
    from search_engine_spark.plans.search import search_after

    # a cursor below every score -> empty page
    page = search_after(
        spark_index, "crystal", after=(-1e18, ""), limit=5
    ).collect()
    assert page == []
