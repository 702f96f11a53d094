"""Synonym-group BM25, Dirichlet-LM ranking, and proximity rerank —
brute-force Python oracles over the fixture corpus plus structural
invariants (no-synonym identity, boost monotonicity)."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators.phrases import (
    min_cover_span,
    positional_postings,
    proximity_search,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.lm import search_lm
from search_engine_spark.plans.search import search
from search_engine_spark.plans.synonyms import (
    expand_terms,
    search_synonyms,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def docs(spark):
    return enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    ).cache()


@pytest.fixture(scope="module")
def idx(spark, docs):
    return build_index(docs, analyzer="tokens")


@pytest.fixture(scope="module")
def tok_rows(docs):
    return {
        r["url"]: list(r["tokens"])
        for r in docs.select("url", "tokens").collect()
    }


# ---------------------------------------------------------------------------
# synonyms
# ---------------------------------------------------------------------------


def test_expand_terms_analyzes_both_sides():
    groups = expand_terms(
        ["run"], {"running": ["sprinted jogging"]}, analyzer="tokens"
    )
    # tokens analyzer: "running" stays "running" ≠ "run" → no match
    assert groups == {"run": ["run"]}
    groups = expand_terms(
        ["run"], {"run": ["sprint", "jog"]}, analyzer="tokens"
    )
    assert groups == {"run": ["jog", "run", "sprint"]}


def test_synonyms_none_matches_plain_search(idx):
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_synonyms(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    assert a == b and len(a) > 0


def _brute_synonym_scores(tok_rows, groups, k1, b, stop):
    """Definitional group-BM25 over the raw token lists."""
    groups = {
        g: [m for m in ms if m not in stop]
        for g, ms in groups.items()
    }
    groups = {g: ms for g, ms in groups.items() if ms}
    n = len(tok_rows)
    avg = sum(len(t) for t in tok_rows.values()) / n
    gdf = {
        g: sum(
            1
            for toks in tok_rows.values()
            if any(m in toks for m in ms)
        )
        for g, ms in groups.items()
    }
    idf = {}
    for g, d in gdf.items():
        ratio = (n - d + 0.5) / (d + 0.5)
        if d > 0 and ratio > 0:
            idf[g] = math.log(ratio)
    groups = {g: ms for g, ms in groups.items() if g in idf}
    if not groups:
        return {}
    rarest = sorted(groups, key=lambda g: (gdf[g], g))[0]
    cands = [
        u
        for u, toks in tok_rows.items()
        if any(m in toks for m in groups[rarest])
    ]
    out = {}
    for u in cands:
        toks = tok_rows[u]
        dl = len(toks)
        s = 0.0
        for g, ms in groups.items():
            gtf = sum(toks.count(m) for m in ms)
            if gtf == 0:
                continue
            tfn = gtf / dl
            s += (
                idf[g]
                * tfn
                * (k1 + 1)
                / (tfn + k1 * (1 - b + b * dl / avg))
            )
        out[u] = s
    return out


def test_synonyms_match_bruteforce(idx, tok_rows):
    syn = {"crystal": ["quartz"], "meadow": ["prairie"]}
    groups = expand_terms(
        ["crystal", "meadow"], syn, analyzer="tokens"
    )
    expect = _brute_synonym_scores(
        tok_rows, groups, idx.config.bm25.k1, idx.config.bm25.b,
        set(idx.stoplist),
    )
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = search_synonyms(
        idx, "crystal meadow", synonyms=syn, limit=15,
        analyzer="tokens",
    ).collect()
    assert [r["url"] for r in got] == [u for u, _ in top]
    for r, (_, s) in zip(got, top):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_synonyms_widen_recall(idx):
    base = search(
        idx, "falcon", limit=500, analyzer="tokens",
        candidates="union",
    ).count()
    syn = search_synonyms(
        idx, "falcon", synonyms={"falcon": ["osprey"]}, limit=500,
        analyzer="tokens",
    ).count()
    assert syn >= base


# ---------------------------------------------------------------------------
# Dirichlet LM
# ---------------------------------------------------------------------------


def _brute_lm_scores(tok_rows, terms, mu, stop):
    terms = sorted(
        {t for t in terms if t not in stop}
    )
    total = sum(len(t) for t in tok_rows.values())
    cf = {
        t: sum(toks.count(t) for toks in tok_rows.values())
        for t in terms
    }
    terms = [t for t in terms if cf[t] > 0]
    if not terms:
        return {}
    out = {}
    for u, toks in tok_rows.items():
        if not any(t in toks for t in terms):
            continue
        dl = len(toks)
        s = len(terms) * math.log(mu / (dl + mu))
        for t in terms:
            tf = toks.count(t)
            s += math.log(1 + tf / (mu * cf[t] / total))
        out[u] = s
    return out


def test_lm_matches_bruteforce(idx, tok_rows):
    mu = 500.0
    expect = _brute_lm_scores(
        tok_rows, ["crystal", "meadow"], mu, set(idx.stoplist)
    )
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = search_lm(
        idx, "crystal meadow", mu=mu, limit=15, analyzer="tokens"
    ).collect()
    assert [r["url"] for r in got] == [u for u, _ in top]
    for r, (_, s) in zip(got, top):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_lm_unknown_and_empty(idx):
    assert search_lm(idx, "zzzzunknownzzzz", analyzer="tokens").count() == 0
    assert search_lm(idx, "", analyzer="tokens").count() == 0


def _brute_jm_scores(tok_rows, terms, lam, stop):
    """Jelinek–Mercer present-term decomposition:
    Σ log(1 + ((1−λ)/λ)·tf/(len·P(t|C)))."""
    terms = sorted({t for t in terms if t not in stop})
    total = sum(len(t) for t in tok_rows.values())
    cf = {
        t: sum(toks.count(t) for toks in tok_rows.values())
        for t in terms
    }
    terms = [t for t in terms if cf[t] > 0]
    if not terms:
        return {}
    ratio = (1 - lam) / lam
    out = {}
    for u, toks in tok_rows.items():
        if not any(t in toks for t in terms):
            continue
        dl = len(toks)
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                s += math.log(1 + ratio * tf / (dl * cf[t] / total))
        out[u] = s
    return out


def test_lm_jm_matches_bruteforce(idx, tok_rows):
    lam = 0.3
    expect = _brute_jm_scores(
        tok_rows, ["crystal", "meadow"], lam, set(idx.stoplist)
    )
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = search_lm(
        idx, "crystal meadow", smoothing="jm", lam=lam, limit=15,
        analyzer="tokens",
    ).collect()
    assert [r["url"] for r in got] == [u for u, _ in top]
    for r, (_, s) in zip(got, top):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_lm_jm_param_validation(idx):
    with pytest.raises(ValueError):
        search_lm(idx, "crystal", smoothing="nope")
    with pytest.raises(ValueError):
        search_lm(idx, "crystal", smoothing="jm", lam=0.0)
    with pytest.raises(ValueError):
        search_lm(idx, "crystal", smoothing="jm", lam=1.0)


def test_lm_avg_len_consistent_total(idx, tok_rows):
    # |C| reconstruction used by search_lm equals the true token total
    assert idx.avg_len * idx.n_docs == pytest.approx(
        sum(len(t) for t in tok_rows.values()), rel=1e-9
    )


# ---------------------------------------------------------------------------
# proximity
# ---------------------------------------------------------------------------


def _brute_min_span(toks, terms):
    hits = sorted(
        (i, t) for i, tok in enumerate(toks)
        for t in [tok] if t in terms
    )
    if {t for _, t in hits} != set(terms):
        return None
    best = None
    from collections import Counter

    counts: Counter = Counter()
    left = 0
    for right in range(len(hits)):
        counts[hits[right][1]] += 1
        while len(counts) == len(set(terms)) and all(
            v > 0 for v in counts.values()
        ):
            span = hits[right][0] - hits[left][0]
            if best is None or span < best:
                best = span
            counts[hits[left][1]] -= 1
            if counts[hits[left][1]] == 0:
                del counts[hits[left][1]]
            left += 1
    return best


@pytest.mark.parametrize(
    "terms", [["token", "lemma"], ["score", "rank", "shard"]]
)
def test_min_cover_span_matches_bruteforce(docs, tok_rows, terms):
    pp = positional_postings(docs, id_col="url")
    got = {
        r["url"]: r["span"]
        for r in min_cover_span(pp, terms, id_col="url").collect()
    }
    expect = {
        u: s
        for u, toks in tok_rows.items()
        if (s := _brute_min_span(toks, set(terms))) is not None
    }
    assert got == expect and len(expect) > 0


def test_min_cover_span_empty_terms(docs):
    pp = positional_postings(docs, id_col="url")
    assert min_cover_span(pp, [], id_col="url").count() == 0


def test_proximity_rerank_boosts_co_occurrence(idx, docs, tok_rows):
    terms = ["lemma", "token"]
    base = search(
        idx, "token lemma", limit=100, analyzer="tokens"
    ).collect()
    got = proximity_search(
        idx, docs, "token lemma", prox_weight=1.0,
        rerank_depth=100, limit=100, analyzer="tokens",
    ).collect()
    assert len(got) == len(base)
    base_score = {r["url"]: r["score"] for r in base}
    for r in got:
        span = _brute_min_span(tok_rows[r["url"]], set(terms))
        if span is None:
            assert r["score"] == pytest.approx(
                base_score[r["url"]], rel=1e-9
            )
        else:
            factor = 1.0 + 1.0 / (1.0 + span - 1)
            assert r["score"] == pytest.approx(
                base_score[r["url"]] * factor, rel=1e-9
            )
    # ordering is (score desc, id asc) and rn is 1..k
    scores = [(-r["score"], r["url"]) for r in got]
    assert scores == sorted(scores)
    assert [r["rn"] for r in got] == list(range(1, len(got) + 1))


# ---------------------------------------------------------------------------
# dis_max multi-field
# ---------------------------------------------------------------------------


def _brute_dismax(rows, terms, tie, k1=1.5, b=0.75):
    """rows: [(id, body_tokens, title_tokens)]"""
    fields = [1, 2]
    per_field = {}
    for fi in fields:
        docs = [(r[0], r[fi]) for r in rows if len(r[fi]) > 0]
        n = len(docs)
        if n == 0:
            continue
        avg = sum(len(t) for _, t in docs) / n
        dfreq = {
            t: sum(1 for _, toks in docs if t in toks) for t in terms
        }
        scores = {}
        for did, toks in docs:
            s = 0.0
            L = len(toks)
            for t in terms:
                tf = toks.count(t)
                if tf == 0 or dfreq[t] == 0:
                    continue
                idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                tfn = tf / L
                s += idf * tfn * (k1 + 1) / (
                    tfn + k1 * (1 - b + b * L / avg)
                )
            if s != 0.0 or any(t in toks for t in terms):
                scores[did] = s
        per_field[fi] = scores
    out = {}
    ids = set()
    for sc in per_field.values():
        ids |= set(sc)
    for did in ids:
        vals = [
            per_field[fi][did]
            for fi in per_field
            if did in per_field[fi]
        ]
        mx = max(vals)
        out[did] = mx + tie * (sum(vals) - mx)
    return out


DISMAX_ROWS = [
    (1, ["crystal", "falcon", "sky"], ["crystal", "news"]),
    (2, ["meadow", "grass", "crystal", "crystal"], []),
    (3, ["stone", "river"], ["crystal", "falcon"]),
    (4, ["sky", "cloud"], ["weather", "report"]),
    (5, ["falcon"], ["falcon"]),
]


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_bruteforce(spark, tie):
    from search_engine_spark.plans.search import dismax_topk

    df = spark.createDataFrame(
        DISMAX_ROWS,
        "doc_id long, tokens array<string>, "
        "title_tokens array<string>",
    )
    terms = ["crystal", "falcon"]
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_topk(
            df, terms, tie_breaker=tie, limit=10
        ).collect()
    }
    want = {
        k: round(v, 6)
        for k, v in _brute_dismax(DISMAX_ROWS, terms, tie).items()
    }
    # docs that match in SOME field appear; doc 4 never does
    assert 4 not in got
    assert set(got) == {k for k, v in want.items()}
    for did in got:
        assert got[did] == pytest.approx(want[did], abs=2e-6)


def test_dismax_title_only_doc_ranks(spark):
    from search_engine_spark.plans.search import dismax_topk

    df = spark.createDataFrame(
        DISMAX_ROWS,
        "doc_id long, tokens array<string>, "
        "title_tokens array<string>",
    )
    got = [
        r["doc_id"]
        for r in dismax_topk(
            df, ["crystal"], tie_breaker=0.0, limit=10
        ).collect()
    ]
    assert 3 in got  # crystal only in its title


def test_dismax_empty_inputs(spark):
    from search_engine_spark.plans.search import dismax_topk

    df = spark.createDataFrame(
        DISMAX_ROWS,
        "doc_id long, tokens array<string>, "
        "title_tokens array<string>",
    )
    assert dismax_topk(df, [], limit=5).count() == 0
    assert dismax_topk(df, ["zzznope"], limit=5).count() == 0
