"""Taily shard selection (plans/federate.py) — gamma math vs closed
forms, stats vs brute force, selection behavior."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.federate import (
    _gamma_isf,
    _gamma_sf,
    _gammp,
    select_shards_taily,
    taily_shard_scores,
    taily_shard_scores_erlang,
    taily_term_stats,
)

# shard 0 is ABOUT apple pie (dense, co-occurring); shard 1 mentions
# the terms scattered among noise; shard 2 never does
SHARDS = [
    # enough term-free docs per shard that the query terms keep
    # POSITIVE shard-local Robertson idf (df/N well below 0.5)
    [
        (0, "apple pie apple pie apple"),
        (1, "apple pie baking guide apple"),
        (2, "pie apple tart recipe"),
        (3, "apple orchard pie stand"),
        (4, "alpha beta gamma delta"),
        (5, "red green blue cyan"),
        (6, "north south east west"),
        (7, "violin cello flute oboe"),
        (8, "stone river falcon meadow"),
    ],
    [
        (10, "apple somewhere in long noise text words here"),
        (11, "noise pie words other things entirely unrelated"),
        (12, "apple pie mentioned once among much other stuff"),
        (13, "completely other topic entirely"),
        (14, "yet more filler text rows"),
        (15, "and another unrelated document"),
    ],
    [
        (20, "trains and railways timetable"),
        (21, "station platform departure arrival"),
        (22, "freight wagon coal cargo"),
        (23, "rails sleepers gravel track"),
    ],
]
K1, B = 1.5, 0.75


def _erlang_p(k: int, x: float) -> float:
    """Closed-form P(k, x) for integer k (Erlang CDF)."""
    return 1.0 - math.exp(-x) * sum(
        x**j / math.factorial(j) for j in range(k)
    )


def test_gammp_matches_erlang_closed_form():
    for k in (1, 2, 3, 7):
        for x in (0.1, 0.5, 1.0, 2.5, 7.0, 20.0):
            assert _gammp(k, x) == pytest.approx(
                _erlang_p(k, x), rel=1e-10
            )


def test_gamma_isf_inverts_sf():
    for k, th in ((0.8, 2.0), (3.5, 0.7), (12.0, 1.3)):
        for p in (0.9, 0.5, 0.1, 0.01):
            s = _gamma_isf(k, th, p)
            assert _gamma_sf(k, th, s) == pytest.approx(p, abs=1e-9)


@pytest.fixture(scope="module")
def shard_stats(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    out = []
    for docs in SHARDS:
        df = (
            spark.createDataFrame(
                [(i, t) for i, t in docs], "doc_id long, text string"
            )
            .withColumn("site", F.lit("s.example"))
            .withColumn("lang", F.lit("english"))
            .withColumn(
                "tokens", tokens_col(F.col("text"), F.col("lang"))
            )
            .withColumn("doc_len", doc_len_col(F.col("tokens")))
        )
        idx = build_index(df, id_col="doc_id", analyzer="tokens")
        out.append((taily_term_stats(idx), idx.n_docs))
    return out


def _ref_stats(docs, term):
    """Brute-force (n, s1, s2) for one shard/term."""
    toks = {i: t.split() for i, t in docs}
    lens = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(toks)
    avg = sum(lens.values()) / n_docs
    dfq = sum(1 for ts in toks.values() if term in ts)
    if dfq == 0:
        return (0, 0.0, 0.0)
    idf = math.log((n_docs - dfq + 0.5) / (dfq + 0.5))
    s1 = s2 = 0.0
    for i, ts in toks.items():
        tf = Counter(ts)[term]
        if tf == 0:
            continue
        tfn = tf / lens[i]
        s = idf * (
            tfn * (K1 + 1) / (tfn + K1 * (1 - B + B * lens[i] / avg))
        )
        s1 += s
        s2 += s * s
    return (dfq, s1, s2)


def test_term_stats_match_brute_force(shard_stats):
    for si, (sdf, _) in enumerate(shard_stats):
        got = {
            r.term: (r.n, r.s1, r.s2)
            for r in sdf.filter(
                F.col("term").isin(["apple", "pie"])
            ).collect()
        }
        for t in ("apple", "pie"):
            n, s1, s2 = _ref_stats(SHARDS[si], t)
            if n == 0:
                assert t not in got
            else:
                assert got[t][0] == n
                assert got[t][1] == pytest.approx(s1, rel=1e-12)
                assert got[t][2] == pytest.approx(s2, rel=1e-12)


def test_taily_ranks_dense_shard_first(shard_stats):
    scores = taily_shard_scores(
        shard_stats, "apple pie", n_c=3, analyzer="tokens"
    )
    assert [i for i, _ in scores] == [0, 1, 2]
    est = dict(scores)
    assert est[2] == 0.0            # no query term at all
    assert est[0] > est[1] > 0.0    # dense beats scattered
    # estimates are DOC COUNTS: bounded by the conjunctive estimate
    assert est[0] <= len(SHARDS[0]) + 1e-9


def test_erlang_variant_is_integer_shape_gamma(shard_stats):
    """The Erlang contract variant must equal f·SF_Γ(s_c) evaluated
    at the clamped integer shape with mean-preserving scale — i.e.
    the full machinery restricted to integer k (whose survival the
    continued-fraction _gammp also computes)."""
    s_c = 0.2
    got = dict(taily_shard_scores_erlang(
        shard_stats, "apple pie", s_c, analyzer="tokens"
    ))
    # recompute the fit brute-force from the published broker stats
    for i, docs in enumerate(SHARDS):
        fits = []
        nd = len(docs)
        ok = True
        f = float(nd) ** (1 - 2)
        e = v = 0.0
        for t in ("apple", "pie"):
            n, s1, s2 = _ref_stats(docs, t)
            if n == 0:
                ok = False
                break
            f *= n
            m1 = s1 / n
            e += m1
            v += max(s2 / n - m1 * m1, 0.0)
        if not ok or e <= 0:
            assert got[i] == 0.0
            continue
        v = max(v, 1e-12)
        k = int(min(max(math.floor(e * e / v + 0.5), 1), 100))
        expect = f * _gamma_sf(float(k), e / k, s_c)
        assert got[i] == pytest.approx(expect, rel=1e-9)


def test_erlang_variant_missing_term_scores_zero(shard_stats):
    got = dict(taily_shard_scores_erlang(
        shard_stats, "apple freight", 0.2, analyzer="tokens"
    ))
    assert got[0] == 0.0 and got[1] == 0.0  # no shard has both


def test_taily_selection_cutoff(shard_stats):
    sel = select_shards_taily(
        shard_stats, "apple pie", n_c=3, v=0.5, analyzer="tokens"
    )
    assert sel[0] == 0
    assert 2 not in sel
    # unknown query selects nothing
    assert select_shards_taily(
        shard_stats, "zzznope", analyzer="tokens"
    ) == []
