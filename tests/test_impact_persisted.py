"""Persisted quantized-impact artifact (plans/impact.py
write_impacts / load_impacts / impact_topk_persisted): the at-rest
artifact must reproduce the in-memory quantization bit-for-bit and
the persisted query path must stay rank- and score-identical to
the logical impact_topk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.compact import compact_index
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.impact import (
    impact_topk,
    impact_topk_persisted,
    load_impacts,
    quantize_postings,
    rescore_topk,
    rescore_topk_persisted,
    write_impacts,
)

DOCS = [
    ("u00", "apple pie apple crumble apple"),
    ("u01", "apple cake with apple"),
    ("u02", "vector space model ranking"),
    ("u03", "space vector query vector"),
    ("u04", "pie chart query model"),
    ("u05", "totally unrelated words here"),
    ("u06", "apple vector pie space model"),
    ("u07", "crumble crumble cake chart"),
]

BITS = 6


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    df = (
        spark.createDataFrame(DOCS, "url string, text string")
        .withColumn("site", F.lit("s.example"))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    index = build_index(df, id_col="url", analyzer="tokens")
    cidx = compact_index(index, n_segments=4, postings_per_shard=64)
    out = str(tmp_path_factory.mktemp("impacts_artifact"))
    meta = write_impacts(cidx, out, bits=BITS)
    return index, cidx, out, meta


def test_meta_roundtrip_and_u_max(env):
    index, cidx, out, meta = env
    _, loaded = load_impacts(cidx.segments.sparkSession, out)
    assert loaded == meta
    assert meta["bits"] == BITS
    assert meta["id_col"] == "url"
    # metadata-derived u_max == the logical quantizer's decoded max
    _, u_max = quantize_postings(index, bits=BITS)
    assert meta["u_max"] == u_max


def test_artifact_q_matches_logical_quantization(env):
    index, cidx, out, _ = env
    spark = cidx.segments.sparkSession
    impacts, _ = load_impacts(spark, out)
    persisted = {
        (r["term"], r["url"]): r["q"]
        for r in impacts.join(
            cidx.doc_map.select("doc_id", "url"), "doc_id"
        ).collect()
    }
    quantized, _ = quantize_postings(index, bits=BITS)
    logical = {
        (r["term"], r["url"]): r["q"] for r in quantized.collect()
    }
    assert persisted == logical


@pytest.mark.parametrize(
    "query", ["apple pie", "vector space model", "crumble", "zzz absent"]
)
def test_persisted_topk_matches_logical(env, query):
    index, cidx, out, _ = env
    got = impact_topk_persisted(
        cidx, out, query, limit=8, analyzer="tokens",
        use_stoplist=False,
    ).collect()
    want = impact_topk(
        index, query, bits=BITS, limit=8, analyzer="tokens",
        use_stoplist=False,
    ).collect()
    if "zzz" not in query:
        assert got  # parity must not be vacuous
    assert [(r["url"], r["rn"]) for r in got] == [
        (r["url"], r["rn"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_persisted_min_impact_parity(env):
    index, cidx, out, _ = env
    got = impact_topk_persisted(
        cidx, out, "apple vector", limit=8, analyzer="tokens",
        use_stoplist=False, min_impact=3,
    ).collect()
    want = impact_topk(
        index, "apple vector", bits=BITS, limit=8, analyzer="tokens",
        use_stoplist=False, min_impact=3,
    ).collect()
    assert [(r["url"], r["rn"]) for r in got] == [
        (r["url"], r["rn"]) for r in want
    ]


def test_persisted_rescore_matches_logical(env):
    index, cidx, out, _ = env
    got = rescore_topk_persisted(
        cidx, out, "apple pie", first_k=8, limit=5,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    want = rescore_topk(
        index, "apple pie", first_k=8, limit=5, bits=BITS,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    assert got  # parity must not be vacuous
    assert [(r["url"], r["rn"]) for r in got] == [
        (r["url"], r["rn"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_persisted_rescore_scores_are_exact(env):
    """Second-pass scores must equal the exact BM25 search()."""
    from search_engine_spark.plans.search import search

    index, cidx, out, _ = env
    got = rescore_topk_persisted(
        cidx, out, "apple pie", first_k=8, limit=5,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    exact = {
        r["url"]: r["score"]
        for r in search(
            index, "apple pie", limit=8, analyzer="tokens",
            use_stoplist=False, candidates="union",
        ).collect()
    }
    for r in got:
        assert r["score"] == pytest.approx(exact[r["url"]], rel=1e-12)


def test_stale_artifact_refused(env):
    """An index whose stats drifted since write_impacts must refuse
    to use the artifact instead of silently mis-ranking."""
    from dataclasses import replace

    _, cidx, out, _ = env
    drifted = replace(cidx, avg_len=cidx.avg_len + 1.0)
    with pytest.raises(ValueError, match="stale impacts artifact"):
        impact_topk_persisted(
            drifted, out, "apple", analyzer="tokens",
            use_stoplist=False,
        )


def test_pagination_offset(env):
    _, cidx, out, _ = env
    full = impact_topk_persisted(
        cidx, out, "apple pie", limit=8, analyzer="tokens",
        use_stoplist=False,
    ).collect()
    page2 = impact_topk_persisted(
        cidx, out, "apple pie", limit=2, offset=2, analyzer="tokens",
        use_stoplist=False,
    ).collect()
    assert [r["url"] for r in page2] == [r["url"] for r in full[2:4]]
    assert [r["rn"] for r in page2] == [3, 4]
