"""Compact-index twins of the synonym / LM / prefix rankers are
rank-identical to their logical executors (same analysis, same
scoring expressions, decode restricted to the query terms)."""

from __future__ import annotations

from dataclasses import replace

import pytest

from search_engine_spark.operators.compact import compact_index
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.lm import search_lm, search_lm_compact
from search_engine_spark.plans.prefix import (
    search_prefix,
    search_prefix_compact,
)
from search_engine_spark.plans.synonyms import (
    search_synonyms,
    search_synonyms_compact,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def idx(spark):
    docs = enrich_pages(
        pages_df(spark, 200, n_sites=4, seed=42)
    )
    return build_index(docs, id_col="url", analyzer="tokens")


@pytest.fixture(scope="module")
def cidx(idx):
    renamed = replace(
        idx,
        postings=idx.postings.withColumnRenamed("url", "nat_id"),
        doc_lens=idx.doc_lens.withColumnRenamed("url", "nat_id"),
        id_col="nat_id",
        cached=(),
    )
    return compact_index(renamed, n_segments=4)


def _rows(df, id_col):
    return [
        (r[id_col], round(r["score"], 9), r["rn"])
        for r in df.collect()
    ]


def test_synonyms_compact_rank_identity(idx, cidx):
    syn = {"crystal": ["quartz"], "meadow": ["prairie"]}
    a = _rows(
        search_synonyms(
            idx, "crystal meadow", synonyms=syn, limit=25,
            analyzer="tokens",
        ),
        "url",
    )
    b = _rows(
        search_synonyms_compact(
            cidx, "crystal meadow", synonyms=syn, limit=25,
            analyzer="tokens",
        ),
        "nat_id",
    )
    assert a == b and len(a) > 0


def test_lm_compact_rank_identity(idx, cidx):
    a = _rows(
        search_lm(
            idx, "crystal falcon", mu=500.0, limit=25,
            analyzer="tokens",
        ),
        "url",
    )
    b = _rows(
        search_lm_compact(
            cidx, "crystal falcon", mu=500.0, limit=25,
            analyzer="tokens",
        ),
        "nat_id",
    )
    assert a == b and len(a) > 0


def test_lm_jm_compact_rank_identity(idx, cidx):
    a = _rows(
        search_lm(
            idx, "crystal falcon", smoothing="jm", lam=0.3, limit=25,
            analyzer="tokens",
        ),
        "url",
    )
    b = _rows(
        search_lm_compact(
            cidx, "crystal falcon", smoothing="jm", lam=0.3, limit=25,
            analyzer="tokens",
        ),
        "nat_id",
    )
    assert a == b and len(a) > 0


def test_prefix_compact_rank_identity(idx, cidx):
    a = _rows(
        search_prefix(
            idx, "token* lemma", limit=25, analyzer="tokens"
        ),
        "url",
    )
    b = _rows(
        search_prefix_compact(
            cidx, "token* lemma", limit=25, analyzer="tokens"
        ),
        "nat_id",
    )
    assert a == b and len(a) > 0


def test_compact_rankers_empty_queries(cidx):
    assert search_lm_compact(cidx, "", analyzer="tokens").count() == 0
    assert (
        search_prefix_compact(
            cidx, "zzznope*", analyzer="tokens"
        ).count()
        == 0
    )
    assert (
        search_synonyms_compact(
            cidx, "zzzunknown", analyzer="tokens"
        ).count()
        == 0
    )
