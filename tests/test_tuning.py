"""BM25 grid tuning: per-combo parity with search_many + rank_eval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.eval import rank_eval
from search_engine_spark.plans.search import search_many
from search_engine_spark.plans.tuning import bm25_grid_scores, tune_bm25
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = ["crystal falcon nebula", "harbor lantern marble",
           "meadow orchid quartz"]
GRID = [(1.5, 0.75), (1.2, 0.75), (0.9, 0.4)]  # combo 0 = engine default


@pytest.fixture(scope="module")
def idx(spark):
    i = build_index(
        enrich_pages(pages_df(spark, 250, n_sites=4, seed=7,
                              n_partitions=8))
    )
    i.postings.cache().count()
    return i


@pytest.fixture(scope="module")
def qrels(spark, idx):
    # deterministic graded judgments: rel = url length % 3 over each
    # query's exact top-20 pool (some rel-0 rows exercise filtering)
    rows = []
    pool = search_many(idx, QUERIES, limit=20)
    for r in pool.collect():
        rows.append((r["query_id"], r["url"], len(r["url"]) % 3))
    return spark.createDataFrame(rows, "query_id int, url string, rel int")


def test_default_combo_matches_search_many(spark, idx):
    got = {
        (r["query_id"], r["rn"]): (r["url"], round(r["score"], 9))
        for r in bm25_grid_scores(idx, QUERIES, GRID, k=10).collect()
        if r["combo"] == 0
    }
    want = {
        (r["query_id"], r["rn"]): (r["url"], round(r["score"], 9))
        for r in search_many(idx, QUERIES, limit=10).collect()
    }
    assert got == want


def test_combos_change_scores(spark, idx):
    rows = bm25_grid_scores(idx, QUERIES, GRID, k=10).collect()
    by_combo = {}
    for r in rows:
        by_combo.setdefault(r["combo"], {})[
            (r["query_id"], r["url"])
        ] = round(r["score"], 9)
    shared = set(by_combo[0]) & set(by_combo[2])
    assert shared
    assert any(by_combo[0][k] != by_combo[2][k] for k in shared)


def test_tune_matches_per_combo_rank_eval(spark, idx, qrels):
    got = {
        r["combo"]: (r["mrr"], r["ndcg"], r["recall"])
        for r in tune_bm25(idx, QUERIES, qrels, GRID, k=10).collect()
    }
    assert set(got) == {0, 1, 2}
    # combo 0 must equal rank_eval over the plain search_many run
    run = search_many(idx, QUERIES, limit=10).select(
        "query_id", "url", "rn"
    )
    ev = rank_eval(run, qrels, k=10, query_col="query_id",
                   id_col="url").collect()
    mrr = round(sum(r["rr"] for r in ev) / len(ev), 6)
    ndcg = round(sum(r["ndcg"] for r in ev) / len(ev), 6)
    rec = round(sum(r["recall"] for r in ev) / len(ev), 6)
    assert got[0] == pytest.approx((mrr, ndcg, rec), abs=1e-9)
