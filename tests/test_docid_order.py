"""Locality-aware docID assignment (compact.assign_doc_ids
order="site"): search is id-permutation-invariant, and posting
blocks shrink on a site-correlated corpus (Silvestri 2007)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.compact import (
    assign_doc_ids,
    compact_index,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.pages import enrich_pages

# site-correlated corpus: each site mostly uses its own vocabulary
# slice (the regime where URL/site-local ids shrink delta gaps)
_SITE_VOCAB = {
    0: ["amber", "bronze", "cedar", "dune", "ember"],
    1: ["fjord", "grove", "heath", "islet", "jetty"],
    2: ["knoll", "lagoon", "mesa", "nook", "oasis"],
}
_SHARED = ["common", "words", "everyone", "uses"]


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        site = i % 3
        voc = _SITE_VOCAB[site]
        words = []
        for j in range(30):
            pool = voc if (i + j) % 10 else _SHARED
            words.append(pool[(i * 7 + j) % len(pool)])
        rows.append(
            (
                f"https://site{site:02d}.example/p{i:04d}",
                f"site{site:02d}.example",
                " ".join(words) + ".",
                "english",
            )
        )
    return spark.createDataFrame(
        rows, "url string, site string, text string, lang string"
    )


@pytest.fixture(scope="module")
def idx(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col, tokens_col,
    )

    df = (
        _corpus(spark)
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, analyzer="tokens")


def _encoded_bytes(cidx) -> int:
    return (
        cidx.segments.select(
            (
                F.octet_length("doc_ids")
                + F.octet_length("tfs")
                + F.octet_length("doc_lens")
            ).alias("b")
        )
        .agg(F.sum("b"))
        .collect()[0][0]
    )


def test_site_order_groups_sites_contiguously(idx):
    dm = assign_doc_ids(
        idx.doc_lens, "url", n_segments=8, order="site"
    ).collect()
    by_site = {}
    for r in dm:
        by_site.setdefault(r["site"], []).append(r["doc_id"])
    # each site's ids form one contiguous run
    for ids in by_site.values():
        ids = sorted(ids)
        assert ids[-1] - ids[0] == len(ids) - 1


def test_search_results_id_order_invariant(idx):
    ch = compact_index(idx, n_segments=8, id_order="hash")
    cs = compact_index(idx, n_segments=8, id_order="site")
    for q in ("amber common", "fjord jetty", "lagoon uses words"):
        a = [
            (r["url"], r["score"], r["rn"])
            for r in search_compact(
                ch, q, analyzer="tokens", limit=10, use_stoplist=False
            ).collect()
        ]
        b = [
            (r["url"], r["score"], r["rn"])
            for r in search_compact(
                cs, q, analyzer="tokens", limit=10, use_stoplist=False
            ).collect()
        ]
        assert a == b and a


def test_site_order_shrinks_blocks_on_correlated_corpus(idx):
    hash_bytes = _encoded_bytes(
        compact_index(idx, n_segments=8, id_order="hash")
    )
    site_bytes = _encoded_bytes(
        compact_index(idx, n_segments=8, id_order="site")
    )
    # site-local vocabulary → smaller gaps → strictly smaller index
    assert site_bytes < hash_bytes


def test_order_site_requires_site_column(spark):
    df = spark.createDataFrame(
        [("u1", 3)], "url string, doc_len int"
    )
    with pytest.raises(ValueError):
        assign_doc_ids(df, "url", order="site")
