"""PII detection/redaction, exact-n-gram decontamination, and TF-IDF
keyword extraction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.pii import annotate_pii
from search_engine_spark.operators.dedup import (
    contaminated_ids,
    decontaminate,
)
from search_engine_spark.operators.curation import tfidf_keywords


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


PII_DOCS = [
    (1, "contact alice@example.com or bob.smith+x@sub.domain.org now"),
    (2, "server at 10.0.255.3 and 192.168.1.1 went down"),
    (3, "ssn 123-45-6789 leaked with card 4111 1111 1111 1111"),
    (4, "call +1 555 0100 or 44-555-0123 for help"),
    (5, "perfectly clean document with no sensitive data"),
    (6, "not an ip 1234.5.6.7890 and not ssn 1234-56-7890"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, ["doc_id", "text"])


def test_pii_counts(spark, pii_df):
    rows = {
        r["doc_id"]: r
        for r in annotate_pii(pii_df).collect()
    }
    assert rows[1]["n_email"] == 2 and rows[1]["n_pii"] == 2
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_ssn"] == 1 and rows[3]["n_credit_card"] == 1
    assert rows[4]["n_phone"] == 2
    assert rows[5]["n_pii"] == 0
    # word-boundary guards: overly long digit runs don't match
    assert rows[6]["n_ipv4"] == 0 and rows[6]["n_ssn"] == 0


def test_pii_redaction(spark, pii_df):
    rows = {
        r["doc_id"]: r["redacted"]
        for r in annotate_pii(pii_df).collect()
    }
    assert rows[1] == "contact <EMAIL> or <EMAIL> now"
    assert rows[2] == "server at <IPV4> and <IPV4> went down"
    assert "<SSN>" in rows[3] and "<CREDIT_CARD>" in rows[3]
    assert "1111" not in rows[3] and "123-45" not in rows[3]
    assert rows[5] == PII_DOCS[4][1]  # clean text untouched


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _tok(df):
    return df.withColumn("tokens", F.split(F.col("text"), " "))


@pytest.fixture(scope="module")
def contam_corpus(spark):
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        # shares the full 10-token benchmark sentence
        (1, "prefix words " + bench_text + " suffix words"),
        # shares an 8-token window
        (2, "quick brown fox jumps over the lazy dog and more and more"),
        # shares only a 5-token window — NOT contaminated at n=8
        (3, "brown fox jumps over the completely different tail of words"),
        (4, "entirely unrelated content about spark shuffle partitions here"),
    ]
    bench = spark.createDataFrame(
        [(100, bench_text)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    return _tok(corpus), _tok(bench)


def test_contaminated_ids(spark, contam_corpus):
    corpus, bench = contam_corpus
    bad = sorted(
        r["doc_id"]
        for r in contaminated_ids(corpus, bench, n=8).collect()
    )
    assert bad == [1, 2]


def test_contaminated_ids_unhashed_matches_hashed(spark, contam_corpus):
    corpus, bench = contam_corpus
    a = sorted(
        r["doc_id"]
        for r in contaminated_ids(
            corpus, bench, n=8, hash_shingles=False
        ).collect()
    )
    assert a == [1, 2]


def test_decontaminate(spark, contam_corpus):
    corpus, bench = contam_corpus
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()
    )
    assert kept == [3, 4]


# ---------------------------------------------------------------------------
# tf-idf keywords
# ---------------------------------------------------------------------------


def test_tfidf_keywords(spark):
    docs = [
        (1, "apple apple banana cherry"),
        (2, "banana banana banana date"),
        (3, "cherry date elder elder elder"),
    ]
    df = _tok(spark.createDataFrame(docs, ["doc_id", "text"]))
    out = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r["rank"])

    # idf: appears-in-1-doc = ln(4/2)+1; in-2-docs = ln(4/3)+1
    idf1 = math.log(4 / 2) + 1
    idf2 = math.log(4 / 3) + 1
    assert [r["term"] for r in by_doc[1]] == ["apple", "banana"]
    assert by_doc[1][0]["score"] == pytest.approx(2 * idf1, abs=1e-6)
    assert by_doc[1][1]["score"] == pytest.approx(1 * idf2, abs=1e-6)
    assert [r["term"] for r in by_doc[2]] == ["banana", "date"]
    assert by_doc[2][0]["score"] == pytest.approx(3 * idf2, abs=1e-6)
    # doc 3: elder (3 * idf1) then cherry/date tie (1 * idf2) -> cherry
    assert [r["term"] for r in by_doc[3]] == ["elder", "cherry"]
    assert all(r["rank"] <= 2 for r in out)


def test_tfidf_keywords_rank_deterministic(spark):
    # all-tie document: alphabetical order breaks ties
    df = _tok(
        spark.createDataFrame([(1, "zeta alpha mid")], ["doc_id", "text"])
    )
    out = tfidf_keywords(df, k=3).orderBy("rank").collect()
    assert [r["term"] for r in out] == ["alpha", "mid", "zeta"]


# ---------------------------------------------------------------------------
# semantic (embedding-cosine) decontamination
# ---------------------------------------------------------------------------


import numpy as np

from search_engine_spark.operators.dedup import (
    semantic_contaminated_ids,
    semantic_decontaminate,
)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def sem_fixture(spark):
    rng = np.random.default_rng(5)
    dim = 16
    bench = rng.normal(size=(5, dim))
    corpus = []
    # 40 random docs (far from bench w.h.p.), 6 planted paraphrases:
    # small perturbations of bench rows -> cosine ~0.99
    for i in range(40):
        corpus.append((i, rng.normal(size=dim)))
    for j in range(6):
        base = bench[j % 5]
        corpus.append((100 + j, base + 0.05 * rng.normal(size=dim)))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in corpus],
        "doc_id long, embedding array<float>",
    )
    bench_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(bench)],
        "bench_id long, embedding array<float>",
    )
    return emb, bench_df, corpus, bench


def _brute_contaminated(corpus, bench, thr):
    out = set()
    for i, v in corpus:
        for b in bench:
            sim = round(float(_unit(v) @ _unit(b)), 6)
            if sim >= thr:
                out.add(i)
                break
    return out


def test_semantic_contaminated_exact_matches_bruteforce(sem_fixture):
    emb, bench_df, corpus, bench = sem_fixture
    thr = 0.9
    want = _brute_contaminated(corpus, bench, thr)
    got = {
        r["doc_id"]
        for r in semantic_contaminated_ids(
            emb, bench_df, threshold=thr
        ).collect()
    }
    assert got == want
    assert {100 + j for j in range(6)} <= got  # planted all caught


def test_semantic_lsh_subset_of_exact_and_catches_planted(sem_fixture):
    emb, bench_df, corpus, bench = sem_fixture
    thr = 0.9
    exact = {
        r["doc_id"]
        for r in semantic_contaminated_ids(
            emb, bench_df, threshold=thr
        ).collect()
    }
    lsh = {
        r["doc_id"]
        for r in semantic_contaminated_ids(
            emb, bench_df, threshold=thr, method="lsh",
            n_planes=4, n_tables=8,
        ).collect()
    }
    assert lsh <= exact
    # planted near-identical vectors collide in >=1 of 8 tables w.h.p.
    assert len(lsh & {100 + j for j in range(6)}) >= 5


def test_semantic_decontaminate_keeps_unembedded_docs(
    spark, sem_fixture
):
    emb, bench_df, corpus, _ = sem_fixture
    ids = [i for i, _ in corpus] + [999]  # 999 has no embedding row
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in semantic_decontaminate(
            docs, emb, bench_df, threshold=0.9
        ).collect()
    }
    assert 999 in kept
    assert not (kept & {100 + j for j in range(6)})


def test_semantic_method_validation(sem_fixture):
    emb, bench_df, _, _ = sem_fixture
    with pytest.raises(ValueError):
        semantic_contaminated_ids(emb, bench_df, method="nope")
