"""Byte-identity of the JVM (Catalyst) lemmatizer with the normative
Python lemmatizer — golden words, adversarial fuzz over the token
alphabets, and whole-corpus postings equality against the Arrow
analyzer path."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.lemma_sql import (
    lemma_col,
    lemma_dict,
    lemma_postings_sql,
    lang_class_col,
)
from search_engine_spark.functions.lemmatizer import lemmatize


def _sql_lemmas(spark, words: list[str], lang: str) -> list[str]:
    df = spark.createDataFrame(
        [(w, lang) for w in words], "token string, lang string"
    )
    df = df.withColumn("lc", lang_class_col(F.col("lang")))
    out = (
        df.join(
            F.broadcast(lemma_dict(spark)), ["lc", "token"], "left"
        )
        .select(
            "token",
            lemma_col(
                F.col("token"), F.col("lc"), F.col("dlemma")
            ).alias("lemma"),
        )
        .collect()
    )
    got = {r["token"]: r["lemma"] for r in out}
    return [got[w] for w in words]


GOLDEN_EN = [
    # particles / exceptions / single letters
    "the", "of", "was", "children", "queries", "a", "x", "yes",
    # each suffix rule + fixups
    "classes", "glasses", "churches", "wishes", "boxes", "prizes",
    "cities", "darkness", "class", "running", "stopped", "making",
    "used", "cats", "kings", "sing", "ring", "red", "bed", "ness",
    "sses", "pass", "as", "is", "gas", "useless", "miss", "misses",
    "swimming", "begging", "rolling", "fizzing", "rowing", "boxing",
    "playing", "dying", "seeing", "feed", "speed", "need", "freed",
    "agreed", "tied", "lied",
]

GOLDEN_RU = [
    "люди", "шла", "в", "и", "книгами", "домами", "синего",
    "столом", "окнах", "я", "дом", "дома", "домов", "ами",
]


def test_golden_en(spark):
    want = [lemmatize(w, "english") for w in GOLDEN_EN]
    assert _sql_lemmas(spark, GOLDEN_EN, "english") == want


def test_golden_ru(spark):
    want = [lemmatize(w, "russian") for w in GOLDEN_RU]
    assert _sql_lemmas(spark, GOLDEN_RU, "russian") == want


def test_fuzz_en(spark):
    rng = random.Random(13)
    words = sorted(
        {
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randrange(1, 14))
            )
            for _ in range(3000)
        }
    )
    # bias the tail toward rule-triggering shapes
    words += [w + sfx for w in words[:300]
              for sfx in ("s", "es", "ed", "ing", "ies", "ness")]
    want = [lemmatize(w, "english") for w in words]
    assert _sql_lemmas(spark, words, "english") == want


def test_fuzz_ru(spark):
    rng = random.Random(17)
    alphabet = "абвгдежзиклмнопрстуфхцчшщыьэюя"
    words = sorted(
        {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randrange(1, 12))
            )
            for _ in range(2000)
        }
    )
    words += [w + sfx for w in words[:200]
              for sfx in ("ами", "ого", "ом", "ы", "е", "ях")]
    want = [lemmatize(w, "russian") for w in words]
    assert _sql_lemmas(spark, words, "russian") == want


@pytest.mark.parametrize("mode", ["fused_arrow", "tokens_udf"])
def test_corpus_postings_identical(spark, mode):
    """Whole-pipeline equality: the JVM postings of the fixture
    corpus match the Arrow-fused and the tokens+pandas-UDF analyzer
    paths row-for-row (term, url, tf)."""
    from search_engine_spark.operators.postings import build_postings
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    pages = pages_df(spark, 250, n_sites=4, seed=42)
    jvm = enrich_pages(pages, compute_tokens=True)
    got = {
        (r["term"], r["url"], r["tf"])
        for r in lemma_postings_sql(jvm, "url").collect()
    }
    if mode == "fused_arrow":
        ref_src = enrich_pages(pages, compute_tokens=False)
        ref = build_postings(ref_src, "url", analyzer="lemma")
    else:
        from search_engine_spark.functions.textproc import (
            lemma_counts_udf,
        )

        ref = jvm.select(
            "url",
            F.explode(
                lemma_counts_udf(F.col("tokens"), F.col("lang"))
            ).alias("tc"),
        ).select(
            F.col("tc.term").alias("term"), "url",
            F.col("tc.tf").alias("tf"),
        )
    want = {(r["term"], r["url"], r["tf"]) for r in ref.collect()}
    assert got == want
