"""Curation operators vs brute-force Python on a hand-built corpus."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    GATE_MIN_STOPWORDS,
    GATE_MIN_TOKENS,
    SPLIT_BUCKETS,
    assign_split,
    gopher_gate,
    gopher_metrics,
    ngram_repetition,
    unigram_logprob,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog near the quick brown fox",
    "spam spam spam spam spam spam spam spam",
    "a b",
    "",
    "one two three four five six seven eight nine ten",
    "x",
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(
        [(i, t, t.split()) for i, t in enumerate(rows)],
        "doc_id long, text string, tokens array<string>",
    )


def _brute_rep(tokens: list[str], n: int) -> tuple[float, float]:
    grams = [
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    ]
    if not grams or not tokens:
        return 0.0, 0.0
    c = Counter(grams)
    top = max(c.values()) * n / len(tokens)
    dup = sum(v for v in c.values() if v > 1) * n / len(tokens)
    return round(min(top, 1.0), 6), round(min(dup, 1.0), 6)


def test_ngram_repetition_vs_brute(spark):
    for n in (1, 2, 3):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["top_ngram_frac"],
                r["dup_ngram_frac"],
            )
            for r in ngram_repetition(_docs(spark), n=n).collect()
        }
        for i, t in enumerate(CORPUS):
            toks = t.split()
            top, dup = _brute_rep(toks, n)
            assert got[i] == (len(toks), top, dup), (n, i, got[i])


def test_repetition_extremes(spark):
    # all-identical doc: the repeated bigram covers everything
    rows = ["w " * 50]
    r = ngram_repetition(_docs(spark, rows), n=2).collect()[0]
    assert r["top_ngram_frac"] == 1.0 and r["dup_ngram_frac"] == 1.0


def test_gopher_metrics_and_gate(spark):
    rows = [
        # kept: long, prosey, has stopwords, varied
        "the cat sat on a mat and then the dog ran to the park while "
        "a bird flew over the quiet green field during one fine day "
        "more words follow here to pass the minimum length easily now",
        # dropped: no stopwords at all
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega alef bet gimel dalet he vav zayin het tet yod",
        # dropped: too short
        "the tiny one",
        # dropped: pure repetition
        ("the spam " * 40).strip(),
    ]
    m = {
        r["doc_id"]: r for r in gopher_gate(_docs(spark, rows)).collect()
    }
    assert m[0]["keep"] is True
    assert m[1]["keep"] is False and m[1]["n_stopwords"] < GATE_MIN_STOPWORDS
    assert m[2]["keep"] is False and m[2]["n_tokens"] < GATE_MIN_TOKENS
    assert m[3]["keep"] is False and m[3]["top_2gram_frac"] > 0.2
    # metrics agree with brute force on doc 3
    toks = rows[3].split()
    top2, _ = _brute_rep(toks, 2)
    _, dup3 = _brute_rep(toks, 3)
    assert m[3]["top_2gram_frac"] == top2
    assert m[3]["dup_3gram_frac"] == dup3


def test_gopher_metrics_symbol_ratio(spark):
    rows = ["@@@@ #### $$$$ %%%% the cat sat"]
    r = gopher_metrics(_docs(spark, rows)).collect()[0]
    brute = sum(
        1 for ch in rows[0] if not (ch.isalnum() or ch.isspace())
    ) / len(rows[0])
    assert abs(r["symbol_ratio"] - brute) < 1e-6


def test_unigram_logprob_vs_brute(spark):
    res = {
        r["doc_id"]: r for r in unigram_logprob(_docs(spark)).collect()
    }
    alltok = [t for row in CORPUS for t in row.split()]
    tf = Counter(alltok)
    total = len(alltok)
    for i, t in enumerate(CORPUS):
        toks = t.split()
        if not toks:
            assert i not in res
            continue
        nll = sum(-math.log(tf[x] / total) for x in toks) / len(toks)
        assert res[i]["n_tokens"] == len(toks)
        assert abs(res[i]["nll"] - nll) < 1e-5
        assert abs(res[i]["ppl"] - math.exp(nll)) < 1e-4


def test_unigram_logprob_unbroadcast_path(spark):
    a = unigram_logprob(_docs(spark)).collect()
    b = unigram_logprob(_docs(spark), broadcast_threshold=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_assign_split_deterministic_and_proportional(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = assign_split(df, train=0.8, val=0.1).cache()
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = 20_000
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    # stable across runs, matches driver-side md5 arithmetic
    sample = out.filter(F.col("doc_id") < 50).collect()
    for r in sample:
        h = hashlib.md5(f"{r['doc_id']}v1".encode()).hexdigest()
        b = int(h[17:32], 16) % SPLIT_BUCKETS
        want = (
            "train" if b < 8000 else "val" if b < 9000 else "test"
        )
        assert r["split"] == want
    # a different salt reshuffles assignments
    out2 = assign_split(df, train=0.8, val=0.1, salt="v2")
    joined = out.select("doc_id", "split").join(
        out2.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    diff = joined.filter(F.col("split") != F.col("s2")).count()
    assert diff > 1000


def test_stratified_sample_deterministic_and_rates(spark):
    from search_engine_spark.operators.curation import (
        split_bucket_col,
        stratified_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(
        df, {"en": 0.5, "de": 0.1}, default_fraction=0.0, salt="s1"
    )
    rows = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in rows}
    # md5 buckets: expect ~1000 en (of 2000) and ~200 de (of 2000)
    assert 850 <= counts["en"] <= 1150
    assert 140 <= counts["de"] <= 260
    # deterministic: same salt = identical membership, on any layout
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7), {"en": 0.5, "de": 0.1},
            default_fraction=0.0, salt="s1",
        ).collect()
    )
    assert a == b
    # fresh salt = a different draw
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, {"en": 0.5, "de": 0.1}, default_fraction=0.0, salt="s2"
        ).collect()
    )
    assert a != c
    # membership is exactly the bucket rule
    expect = sorted(
        r["doc_id"]
        for r in df.withColumn(
            "b", split_bucket_col(F.col("doc_id"), "s1")
        )
        .filter(
            (
                (F.col("lang") == "en") & (F.col("b") < 5000)
            ) | ((F.col("lang") == "de") & (F.col("b") < 1000))
        )
        .collect()
    )
    assert a == expect


def test_filter_urls(spark):
    from search_engine_spark.operators.curation import filter_urls

    rows = [
        (1, "https://good.example/page1"),
        (2, "https://spam.example/page2"),
        (3, "https://sub.spam.example/page3"),     # subdomain of deny
        (4, "https://notspam.example/page4"),      # NOT a subdomain
        (5, "https://good.example/tracker/pixel"),  # pattern deny
        (6, "http://other.example/page6"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(
        r["doc_id"]
        for r in filter_urls(
            df,
            deny_hosts=["spam.example"],
            deny_patterns=[r".*/tracker/.*"],
        ).collect()
    )
    assert kept == [1, 4, 6]
    only = sorted(
        r["doc_id"]
        for r in filter_urls(
            df, allow_hosts=["good.example"],
            deny_patterns=[r".*/tracker/.*"],
        ).collect()
    )
    assert only == [1]


def test_sample_n_per_group(spark):
    from search_engine_spark.operators.curation import sample_n_per_group
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
    )
    out = sample_n_per_group(df, 10, "source", "doc_id", salt="a")
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    assert all(c == 10 for c in counts.values()) and len(counts) == 7
    # small group: keeps everything
    small = df.filter(F.col("doc_id") < 5)
    assert sample_n_per_group(small, 10, "source", "doc_id").count() == 5
    # deterministic + partitioning-invariant
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_n_per_group(
            df.repartition(11), 10, "source", "doc_id", salt="a"
        ).collect()
    )
    assert a == b
    # different salt: different draw
    c = sorted(
        r["doc_id"]
        for r in sample_n_per_group(
            df, 10, "source", "doc_id", salt="b"
        ).collect()
    )
    assert a != c
    # prefiltered two-phase path agrees with the exact path here
    d = sorted(
        r["doc_id"]
        for r in sample_n_per_group(
            df, 10, "source", "doc_id", salt="a", prefilter_factor=6.0
        ).collect()
    )
    assert d == a


def test_canonical_url_col(spark):
    from search_engine_spark.operators.curation import (
        canonical_url_col,
        canonicalize_urls,
    )

    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&b=2&a=1"
         "&fbclid=z#frag", "https://example.com/a/b?a=1&b=2"),
        ("http://example.com.:80/path/", "http://example.com/path"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com/?", "https://example.com"),
        ("https://example.com/a?z=1&y=2&UTM_CAMPAIGN=q&ref=tw",
         "https://example.com/a?y=2&z=1"),
        ("https://example.com/a?y=&x=1", "https://example.com/a?x=1&y="),
        # non-http(s) / malformed pass through trimmed
        ("ftp://example.com/x", "ftp://example.com/x"),
        ("  not a url  ", "not a url"),
        # path case preserved; only host is lowercased
        ("HTTP://Sub.Example.com/KeepCase//x/", "http://sub.example.com/KeepCase/x"),
        # :8080 is NOT a default port — kept
        ("http://example.com:8080/a", "http://example.com:8080/a"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", canonical_url_col(F.col("url")).alias("canon")
        ).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)

    # idempotence: canonicalizing a canonical URL is a no-op
    canon_df = canonicalize_urls(df)
    twice = canonicalize_urls(
        canon_df.select(F.col("canonical_url").alias("url"))
    )
    pairs = twice.collect()
    assert all(r["url"] == r["canonical_url"] for r in pairs)

    # strip_www=False keeps the www
    keep = df.select(
        canonical_url_col(F.col("url"), strip_www=False).alias("c")
    ).collect()
    assert any(c["c"].startswith("https://www.example.com") for c in keep)
