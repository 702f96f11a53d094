"""Deterministic synthetic web-pages corpus (FIXTURES.md §1).

Common-Crawl-style rows ``(url, warc_ts, html, text, lang)`` per
``BASELINE.json`` input_hint.  Generated *text-first*: the html column
is rendered FROM the text column, so ``extract_text(html) == text``
holds byte-identically (the per-row invariant).  Fixed seed, no wall
clock, no network — bit-identical corpora everywhere.

Vocabulary is Zipf-distributed over inflected variants of a lemma-stem
pool, so head terms (skew), mid terms and rare terms all occur and the
lemmatizer is genuinely exercised.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

from search_engine_spark.functions.lemmatizer import EN_PARTICLES

_EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)

# Stem pool: content words.  Inflections exercise the suffix rules.
_STEMS = [
    "spark", "query", "index", "search", "engine", "page", "site",
    "crawl", "lemma", "token", "score", "rank", "shard", "merge",
    "batch", "cache", "table", "column", "filter", "join", "group",
    "sort", "limit", "count", "build", "read", "write", "scan",
    "block", "term", "document", "vector", "hash", "salt", "skew",
    "partition", "cluster", "executor", "driver", "memory", "disk",
    "network", "latency", "throughput", "compress", "encode", "decode",
    "stream", "window", "state", "checkpoint", "manifest", "resume",
    "snippet", "title", "text", "word", "sentence", "language",
    "crystal", "meadow", "falcon", "harbor", "lantern", "marble",
    "nebula", "orchid", "prairie", "quartz", "raven", "sapphire",
    "thunder", "velvet", "willow", "zephyr", "amber", "breeze",
    "canyon", "dune", "ember", "fjord", "glacier", "horizon",
]

_INFLECT = ["", "s", "ing", "ed"]

# A few particles sprinkled in so the particle filter is exercised.
_PARTICLE_POOL = sorted(EN_PARTICLES)[:24]


def _vocab() -> list[str]:
    words = []
    for stem in _STEMS:
        for suf in _INFLECT:
            words.append(stem + suf)
    return words


def generate_pages_pdf(
    n_pages: int,
    n_sites: int = 4,
    seed: int = 42,
    lang: str = "english",
) -> pd.DataFrame:
    """Pandas DataFrame of synthetic pages (deterministic)."""
    rng = random.Random(seed)
    vocab = _vocab()
    n_vocab = len(vocab)
    # Zipf-ish weights over the vocab (rank^-1.1)
    weights = [1.0 / (i + 1) ** 1.1 for i in range(n_vocab)]
    path_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                  "eta", "theta", "iota", "kappa"]

    rows = []
    seen_urls = set()
    for i in range(n_pages):
        site = i % n_sites
        depth = rng.randint(1, 3)
        path = "/".join(rng.choice(path_words) for _ in range(depth))
        url = f"https://site{site:02d}.example/{path}/p{i}"
        if url in seen_urls:  # paths are random; suffix i keeps unique
            url = url + f"-{i}"
        seen_urls.add(url)

        n_sentences = rng.randint(5, 40)
        sentences = []
        for _ in range(n_sentences):
            n_words = rng.randint(4, 12)
            words = []
            for w in range(n_words):
                if rng.random() < 0.15:
                    words.append(rng.choice(_PARTICLE_POOL))
                else:
                    words.append(rng.choices(vocab, weights=weights)[0])
            sentences.append(" ".join(words) + ".")
        text = " ".join(sentences)
        title = " ".join(sentences[0].split()[:4]).rstrip(".")
        body = "".join(f"<p>{s}</p>" for s in sentences)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body>{body}</body></html>"
        ).encode("utf-8")
        # NB: extract_text normalizes inter-tag whitespace to single
        # spaces; body text round-trips because sentences are joined
        # with single spaces in both renderings.
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + dt.timedelta(seconds=i),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def generate_page_row(
    i: int,
    n_sites: int,
    seed: int,
    vocab: list[str],
    cum_weights: list[float],
    lang: str = "english",
) -> dict:
    """One synthetic page, seeded by (seed, page index) alone — the
    same row regardless of which partition/worker generates it.
    ``cum_weights`` are CUMULATIVE Zipf weights (random.choices
    rebuilds the cumulative array on every call otherwise — the
    dominant generation cost at corpus scale)."""
    rng = random.Random((seed << 32) ^ i)
    path_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                  "eta", "theta", "iota", "kappa"]
    site = i % n_sites
    depth = rng.randint(1, 3)
    path = "/".join(rng.choice(path_words) for _ in range(depth))
    url = f"https://site{site:02d}.example/{path}/p{i}"
    n_sentences = rng.randint(5, 40)
    sentences = []
    for _ in range(n_sentences):
        n_words = rng.randint(4, 12)
        words = [
            rng.choice(_PARTICLE_POOL)
            if rng.random() < 0.15
            else rng.choices(vocab, cum_weights=cum_weights)[0]
            for _ in range(n_words)
        ]
        sentences.append(" ".join(words) + ".")
    text = " ".join(sentences)
    title = " ".join(sentences[0].split()[:4]).rstrip(".")
    body = "".join(f"<p>{s}</p>" for s in sentences)
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


def pages_df_dist(spark, n_pages: int, n_sites: int = 8, seed: int = 42,
                  n_partitions: int | None = None):
    """Distributed deterministic corpus: generation runs on executors
    via ``mapInPandas`` over a page-id range, seeded per page id —
    partitioning-independent content, scales to millions of pages
    (the driver-side :func:`pages_df` is for small test corpora)."""
    import itertools

    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T

    vocab = _vocab()
    weights = list(
        itertools.accumulate(
            1.0 / (i + 1) ** 1.1 for i in range(len(vocab))
        )
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = [
                generate_page_row(int(i), n_sites, seed, vocab, weights)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    parts = n_partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n_pages, 1, parts).mapInPandas(gen, schema)


def pages_df(spark, n_pages: int, n_sites: int = 4, seed: int = 42,
             n_partitions: int | None = None):
    """Spark DataFrame of synthetic pages with the input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    pdf = generate_pages_pdf(n_pages, n_sites=n_sites, seed=seed)
    df = spark.createDataFrame(pdf, schema=schema)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df
