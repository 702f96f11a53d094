"""Dedup operator invariants: vectorized SimHash identity vs the
definitional per-token algorithm, exactness of the banded SimHash
pair join, the n-gram hot-shingle guard, MinHash estimate fidelity —
plus the S2 link-extraction surface and the R26 status-code guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    _token_hash64,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_table,
)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _ref_simhash(toks) -> int:
    """Definitional per-token SimHash (the spec the vectorized UDF
    must reproduce bit-for-bit)."""
    if toks is None or len(toks) == 0:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in toks:
        h = _token_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    bitvec = (acc > 0).astype(np.uint64)
    packed = np.bitwise_or.reduce(
        bitvec << np.arange(64, dtype=np.uint64)
    )
    return int(packed.astype(np.int64))


@pytest.fixture(scope="module")
def token_docs(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i:02d}" for i in range(40)]
    base = [str(w) for w in rng.choice(vocab, size=60)]
    rows = [(0, base), (1, list(base))]  # exact dup -> hamming 0
    near = list(base)
    near[3], near[7] = "xaltered", "yaltered"  # near dup
    rows.append((2, near))
    for i in range(3, 30):
        rows.append(
            (i, [str(w) for w in rng.choice(vocab,
                                            size=int(rng.integers(5, 80)))])
        )
    rows += [(100, []), (101, None)]
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    ).cache()


def test_simhash_vectorized_matches_definitional(spark, token_docs):
    toks = {r["doc_id"]: r["tokens"] for r in token_docs.collect()}
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_table(token_docs).collect()
    }
    assert got == {d: _ref_simhash(t) for d, t in toks.items()}


def test_simhash_banded_pairs_are_exact(spark, token_docs):
    """max_hamming < bands ⇒ the banded join finds EVERY pair within
    the Hamming radius (pigeonhole) — compare against brute force over
    all signature pairs."""
    sigs = {
        r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
        for r in simhash_table(token_docs).collect()
    }
    max_h = 3

    def hamming(a, b):
        return int(bin(int(a) ^ int(b)).count("1"))

    ids = sorted(sigs)
    want = {
        (a, b, hamming(sigs[a], sigs[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if hamming(sigs[a], sigs[b]) <= max_h
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs(
            token_docs, bands=4, max_hamming=max_h
        ).collect()
    }
    assert got == want
    assert (0, 1, 0) in got  # the exact dup pair
    assert len(got) >= 2     # ...and the empty/null signature pair


def test_simhash_banded_rejects_unsound_params(spark, token_docs):
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(token_docs, bands=4, max_hamming=4)


# ---------------------------------------------------------------------------
# n-gram Jaccard hot-shingle guard
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """30 docs sharing a boilerplate run (a hot shingle) + 2 true
    near-dups that also share unique content."""
    rng = np.random.default_rng(23)
    vocab = [f"tok{i:02d}" for i in range(60)]
    boiler = ["all", "rights", "reserved"]
    rows = []
    for i in range(30):
        body = [str(w) for w in rng.choice(vocab, size=12)]
        rows.append((i, body + boiler))
    # a genuine near-dup pair with >0.5 jaccard on non-boiler content
    shared = [str(w) for w in rng.choice(vocab, size=20, replace=False)]
    rows.append((100, shared + boiler))
    rows.append((101, shared[:18] + ["zz", "qq"] + boiler))
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    ).cache()


def _shingle_set(toks, n=3):
    return {
        " ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)
    }


def test_jaccard_guard_matches_manual_reduced_sets(spark, boilerplate_docs):
    """With the guard on, pair jaccard equals the manual computation
    over shingle sets MINUS the hot shingles."""
    toks = {r["doc_id"]: list(r["tokens"])
            for r in boilerplate_docs.collect()}
    sets = {d: _shingle_set(t) for d, t in toks.items()}
    from collections import Counter

    df_count = Counter(s for ss in sets.values() for s in ss)
    hot = {s for s, c in df_count.items() if c > 10}
    assert hot  # the boilerplate run is hot in this fixture
    reduced = {d: ss - hot for d, ss in sets.items()}

    want = {}
    ids = sorted(reduced)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(reduced[a] & reduced[b])
            union = len(reduced[a] | reduced[b])
            if union and round(inter / union, 6) >= 0.5:
                want[(a, b)] = round(inter / union, 6)

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            boilerplate_docs, "doc_id", "tokens",
            threshold=0.5, max_shingle_df=10,
        ).collect()
    }
    assert got == want
    assert (100, 101) in got  # the true near-dup survives the guard


def test_jaccard_guard_prunes_candidate_volume(spark, boilerplate_docs):
    guarded = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "tokens",
        threshold=0.0, max_shingle_df=10,
    ).count()
    unguarded = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "tokens",
        threshold=0.0, max_shingle_df=None,
    ).count()
    # without the guard every doc pairs with every other through the
    # boilerplate shingle (the quadratic blowup the guard prevents)
    n = boilerplate_docs.count()
    assert unguarded == n * (n - 1) // 2
    assert guarded < unguarded


# ---------------------------------------------------------------------------
# MinHash estimate fidelity (vs exact n-gram Jaccard)
# ---------------------------------------------------------------------------


def test_minhash_estimates_track_exact_jaccard(spark, boilerplate_docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            boilerplate_docs, "doc_id", "tokens",
            threshold=0.3, max_shingle_df=None,
        ).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            boilerplate_docs, "doc_id", "tokens",
            k=64, bands=16, threshold=0.3,
        ).collect()
    }
    # the strongest true pair must be found, with a k=64 estimate
    # within ~4σ (σ ≈ sqrt(j(1-j)/64) ≈ 0.06)
    top_pair = max(exact, key=exact.get)
    assert top_pair in est
    assert abs(est[top_pair] - exact[top_pair]) <= 0.25
    for pair, e in est.items():
        if e >= 0.6:  # confident LSH pairs are genuinely similar
            assert exact.get(pair, 0.0) >= 0.3


def test_minhash_md5_matches_python_reference(spark):
    """hash_method='md5' (the SQL-reproducible oracle variant) pins
    bit-exactly against a pure-python md5 MinHash."""
    import hashlib

    from search_engine_spark.operators.dedup import (
        minhash_signatures,
    )

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta",
        1: "alpha beta gamma delta epsilon theta iota",
    }
    df = spark.createDataFrame(
        [(i, t.split()) for i, t in texts.items()],
        "doc_id long, tokens array<string>",
    )
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(
            df, "doc_id", "tokens", n=3, k=8, hash_method="md5"
        ).collect()
    }

    def h(s):  # substring(md5, 18, 15) is 1-based → hexdigest[17:32]
        return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)

    for i, t in texts.items():
        toks = t.split()
        sh = {
            " ".join(toks[j : j + 3])
            for j in range(len(toks) - 2)
        }
        want = [min(h(f"{s}#{seed}") for s in sh) for seed in range(8)]
        assert got[i] == want


def test_simhash_md5_matches_python_reference(spark):
    """hash_method='md5' SimHash (pure JVM columns, SQL-replayable)
    pins bit-exactly against the definitional implementation."""
    import hashlib

    from search_engine_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_table,
    )

    texts = {
        0: "alpha beta gamma alpha",
        1: "alpha beta gamma delta",
        2: "",  # token-less → signature 0
        3: "zz yy xx ww vv uu",
    }
    df = spark.createDataFrame(
        [(i, t.split()) for i, t in texts.items()],
        "doc_id long, tokens array<string>",
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_table(df, hash_method="md5").collect()
    }

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)

    def ref(toks):
        if not toks:
            return 0
        sums = [0] * 60
        for t in toks:
            x = h(t)
            for b in range(60):
                sums[b] += 1 if (x >> b) & 1 else -1
        return sum((1 << b) for b in range(60) if sums[b] > 0)

    assert got == {i: ref(t.split()) for i, t in texts.items()}

    # banded join over the 60-bit signatures: the near-identical
    # pair (0, 1) surfaces with the exact Hamming distance
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            df, bands=16, max_hamming=15, hash_method="md5"
        ).collect()
    }
    want_h = bin(ref(texts[0].split()) ^ ref(texts[1].split()))
    assert pairs.get((0, 1)) == want_h.count("1")


# ---------------------------------------------------------------------------
# S2 link extraction + frontier
# ---------------------------------------------------------------------------

_HTML = """<html><head><title>t</title></head><body>
<a href='http://site.example/a'>A</a>
<a href="/b">B</a>
<a href="http://other.example/c">offsite</a>
<a href='http://site.example/img.jpg'>forbidden ext</a>
<a href='http://site.example/p#frag'>fragment</a>
<a href='http://site.example/'>root</a>
<a href='http://site.example/self'>self</a>
<a href='relative/path'>relative</a>
<a href='http://site.example/a'>dup of A</a>
</body></html>"""


def test_extract_links_reference_semantics(spark):
    from search_engine_spark.functions.textproc import extract_links_col

    df = spark.createDataFrame(
        [("http://site.example/self", bytearray(_HTML, "utf-8"))],
        "url string, html binary",
    )
    links = df.select(
        extract_links_col(F.col("html"), F.col("url")).alias("links")
    ).collect()[0]["links"]
    assert sorted(links) == [
        "http://site.example/a", "http://site.example/b",
    ]


def test_link_frontier_excludes_crawled(spark):
    from search_engine_spark.functions.textproc import link_frontier

    pages = spark.createDataFrame(
        [
            ("http://site.example/self", bytearray(_HTML, "utf-8")),
            ("http://site.example/a",
             bytearray("<a href='http://site.example/new'>n</a>",
                       "utf-8")),
        ],
        "url string, html binary",
    )
    frontier = {(r["site"], r["link"])
                for r in link_frontier(pages).collect()}
    # /a is already crawled -> excluded; /b and /new are new
    assert frontier == {
        ("site.example", "http://site.example/b"),
        ("site.example", "http://site.example/new"),
    }


# ---------------------------------------------------------------------------
# R26 status-code guard + null-text fallback (enrich_pages)
# ---------------------------------------------------------------------------


def test_enrich_pages_drops_error_codes(spark):
    from search_engine_spark.sources.pages import enrich_pages

    html = bytearray(
        "<html><head><title>T</title></head><body>hello world</body></html>",
        "utf-8",
    )
    pages = spark.createDataFrame(
        [
            ("http://s.example/ok", html, "hello world", "english", 200),
            ("http://s.example/miss", html, "hello world", "english", 404),
            ("http://s.example/err", html, "hello world", "english", 500),
            ("http://s.example/unknown", html, "hello world", "english",
             None),
        ],
        "url string, html binary, text string, lang string, code int",
    )
    got = {r["url"] for r in enrich_pages(pages).collect()}
    # 4xx/5xx excluded (LemmaServiceImpl.java:32-34); NULL code kept
    assert got == {"http://s.example/ok", "http://s.example/unknown"}


def test_enrich_pages_null_text_falls_back_to_html(spark):
    from search_engine_spark.functions.textproc import extract_text_py
    from search_engine_spark.sources.pages import enrich_pages

    body = "fallback text from markup"
    html = bytearray(
        f"<html><head><title>T</title></head><body>{body}</body></html>",
        "utf-8",
    )
    pages = spark.createDataFrame(
        [
            ("http://s.example/full", html, "direct text", "english"),
            ("http://s.example/nulltext", html, None, "english"),
        ],
        "url string, html binary, text string, lang string",
    )
    got = {r["url"]: r["text"] for r in enrich_pages(pages).collect()}
    assert got["http://s.example/full"] == "direct text"
    assert got["http://s.example/nulltext"] == extract_text_py(
        bytes(html)
    )
    assert body in got["http://s.example/nulltext"]


def test_jaccard_prefix_filter_identical(spark):
    """AllPairs prefix filtering must not change results — any pair,
    any threshold (including docs shorter than the shingle width and
    exact duplicates)."""
    from search_engine_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i x"),    # near-dup of 0
        (2, "a b c d e f g h i j"),    # exact dup of 0
        (3, "z y x w v u t s r q"),
        (4, "z y x w v u t s r j"),    # near-dup of 3
        (5, "m n"),                    # shorter than shingle width
        (6, "completely different words here that share nothing"),
    ]
    docs = spark.createDataFrame(
        [(i, t.split()) for i, t in rows],
        "doc_id long, tokens array<string>",
    )
    for t in (0.3, 0.5, 0.8, 1.0):
        on = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, threshold=t, prefix_filter=True
            ).collect()
        }
        off = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, threshold=t, prefix_filter=False
            ).collect()
        }
        assert on == off, (t, on ^ off)
    assert (0, 2, 1.0) in on or t != 1.0


def test_novel_documents_exact_and_near(spark):
    from search_engine_spark.operators.dedup import (
        minhash_lsh_pairs_against,
        novel_documents,
    )

    base_rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "an entirely different document about spark data pipelines"),
    ]
    new_rows = [
        # exact dup of base 0
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        # near-dup of base 0 (one word changed)
        (11, "the quick brown fox leaps over the lazy dog again and again"),
        # fresh
        (12, "совершенно новый документ with unique words nobody wrote"),
        # exact dup WITHIN the batch of 12 — must be KEPT (batch-
        # internal dedup is a separate stage)
        (13, "совершенно новый документ with unique words nobody wrote"),
    ]

    def mk(rows):
        return spark.createDataFrame(
            [(i, t, t.split()) for i, t in rows],
            "doc_id long, text string, tokens array<string>",
        )

    base, new = mk(base_rows), mk(new_rows)

    exact = novel_documents(new, base)
    assert sorted(r["doc_id"] for r in exact.collect()) == [11, 12, 13]

    pairs = minhash_lsh_pairs_against(
        new, base, n=2, threshold=0.3
    ).collect()
    assert any(r["new_id"] == 11 and r["base_id"] == 0 for r in pairs)
    assert not any(r["new_id"] == 12 for r in pairs)

    both = novel_documents(
        new, base, near_dup=True, n=2, threshold=0.3
    )
    assert sorted(r["doc_id"] for r in both.collect()) == [12, 13]
