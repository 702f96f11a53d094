"""Unit tests for T1–T7 (SURVEY §2.2) + the byte-identical invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.lemmatizer import (
    is_particle,
    lemma_en,
    lemmatize,
)
from search_engine_spark.functions.textproc import (
    doc_len_col,
    extract_text_py,
    extract_title_py,
    lemma_counts_py,
    lemma_counts_udf,
    tokenize_py,
    tokens_col,
)
from search_engine_spark.sources.fixtures import generate_pages_pdf
from tests.oracle import oracle_lemma_counts, oracle_tokenize

# ---- T3 tokenizer (SentenceUtil.java:73-80 semantics) -------------------

TOKENIZER_GOLDEN = [
    ("Hello, World! 42", ["hello", "world"]),
    ("  spaced   out  ", ["spaced", "out"]),
    ("digits123inside", ["digits", "inside"]),
    ("", []),
    ("...!!!", []),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
    ("hyphen-ated words", ["hyphen", "ated", "words"]),
]


def test_tokenize_py_golden():
    for text, expect in TOKENIZER_GOLDEN:
        assert tokenize_py(text) == expect, text
        assert oracle_tokenize(text) == expect, text


def test_tokens_col_matches_python(spark):
    texts = [t for t, _ in TOKENIZER_GOLDEN] + [
        "The quick brown Fox; jumped over 2 lazy dogs!"
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text", tokens_col(F.col("text")).alias("toks"),
        doc_len_col(tokens_col(F.col("text"))).alias("n"),
    ).collect()
    for r in rows:
        assert list(r["toks"]) == tokenize_py(r["text"]), r["text"]
        assert r["n"] == len(tokenize_py(r["text"]))


def test_russian_tokenizer_excludes_yo():
    # reference range [а-я] excludes ё (SentenceUtil.java:76)
    assert tokenize_py("ёж идёт домой", "russian") == ["ж", "ид", "т", "домой"]


# ---- T5/T6 lemmatizer ----------------------------------------------------

LEMMA_GOLDEN = [
    ("cats", "cat"),
    ("running", "run"),
    ("stopped", "stop"),
    ("queries", "query"),
    ("classes", "class"),
    ("children", "child"),
    ("went", "go"),
    ("was", "be"),
    ("making", "make"),
    ("indices", "index"),
    ("engines", "engine"),
    ("searching", "search"),
    ("crawled", "crawl"),
    ("boxes", "box"),
    ("class", "class"),
    ("news", "news"),
    ("status", "status"),
]


def test_lemma_golden():
    for word, expect in LEMMA_GOLDEN:
        assert lemma_en(word) == expect, word


def test_particles_dropped():
    for w in ["the", "a", "an", "and", "of", "in", "not", "oh"]:
        assert is_particle(w)
        assert lemmatize(w) == ""


def test_single_letters_dropped():
    # un-analyzable -> silent drop (LemmaServiceImpl.java:97)
    assert lemmatize("x") == ""


def test_lemma_counts_py():
    counts = lemma_counts_py("the cats and the cat ran running")
    assert counts == {"cat": 2, "run": 2}


def test_lemma_counts_udf_matches_python(spark):
    pdf = generate_pages_pdf(16, n_sites=2, seed=7)
    df = spark.createDataFrame(pdf[["url", "text", "lang"]])
    df = df.withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
    rows = df.select(
        "url", "text", "lang",
        lemma_counts_udf(F.col("tokens"), F.col("lang")).alias("tc"),
    ).collect()
    for r in rows:
        got = {x["term"]: x["tf"] for x in r["tc"]}
        assert got == oracle_lemma_counts(r["text"], r["lang"]), r["url"]


# ---- T1/T2 html extraction + byte-identical invariant --------------------

def test_extract_text_byte_identical_on_fixtures():
    pdf = generate_pages_pdf(64, n_sites=2, seed=42)
    for _, row in pdf.iterrows():
        assert extract_text_py(row["html"]) == row["text"], row["url"]


def test_extract_text_strips_script_style():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><p>keep me</p><script>var x=1;</script></body></html>"
    )
    assert extract_text_py(html) == "keep me"


def test_extract_title():
    pdf = generate_pages_pdf(8, n_sites=2, seed=3)
    for _, row in pdf.iterrows():
        t = extract_title_py(row["html"])
        assert t and t == " ".join(row["text"].split()[:4]).rstrip(".")


def test_fused_analysis_equals_tokens_path(spark):
    """enrich(compute_tokens=False) + fused UDF must produce exactly
    the postings/doc_lens of the tokens_col + lemma_counts_udf path."""
    from search_engine_spark.operators.postings import build_postings
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    pages = pages_df(spark, 80, n_sites=3, seed=11)
    a = enrich_pages(pages, compute_tokens=True)
    b = enrich_pages(pages, compute_tokens=False)
    pa = {
        (r["term"], r["url"], r["tf"])
        for r in build_postings(a, "url", "lemma").collect()
    }
    pb = {
        (r["term"], r["url"], r["tf"])
        for r in build_postings(b, "url", "lemma").collect()
    }
    assert pa == pb and len(pa) > 0
    la = {(r["url"], r["doc_len"]) for r in
          a.select("url", "doc_len").collect()}
    lb = {(r["url"], r["doc_len"]) for r in
          b.select("url", "doc_len").collect()}
    assert la == lb


def test_russian_lemma_and_search_path(spark):
    """ru corpus end-to-end: tokenize (а-я range), particle drop,
    suffix strip, search returns results."""
    import datetime as dt

    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.search import search
    from search_engine_spark.sources.pages import enrich_pages

    rows = []
    texts = [
        "коты и собаки гуляли по дому",
        "кот спал на окне весь день",
        "собака лаяла на кота у дома",
        "дома стояли тихо в снегу",
        "окна домов светились ночью",
    ]
    for i, t in enumerate(texts):
        rows.append(
            (
                f"https://ru{i:02d}.example/p{i}",
                dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                f"<html><body><p>{t}</p></body></html>".encode(),
                t,
                "russian",
            )
        )
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string"
    )
    idx = build_index(enrich_pages(pages), analyzer="lemma")
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert "и" not in terms          # particle (союз) dropped
    assert any(t.startswith("кот") for t in terms)
    res = search(idx, "кот", lang="russian", use_stoplist=False).collect()
    assert len(res) > 0
    for r in res:
        assert r["url"].startswith("https://ru")


def test_use_html_build_matches_text_build(spark):
    """T1 invariant end-to-end: building from re-extracted html must
    equal building from the provided text column (fixtures render
    html FROM text, so extract_text(html) == text per url)."""
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    pages = pages_df(spark, 60, n_sites=3, seed=5)
    from_text = build_index(enrich_pages(pages), analyzer="lemma")
    from_html = build_index(
        enrich_pages(pages.drop("text").withColumn("text", F.lit(None).cast("string")),
                     use_html=True),
        analyzer="lemma",
    )
    pt = {(r["term"], r["url"], r["tf"])
          for r in from_text.postings.collect()}
    ph = {(r["term"], r["url"], r["tf"])
          for r in from_html.postings.collect()}
    assert pt == ph and len(pt) > 0
