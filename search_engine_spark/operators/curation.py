"""Corpus-curation operators for LLM training-data pipelines.

Four operators a web-scale (100 TB) training-data pipeline runs after
dedup and before tokenization — no reference counterpart (the
reference is a search engine); semantics follow the published
curation literature (Gopher / Rae et al. 2021 §A1.1, C4 / Raffel et
al. 2020 §2.2, CCNet / Wenzek et al. 2020):

- :func:`ngram_repetition` — per-doc top-n-gram and duplicated-n-gram
  token-coverage fractions (the Gopher repetition signals).  One
  explode + two map-side-combined aggregations; the groupBy key
  ``(doc, gram-hash)`` is near-unique, so the shuffle is skew-free
  regardless of how Zipf-skewed the grams themselves are, and grams
  cross the wire as fixed-width ``xxhash64`` keys, never strings.
- :func:`gopher_metrics` / :func:`gopher_gate` — the composite
  per-document quality record (length, mean word length, symbol
  ratio, stopword evidence, repetition fractions) and the boolean
  keep/drop gate over it.  Everything except the two repetition
  fractions is a pure JVM column expression on the row itself;
  the repetition fractions come from ONE shared gram shuffle (both
  n-gram sizes ride the same aggregation, keyed by ``(doc, n,
  hash)``).
- :func:`unigram_logprob` — unigram-LM negative log-likelihood and
  perplexity per document (the cheap stand-in for CCNet's KenLM
  scoring): corpus term frequencies are ONE count aggregation reused
  across every document; the per-token probability join shuffles on
  ``term``, Zipf-skewed, so it rides AQE skew-join splitting (and the
  term-count table is broadcast when small).
- :func:`assign_split` — deterministic, seed-salted train/val/test
  assignment via the integer value of an md5 substring: stable across
  runs, engines and cluster sizes (no ``rand()``), reproducible
  bit-for-bit in any SQL engine for auditing.  Pure column
  expression — no shuffle at all.

Every operator is closed-form deterministic so the DuckDB oracle in
``__spark_entry__.py`` reproduces it exactly (hash-match, not just
row-count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.functions.analysis import (
    QUALITY_STOPWORDS,
    mean_word_len,
)
from search_engine_spark.operators.dedup import shingles_col

# Gopher-style gate thresholds (Rae et al. 2021, table A1 spirit;
# values adapted to this engine's tokenizer and frozen for the oracle)
GATE_MIN_TOKENS = 25
GATE_MAX_TOKENS = 100_000
GATE_MIN_MEAN_WORD_LEN = 2.0
GATE_MAX_MEAN_WORD_LEN = 12.0
GATE_MAX_SYMBOL_RATIO = 0.10
GATE_MIN_STOPWORDS = 1
GATE_MAX_TOP2GRAM_FRAC = 0.20
GATE_MAX_DUP3GRAM_FRAC = 0.60

SPLIT_BUCKETS = 10_000


def _gram_counts(
    df: DataFrame,
    id_col: str,
    tokens_col_name: str,
    ns: list[int],
) -> DataFrame:
    """``(<id>, n, max_c, dup_c)`` per document per n-gram size.

    All requested sizes share one explode→aggregate pass (one
    shuffle); grams travel as xxhash64 longs.  ``max_c`` is the count
    of the most frequent n-gram, ``dup_c`` the total occurrences of
    grams appearing more than once.
    """
    toks = F.col(tokens_col_name)
    per_n = [
        df.select(
            F.col(id_col),
            F.lit(n).alias("n"),
            F.explode(shingles_col(toks, n)).alias("gram"),
        )
        for n in ns
    ]
    grams = per_n[0]
    for p in per_n[1:]:
        grams = grams.unionByName(p)
    cnt = (
        grams.select(id_col, "n", F.xxhash64("gram").alias("g"))
        .groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy(id_col, "n").agg(
        F.max("c").alias("max_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
        .alias("dup_c"),
    )


def _frac(cnt: Column, n: int, n_tokens: Column) -> Column:
    """Token-coverage fraction ``cnt·n / n_tokens``, capped at 1.

    NULL count (doc had no n-grams) or zero tokens → 0.0.  The
    null/zero guard sits OUTSIDE the cap because Spark's ``least``
    skips NULL arguments rather than propagating them.
    """
    raw = cnt.cast("double") * n / n_tokens.cast("double")
    return F.round(
        F.when(
            cnt.isNull() | (n_tokens <= 0), F.lit(0.0)
        ).otherwise(F.least(raw, F.lit(1.0))),
        6,
    )


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 2,
) -> DataFrame:
    """``(<id>, n_tokens, top_ngram_frac, dup_ngram_frac)``.

    ``top_ngram_frac`` — fraction of the document's tokens covered by
    its single most frequent n-gram (occurrences × n / n_tokens,
    capped at 1); ``dup_ngram_frac`` — same coverage for ALL n-grams
    occurring more than once.  Documents shorter than ``n`` tokens
    score 0 on both.  Gopher's repetition signals re-expressed over
    the engine's tokenizer.
    """
    lens = df.select(
        F.col(id_col), F.size(F.col(tokens_col_name)).alias("n_tokens")
    )
    agg = _gram_counts(df, id_col, tokens_col_name, [n]).drop("n")
    return lens.join(agg, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _frac(F.col("max_c"), n, F.col("n_tokens")).alias(
            "top_ngram_frac"
        ),
        _frac(F.col("dup_c"), n, F.col("n_tokens")).alias(
            "dup_ngram_frac"
        ),
    )


def symbol_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric (latin or
    cyrillic) nor whitespace (double)."""
    low = F.lower(text)
    total = F.length(low)
    sym = F.length(
        F.regexp_replace(low, "[a-z0-9\\u0430-\\u044f\\u0451\\s]", "")
    )
    return F.when(
        total > 0, sym.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def stopword_count(tokens: Column) -> Column:
    """Number of tokens in the frozen stopword list (long)."""
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    return F.size(
        F.filter(tokens, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")


def gopher_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col_name: str = "tokens",
) -> DataFrame:
    """Per-document quality record.

    ``(<id>, n_tokens, mean_word_len, symbol_ratio, n_stopwords,
    top_2gram_frac, dup_3gram_frac)`` — row-local metrics are pure
    column expressions; the two repetition fractions share one gram
    shuffle (both sizes aggregated together, see :func:`_gram_counts`).
    """
    toks = F.col(tokens_col_name)
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(mean_word_len(toks), 6).alias("mean_word_len"),
        F.round(symbol_ratio(F.col(text_col)), 6).alias("symbol_ratio"),
        stopword_count(toks).alias("n_stopwords"),
    )
    rep = (
        _gram_counts(df, id_col, tokens_col_name, [2, 3])
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("n") == 2, F.col("max_c"))).alias("m2"),
            F.max(F.when(F.col("n") == 3, F.col("dup_c"))).alias("d3"),
        )
    )
    return base.join(rep, id_col, "left").select(
        id_col,
        "n_tokens",
        "mean_word_len",
        "symbol_ratio",
        "n_stopwords",
        _frac(F.col("m2"), 2, F.col("n_tokens")).alias("top_2gram_frac"),
        _frac(F.col("d3"), 3, F.col("n_tokens")).alias("dup_3gram_frac"),
    )


def gopher_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col_name: str = "tokens",
) -> DataFrame:
    """:func:`gopher_metrics` plus a boolean ``keep`` column.

    A document is kept when every signal is inside its threshold
    (module constants, frozen for the oracle).  The gate is the
    pre-tokenization corpus filter; join ``keep`` back to the corpus
    or semi-join to materialize the filtered table.
    """
    m = gopher_metrics(df, id_col, text_col, tokens_col_name)
    keep = (
        (F.col("n_tokens") >= GATE_MIN_TOKENS)
        & (F.col("n_tokens") <= GATE_MAX_TOKENS)
        & (F.col("mean_word_len") >= GATE_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GATE_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GATE_MAX_SYMBOL_RATIO)
        & (F.col("n_stopwords") >= GATE_MIN_STOPWORDS)
        & (F.col("top_2gram_frac") <= GATE_MAX_TOP2GRAM_FRAC)
        & (F.col("dup_3gram_frac") <= GATE_MAX_DUP3GRAM_FRAC)
    )
    return m.withColumn("keep", keep)


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """``(<id>, n_tokens, nll, ppl)`` — unigram-LM scoring.

    ``nll`` is the mean negative log-probability of the document's
    tokens under the corpus's own unigram distribution; ``ppl`` its
    exponential.  High ppl = tokens rare for this corpus (noise,
    wrong language); low ppl = heavy boilerplate.  The cheap
    deterministic stand-in for CCNet's KenLM filter.

    Plan shape: corpus term counts are one map-side-combined
    aggregation; the per-token probability join keys on ``term``
    (Zipf-skewed → AQE skew-split; the count table is explicitly
    broadcast below the threshold since a term dictionary is tiny
    next to the token stream).  Docs with zero tokens are absent from
    the result (no distribution to score under).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.col(tokens_col_name)).alias("term")
    )
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = tok.count()
    n_terms = tf.count()
    tf_j = F.broadcast(tf) if n_terms <= broadcast_threshold else tf
    per = tok.join(tf_j, "term").select(
        id_col,
        (-F.log(F.col("c").cast("double") / F.lit(float(total)))).alias(
            "nlp"
        ),
    )
    return per.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("nlp"), 6).alias("nll"),
        F.round(F.exp(F.avg("nlp")), 6).alias("ppl"),
    )


def split_bucket_col(id_col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): integer value of an
    md5 substring (15 hex digits = 60 bits, exact in a long), salted
    so re-splitting with a new salt is a fresh assignment."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 18, 15), 16, 10).cast("long")
        % SPLIT_BUCKETS
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.98,
    val: float = 0.01,
    salt: str = "v1",
) -> DataFrame:
    """Adds a ``split`` column: 'train' | 'val' | 'test'.

    Assignment is a pure column expression over the id — no shuffle,
    no rand(), stable under re-runs, repartitioning and cluster size,
    and reproducible in any SQL engine for audit (the property a
    training pipeline needs so val/test never leak into train across
    incremental rebuilds).  Fractions are in bucket units of
    1/SPLIT_BUCKETS.
    """
    b = split_bucket_col(F.col(id_col), salt)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    k: int = 5,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """``(<id>, term, tf, score, rank)`` — top-``k`` TF-IDF keywords
    per document (smooth sklearn-style idf: ln((N+1)/(df+1)) + 1).

    Plan shape at scale: per-doc term counts are one map-side-combined
    aggregation keyed (doc, term) — near-unique key, no skew.  The
    document-frequency table is vocabulary-sized (tiny next to the
    token stream) and is broadcast below ``broadcast_threshold``, so
    the idf join adds no shuffle; N arrives as a broadcast 1-row cross
    join, never a driver collect.  The final top-k is a row_number
    window partitioned by doc — one doc-keyed shuffle, uniform.
    Deterministic tiebreak: score desc, term asc.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.col(tokens_col_name)).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("__n")
    )
    dft = dft.crossJoin(F.broadcast(n_docs))
    dft = dft.withColumn(
        "idf",
        F.log((F.col("__n") + 1).cast("double")
              / (F.col("df_t") + 1).cast("double")) + F.lit(1.0),
    ).select("term", "idf")
    n_terms = dft.count()
    dft_j = F.broadcast(dft) if n_terms <= broadcast_threshold else dft
    scored = tf.join(dft_j, "term").select(
        F.col(id_col), "term", "tf",
        F.round(F.col("tf").cast("double") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# C4-style duplicate-span removal (Raffel et al. 2020 §2.2: "discard all
# but one of any three-sentence span occurring more than once")
# ---------------------------------------------------------------------------

# Oracle-safe sentence split: RE2 (DuckDB) has no lookbehind, so the
# terminator is consumed by the split on BOTH sides (deterministic,
# identical) rather than kept via (?<=[.!?]).
SENTENCE_SPLIT_RE = r"[.!?]\s+"


def sentences_col(text: Column) -> Column:
    """array<string> of sentences (terminator-consumed split, trimmed,
    empties dropped) — shared by the span operators and their oracle."""
    return F.filter(
        F.transform(F.split(text, SENTENCE_SPLIT_RE), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def span_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_sentences: int = 3,
) -> DataFrame:
    """``(<id>, span_idx, span_fp)`` — every consecutive
    ``n_sentences``-sentence span, fingerprinted with md5 (exactly
    SQL-reproducible, unlike xxhash64, so the oracle can check it).

    Plan shape: a narrow per-row explode — span count per doc is
    (sentences - n + 1), so the stream is ~1 row per sentence; no
    shuffle until a consumer aggregates.
    """
    n = n_sentences
    sents = sentences_col(F.col(text_col))
    spans = F.when(
        F.size(sents) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(sents) - n),
            lambda i: F.array_join(F.slice(sents, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(spans).alias("span_idx", "__span")
    ).select(
        id_col, "span_idx", F.md5(F.col("__span")).alias("span_fp")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_sentences: int = 3,
) -> DataFrame:
    """``(span_fp, n_occ, n_docs)`` for spans occurring more than once
    corpus-wide.  One map-side-combined aggregation on the 16-byte
    fingerprint — uniform key, no skew (a single span repeated
    millions of times at web scale partial-aggregates per partition
    before the shuffle)."""
    return (
        span_table(df, id_col, text_col, n_sentences)
        .groupBy("span_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_occ") > 1)
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_sentences: int = 3,
    out_col: str = "clean_text",
) -> DataFrame:
    """C4 three-sentence-span dedup: for every span occurring more than
    once corpus-wide, keep the single occurrence in the lowest
    ``(<id>, span_idx)`` and drop the sentences of every other
    occurrence; sentences survive unless covered by a dropped span.

    Plan shape at 100 TB: span fingerprints shuffle once (uniform md5
    key, map-side combined); the keeper choice is a min-struct
    aggregate on the same shuffle; dropped-occurrence indices come
    back to docs via ONE join keyed on the doc id (near-unique key).
    Reassembly is pure JVM array ops — no Python, no second pass over
    text.
    """
    n = n_sentences
    spans = span_table(df, id_col, text_col, n).withColumn(
        "__occ", F.struct(F.col(id_col), F.col("span_idx"))
    )
    agg = spans.groupBy("span_fp").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("__occ").alias("__keep")
    )
    dropped = (
        spans.join(agg.filter(F.col("n_occ") > 1), "span_fp")
        .filter(F.col("__occ") != F.col("__keep"))
        .groupBy(id_col)
        .agg(F.collect_set("span_idx").alias("__bad_spans"))
    )
    sents = sentences_col(F.col(text_col))
    out = (
        df.join(dropped, id_col, "left")
        .withColumn("__sents", sents)
        .withColumn(
            "__bad_sents",
            F.when(
                F.col("__bad_spans").isNotNull(),
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.col("__bad_spans"),
                            lambda j: F.sequence(j, j + n - 1),
                        )
                    )
                ),
            ).otherwise(F.array().cast("array<int>")),
        )
        .withColumn(
            out_col,
            F.array_join(
                F.filter(
                    F.col("__sents"),
                    lambda s, i: ~F.array_contains(
                        F.col("__bad_sents"), i
                    ),
                ),
                ". ",
            ),
        )
    )
    return out.drop("__bad_spans", "__sents", "__bad_sents")


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicate token-span removal (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better": when a run
# of >= k consecutive tokens occurs more than once corpus-wide, keep the
# first occurrence and cut the tokens of every other occurrence)
# ---------------------------------------------------------------------------

# Window fingerprints join tokens with a space, so tokens must not
# contain spaces themselves (true for this engine's tokenizer, which
# splits on whitespace/non-letters).  Chosen over an opaque separator
# because the DuckDB oracle must build the identical string.
_WIN_SEP = " "


def token_window_table(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    k: int = 50,
) -> DataFrame:
    """``(id, win_idx, win_fp)`` — md5 fingerprint of every length-``k``
    rolling token window (start offsets 0-based; docs shorter than
    ``k`` emit nothing).

    Fingerprinting is a JVM column expression: O(T·k) bytes hashed per
    doc (each token lands in k windows).  That constant factor is the
    price of an oracle-reproducible fingerprint; a production rolling
    hash (O(T), Karp-Rabin) drops in here without touching the rest of
    the operator, which only sees ``win_fp`` values.
    """
    if k < 2:
        raise ValueError("window size k must be >= 2")
    toks = F.col(tokens_col_name)
    win_t = "array<struct<win_idx:int,win_fp:string>>"
    wins = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.struct(
                i.cast("int").alias("win_idx"),
                F.md5(
                    F.concat_ws(_WIN_SEP, F.slice(toks, i + 1, k))
                ).alias("win_fp"),
            ),
        ),
    ).otherwise(F.array().cast(win_t))
    return df.select(F.col(id_col), F.explode(wins).alias("__w")).select(
        id_col, F.col("__w.win_idx"), F.col("__w.win_fp")
    )


def remove_duplicate_token_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    k: int = 50,
    out_col: str = "clean_tokens",
) -> DataFrame:
    """ExactSubstr dedup over token arrays: every length-``k`` window
    occurring more than once corpus-wide keeps only the occurrence with
    the lowest ``(id, win_idx)``; all tokens covered by any other
    occurrence are cut from their documents.  Overlapping duplicated
    windows merge into maximal spans by construction (coverage is a
    union), so a repeated run of length k+m loses all k+m tokens, not
    k.  Token-level twin of :func:`remove_duplicate_spans` (C4 cuts
    sentence triples; this cuts exact token runs, the Lee 2021
    criterion).

    Plan shape at 100 TB: window fingerprints shuffle ONCE on the
    uniform md5 key (map-side combined count + min-occurrence);
    dropped occurrences come back through one fp-keyed join and merge
    into intervals with a gaps-and-islands window over the near-unique
    doc key — no quadratic step anywhere (a fully-duplicated doc is
    ONE island).  Reassembly filters the token array against the
    merged interval list in place: O(T·I) with I = merged spans per
    doc, all JVM, no Python.
    """
    wins = token_window_table(df, id_col, tokens_col_name, k)
    occ = wins.withColumn(
        "__occ", F.struct(F.col(id_col), F.col("win_idx"))
    )
    dup = occ.groupBy("win_fp").agg(
        F.count(F.lit(1)).alias("__n_occ"),
        F.min("__occ").alias("__keep"),
    ).filter(F.col("__n_occ") > 1)
    bad = (
        occ.join(dup, "win_fp")
        .filter(F.col("__occ") != F.col("__keep"))
        .select(id_col, "win_idx")
    )
    # gaps-and-islands: merge [j, j+k-1] coverage intervals per doc
    wspec = Window.partitionBy(id_col).orderBy("win_idx")
    isl = (
        bad.withColumn("__prev", F.lag("win_idx").over(wspec))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (F.col("win_idx") > F.col("__prev") + k)
            ).cast("int"),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                wspec.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    cuts = (
        isl.groupBy(id_col, "__isl")
        .agg(
            F.min("win_idx").alias("s"),
            (F.max("win_idx") + (k - 1)).alias("e"),
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias(
                "__cut"
            )
        )
    )
    toks = F.col(tokens_col_name)
    return (
        df.join(cuts, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("__cut").isNull(), toks).otherwise(
                F.filter(
                    toks,
                    lambda t, i: ~F.exists(
                        F.col("__cut"),
                        lambda c: (i >= c["s"]) & (i <= c["e"]),
                    ),
                )
            ),
        )
        .drop("__cut")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum subsample — the training-mix
    constructor ("keep 50% of en, 20% of ru, drop the rest").

    Membership is a pure function of ``(id, salt)`` via the same
    md5-bucket as :func:`assign_split` (change the salt for a fresh
    draw; identical salt -> identical sample on any cluster size or
    partitioning).  Fractions are applied as integer bucket thresholds
    out of ``SPLIT_BUCKETS`` (floor), so the expected rate is exact to
    1/SPLIT_BUCKETS and SQL-reproducible.

    Plan shape: a single filter over the scan — no shuffle, no
    sampling RNG state, pushdown-friendly.
    """
    thresholds = {
        k: int(v * SPLIT_BUCKETS) for k, v in fractions.items()
    }
    for k, t in thresholds.items():
        if not 0 <= t <= SPLIT_BUCKETS:
            raise ValueError(f"fraction out of [0,1] for {k!r}")
    b = split_bucket_col(F.col(id_col), salt)
    thr: Column = F.lit(int(default_fraction * SPLIT_BUCKETS))
    for k, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == k, F.lit(t)).otherwise(thr)
    return df.filter(b < thr)


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    deny_hosts: list[str] | None = None,
    deny_patterns: list[str] | None = None,
    allow_hosts: list[str] | None = None,
) -> DataFrame:
    """Domain/URL blocklist filtering — the first gate of any web
    curation pipeline.

    - ``deny_hosts``: drop when the URL host equals a listed host or
      is one of its subdomains (``host == h`` or ``endswith "." + h``);
    - ``deny_patterns``: drop when the FULL url matches any regex
      (RE2-safe patterns recommended so a SQL oracle can mirror them);
    - ``allow_hosts``: when given, keep ONLY these hosts (+subdomains);
      applied before the deny lists (deny wins inside the allowed set).

    One filter over the scan (host extraction is ``parse_url``, a JVM
    expression): no shuffle, pushdown-friendly, blocklist sizes up to
    ~10^5 entries stay cheap as an in-plan literal set; beyond that,
    broadcast-join a blocklist table instead.
    """
    host = F.parse_url(F.col(url_col), F.lit("HOST"))

    def _host_match(hosts: list[str]) -> Column:
        cond = F.lit(False)
        for h in hosts:
            cond = cond | (host == h) | host.endswith("." + h)
        return cond

    out = df
    if allow_hosts:
        out = out.filter(_host_match(allow_hosts))
    if deny_hosts:
        out = out.filter(~_host_match(deny_hosts))
    if deny_patterns:
        bad = F.lit(False)
        for pat in deny_patterns:
            bad = bad | F.col(url_col).rlike(pat)
        out = out.filter(~bad)
    return out


# query parameters that never change page identity — the standard
# tracker strip-list (mirrored verbatim into the DuckDB oracle so the
# two sides cannot drift); any `utm_*` key is stripped by prefix rule
TRACKING_PARAMS = [
    "fbclid",
    "gclid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "msclkid",
    "ref",
    "ref_src",
    "spm",
    "yclid",
]


def canonical_url_col(
    url: Column,
    strip_www: bool = True,
    tracking_params: list[str] = TRACKING_PARAMS,
) -> Column:
    """URL canonicalization as ONE pure-JVM column expression — the
    crawl-dedup primitive that collapses the dozens of spellings a
    page is fetched under into one identity key:

    - scheme and host lowercased; trailing-dot host stripped;
      default port removed (``:80`` for http, ``:443`` for https);
      optional leading ``www.`` strip;
    - path: duplicate slashes collapsed, trailing slashes stripped
      (so ``https://a.example/`` ≡ ``https://a.example``);
    - query: parameters split, tracking params dropped (``utm_*`` by
      prefix + the shared strip-list), the rest SORTED and rejoined —
      param order never changes identity;
    - fragment dropped.

    Non-http(s) or unparseable values pass through trimmed — the
    caller decides whether to drop them (``filter_urls``).  No UDF,
    no shuffle: higher-order array functions keep the whole thing
    inside whole-stage codegen, usable directly in a groupBy key for
    URL-level dedup at any scale.
    """
    u = F.trim(url)
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"\.$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(
        F.regexp_replace(path, "/{2,}", "/"), "/+$", ""
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    tracked = [t.lower() for t in tracking_params]

    def _keep(p: Column) -> Column:
        key = F.lower(F.split(p, "=").getItem(0))
        return (
            (p != "")
            & ~key.startswith("utm_")
            & ~key.isin(tracked)
        )

    params = F.array_sort(F.filter(F.split(query, "&"), _keep))
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    rebuilt = F.concat(scheme, F.lit("://"), host, path, qpart)
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(u)


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    strip_www: bool = True,
) -> DataFrame:
    """Attach the canonical-identity column (see
    :func:`canonical_url_col`); pair with ``exact_dedup_groups`` or
    ``dropDuplicates([out_col])`` for URL-level crawl dedup."""
    return df.withColumn(
        out_col, canonical_url_col(F.col(url_col), strip_www)
    )


def sample_n_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
    prefilter_factor: float | None = None,
) -> DataFrame:
    """Deterministic at-most-``n``-rows-per-group subsample — balanced
    corpus construction ("keep at most N pages per domain").

    Rows rank within their group by ``(md5 bucket, id)`` — a salted,
    uniform, partitioning-invariant order — and the first ``n``
    survive.  Same salt => identical sample anywhere; new salt =>
    fresh draw.

    Scale note: the rank is a per-group window, so a head group (a
    domain with 10^9 pages at web scale) is one task.  Pass
    ``prefilter_factor`` (e.g. 4.0) to bucket-prune each group to
    ~factor*n expected rows BEFORE the window (group counts are a tiny
    broadcast aggregate): the window then ranks thousands, not
    billions.  The prune keeps the window's winners with probability
    ->1 for factor >= 4 (Chernoff on the uniform bucket), but is not
    a hard guarantee — leave it off where exactness vs the unfiltered
    semantics must hold.
    """
    b = split_bucket_col(F.col(id_col), salt)
    work = df
    if prefilter_factor is not None:
        counts = df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("__gc")
        )
        thr = F.least(
            F.lit(SPLIT_BUCKETS),
            F.ceil(
                F.lit(float(n) * prefilter_factor)
                / F.col("__gc") * SPLIT_BUCKETS
            ),
        )
        work = df.join(
            F.broadcast(counts.select(group_col, thr.alias("__thr"))),
            group_col,
        ).filter(b < F.col("__thr")).drop("__thr")
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(id_col).asc())
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# bigram language-model scoring (KenLM-style filter, one order up from
# unigram_logprob)
# ---------------------------------------------------------------------------


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    alpha: float = 0.1,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """``(<id>, n_bigrams, nll, ppl)`` — add-α-smoothed bigram-LM
    scoring under the corpus's own bigram distribution.

    ``P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V)`` where ``c(w₁·)`` is
    the bigram-PREFIX count (occurrences of w₁ in non-final position)
    and ``V`` the unigram vocabulary size; ``nll`` is the mean
    negative conditional log-probability over the doc's bigrams,
    ``ppl`` its exponential.  One order above
    :func:`unigram_logprob`: catches shuffled-word salad that unigram
    statistics score as fluent — the honest in-sandbox stand-in for
    CCNet's 5-gram KenLM filter (same shape, lower order).

    Plan shape: the bigram stream is a JVM ``arrays_zip`` of the
    token array against its own 1-shift — no UDF, no positional
    self-join; corpus bigram counts and prefix counts are map-side-
    combined aggregations over that stream (Zipf-skewed keys → AQE
    skew-split; both dictionaries broadcast below the threshold).
    Docs with < 2 tokens are absent (no bigram to score).
    """
    toks = F.col(tokens_col_name)
    # slice length must be non-negative: empty/1-token docs yield an
    # empty zip (explode then drops the row — they have no bigram)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    big = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("w1"),
                F.slice(toks, 2, n1).alias("w2"),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(toks).alias("t")).agg(
            F.countDistinct("t").alias("v")
        )
    ).collect()[0]["v"]

    n2 = c2.count()
    c2_j = F.broadcast(c2) if n2 <= broadcast_threshold else c2
    c1_j = F.broadcast(c1) if n2 <= broadcast_threshold else c1
    a = float(alpha)
    per = (
        big.join(c2_j, ["w1", "w2"])
        .join(c1_j, "w1")
        .select(
            id_col,
            (
                -F.log(
                    (F.col("c2").cast("double") + F.lit(a))
                    / (F.col("c1").cast("double") + F.lit(a * vocab))
                )
            ).alias("nlp"),
        )
    )
    return per.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("nlp"), 6).alias("nll"),
        F.round(F.exp(F.avg("nlp")), 6).alias("ppl"),
    )


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    discount: float = 0.75,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """``(<id>, n_bigrams, nll, ppl)`` — interpolated Kneser–Ney
    bigram scoring under the corpus's own distribution (Kneser & Ney
    1995; Chen & Goodman 1999's interpolated form with one fixed
    discount ``D``):

        P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
                   + (D · N₁₊(w₁,·)/c(w₁·)) · N₁₊(·,w₂)/N₁₊(·,·)

    where ``c(w₁·)`` is the bigram-prefix count, ``N₁₊(w₁,·)`` the
    distinct continuations of w₁, ``N₁₊(·,w₂)`` the distinct
    left-contexts of w₂ (the continuation probability that makes KN
    penalise words frequent only inside one collocation — "francisco"
    after anything but "san"), and ``N₁₊(·,·)`` the distinct bigram
    types.  The proper successor to :func:`bigram_logprob`'s add-α
    smoothing for quality filtering; every scored bigram exists in
    the corpus (the model IS the corpus), so probabilities are
    strictly positive without a unigram floor.

    Plan shape: identical to :func:`bigram_logprob` — one JVM
    ``arrays_zip`` bigram stream, THREE map-side-combined aggregates
    over it (bigram counts; prefix count + distinct-continuation in
    one pass; distinct-left-context), each Zipf-skewed → AQE
    skew-split; dictionaries broadcast below the threshold.  Docs
    with < 2 tokens are absent.
    """
    toks = F.col(tokens_col_name)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    big = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("w1"),
                F.slice(toks, 2, n1).alias("w2"),
            )
        ).alias("bg"),
    ).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )

    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # prefix count + distinct continuations in one pass over c2
    # (c2 is the bigram-TYPE table, so count(*) there = N1+(w1,·))
    left = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).alias("n_cont"),
    )
    right = c2.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n_ctx")
    )
    n_types = c2.count()

    big_j = F.broadcast(c2) if n_types <= broadcast_threshold else c2
    left_j = (
        F.broadcast(left) if n_types <= broadcast_threshold else left
    )
    right_j = (
        F.broadcast(right)
        if n_types <= broadcast_threshold
        else right
    )
    d = float(discount)
    p = (
        F.greatest(
            F.col("c2").cast("double") - F.lit(d), F.lit(0.0)
        )
        / F.col("c1")
        + (F.lit(d) * F.col("n_cont") / F.col("c1"))
        * (F.col("n_ctx") / F.lit(float(n_types)))
    )
    per = (
        big.join(big_j, ["w1", "w2"])
        .join(left_j, "w1")
        .join(right_j, "w2")
        .select(id_col, (-F.log(p)).alias("nlp"))
    )
    return per.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("nlp"), 6).alias("nll"),
        F.round(F.exp(F.avg("nlp")), 6).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# re-crawl snapshot dedup (latest page per canonical URL)
# ---------------------------------------------------------------------------


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canonical: bool = True,
) -> DataFrame:
    """One row per (canonical) URL — the LATEST crawl snapshot.

    Common-Crawl-style corpora carry every re-crawl of a page as its
    own row; indexing them all double-counts df/tf and near-dup pairs.
    This keeps, per canonical URL (tracking params / case / port
    normalized away via :func:`canonical_url_col` when ``canonical``),
    the row with the greatest ``ts_col``; ties break on the raw URL
    asc then deterministically on all remaining columns via the
    row_number's total order.  Adds the ``canonical_url`` column.

    Plan shape: one window partitioned by canonical URL — keys are
    near-unique (a handful of snapshots per page), so the shuffle is
    skew-free by construction and the per-group sort is O(snapshots).
    At 100 TB this is the standard first pass after the raw scan,
    BEFORE text analysis, so every downstream operator sees each page
    once.
    """
    canon = (
        canonical_url_col(F.col(url_col))
        if canonical
        else F.col(url_col)
    )
    work = pages.withColumn("canonical_url", canon)
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(url_col).asc()
    )
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# domain-level curation (RefinedWeb-style site gating)
# ---------------------------------------------------------------------------


def site_quality_stats(
    df: DataFrame,
    site_col: str = "source",
    text_col: str = "text",
    tokens_col_name: str = "tokens",
) -> DataFrame:
    """``(<site>, n_docs, avg_quality)`` — per-domain aggregate of the
    composite quality score (functions/analysis.quality_score).

    Web curation pipelines gate whole DOMAINS, not just documents
    (a spam farm's individually-plausible pages share a bad domain
    profile).  One map-side-combined aggregation over the per-doc
    scores; skew-free (sites ≫ executors, heaviest site ≪ a
    partition)."""
    from search_engine_spark.functions.analysis import quality_score

    q = df.select(
        F.col(site_col).alias("site"),
        quality_score(F.col(text_col), F.col(tokens_col_name)).alias(
            "q"
        ),
    )
    return q.groupBy("site").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    )


def filter_quality_domains(
    df: DataFrame,
    min_avg_quality: float,
    site_col: str = "source",
    text_col: str = "text",
    tokens_col_name: str = "tokens",
    min_docs: int = 1,
) -> DataFrame:
    """Documents whose DOMAIN passes the quality gate: site average
    quality ≥ ``min_avg_quality`` and ≥ ``min_docs`` documents.

    The kept-sites frame is one row per domain — always broadcast for
    the semi-join, so the corpus never shuffles."""
    keep = (
        site_quality_stats(df, site_col, text_col, tokens_col_name)
        .filter(
            (F.col("avg_quality") >= min_avg_quality)
            & (F.col("n_docs") >= min_docs)
        )
        .select(F.col("site").alias(site_col))
    )
    return df.join(F.broadcast(keep), site_col, "left_semi")


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    min_count: int = 5,
    limit: int = 100,
) -> DataFrame:
    """``(w1, w2, n, pmi)`` — the corpus's top collocations by
    pointwise mutual information (Church & Hanks 1990):

        pmi = log( P(w1w2) / (P(w1)·P(w2)) )
            = log( n(w1w2)·T / (c(w1)·c(w2)) )

    with ``T`` the total token count and ``c(·)`` UNIGRAM counts —
    the standard phrase-dictionary builder (feeds phrase indexing /
    tokenizer merges).  ``min_count`` drops noise pairs (PMI is
    notoriously top-heavy on hapax bigrams), then the top ``limit``
    by (pmi desc, w1 asc, w2 asc).

    Plan shape: the bigram stream is the same JVM ``arrays_zip``
     1-shift as :func:`bigram_logprob`; counts are two map-side-
    combined aggregations; the unigram dictionary joins back onto the
    (min_count-pruned) bigram table — both sides term-keyed, bigram
    side already tiny after the prune; top-``limit`` is a
    TakeOrderedAndProject, never a global sort.
    """
    toks = F.col(tokens_col_name)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    big = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("w1"),
                F.slice(toks, 2, n1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = df.select(F.explode(toks).alias("t"))
    total = uni.count()
    c1 = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    return (
        pairs.join(
            c1.select(F.col("t").alias("w1"), F.col("c").alias("c_w1")),
            "w1",
        )
        .join(
            c1.select(F.col("t").alias("w2"), F.col("c").alias("c_w2")),
            "w2",
        )
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log(
                    F.col("n").cast("double")
                    * F.lit(float(total))
                    / (
                        F.col("c_w1").cast("double")
                        * F.col("c_w2").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(limit)
    )


def next_token_suggestions(
    df: DataFrame,
    word: str,
    k: int = 10,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
) -> DataFrame:
    """``(next_term, n)`` — the ``k`` most frequent corpus
    continuations of ``word`` (bigram-count completion: the
    "searches related to" / query-builder suggestion primitive,
    complementing the prefix autocomplete in operators/fuzzy).

    One filtered bigram aggregation: the ``w1 = word`` predicate is
    applied BEFORE the count shuffle, so cost is O(occurrences of
    ``word``), never the corpus bigram volume.  Ordered n desc,
    next_term asc (deterministic), top-k via TakeOrderedAndProject.
    """
    toks = F.col(tokens_col_name)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    big = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("w1"),
                F.slice(toks, 2, n1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    return (
        big.filter(F.col("w1") == word)
        .groupBy(F.col("w2").alias("next_term"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("next_term"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# corpus diff (crawl-over-crawl drift report)
# ---------------------------------------------------------------------------


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(<id>, status)`` per doc that differs between two corpus
    versions: ``added`` (id only in new), ``removed`` (id only in
    old), ``changed`` (both, content fingerprint differs).  Unchanged
    docs are absent — at crawl scale the diff is the small output,
    the full-outer join is the one shuffle (id-keyed, uniform).

    The ops primitive behind incremental decisions: what to reindex
    (added ∪ changed → ``reindex_pages``), what to tombstone
    (removed), and how fast the corpus drifts release-over-release.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__fp_old")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__fp_new")
    )
    j = o.join(n, id_col, "full_outer")
    return (
        j.withColumn(
            "status",
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(
                F.col("__fp_old") != F.col("__fp_new"),
                F.lit("changed"),
            )
            .otherwise(F.lit(None)),
        )
        .filter(F.col("status").isNotNull())
        .select(id_col, "status")
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row: ``(n_added, n_removed, n_changed, n_unchanged)``."""
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__fp_old")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__fp_new")
    )
    j = o.join(n, id_col, "full_outer")
    return j.agg(
        F.sum(
            F.when(F.col("__fp_old").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_added"),
        F.sum(
            F.when(F.col("__fp_new").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_removed"),
        F.sum(
            F.when(
                F.col("__fp_old").isNotNull()
                & F.col("__fp_new").isNotNull()
                & (F.col("__fp_old") != F.col("__fp_new")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_changed"),
        F.sum(
            F.when(F.col("__fp_old") == F.col("__fp_new"), 1)
            .otherwise(0)
        ).cast("long").alias("n_unchanged"),
    )


# ---------------------------------------------------------------------------
# deterministic weighted sampling without replacement (A-ES)
# ---------------------------------------------------------------------------


def _weighted_key_col(
    id_col: Column, weight_col: Column, salt: str
) -> Column:
    """The Efraimidis–Spirakis exponential race key ``-ln(u)/w`` with
    ``u`` drawn as the 60-bit md5 value of (id, salt) mapped into
    (0, 1).  Smallest ``k`` keys = a weighted sample without
    replacement with inclusion odds proportional to the weights
    (Efraimidis & Spirakis 2006, the `u^(1/w)` top-k formulation —
    monotonically equivalent under -ln/w).  Pure function of
    (id, salt, weight): partitioning-, retry- and cluster-size-
    invariant, same md5 draw convention as :func:`split_bucket_col`
    so one salt namespace governs every sampling operator."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    v = F.conv(F.substring(h, 18, 15), 16, 10).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return -F.log(u) / weight_col.cast("double")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "v1",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: ``k`` rows
    (globally, or per ``group_col`` group) with inclusion probability
    proportional to ``weight_col`` — quality-weighted corpus
    subsampling ("keep 1M docs, prefer high quality-score"), the
    weighted counterpart of :func:`sample_n_per_group`.

    Rows with weight <= 0 or NULL are never selected (the A-ES
    limit).  Ties (impossible in practice with 60-bit draws) break on
    the id for full determinism.

    Plan shape at scale: the key is a pure column expression over the
    scan; global mode is ``ORDER BY key LIMIT k`` — Spark executes it
    as TakeOrderedAndProject (per-partition top-k heaps + driver
    merge of k·P rows, never a global sort); group mode is one
    window over ``group_col`` (head groups rank all their rows — use
    :func:`sample_n_per_group`'s prefilter idea upstream if a group
    is corpus-sized).
    """
    key = _weighted_key_col(
        F.col(id_col), F.col(weight_col), salt
    )
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    if group_col is None:
        return (
            eligible.orderBy(key.asc(), F.col(id_col).asc())
            .limit(k)
        )
    w = Window.partitionBy(group_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        eligible.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# site-level boilerplate line removal (CCNet / RefinedWeb line dedup)
# ---------------------------------------------------------------------------


def remove_boilerplate_lines(
    df: DataFrame,
    max_df: int = 2,
    group_col: str | None = "site",
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Drop lines whose normalized content recurs in more than
    ``max_df`` documents of the same group — navigation bars, cookie
    banners, "all rights reserved" footers: the line-level dedup pass
    CCNet runs before anything else and RefinedWeb's per-site
    boilerplate rule.  ``group_col=None`` scopes the rule corpus-wide.

    Normalization for the recurrence test: lower(trim(line)); blank
    lines are never boilerplate (kept).  The surviving lines keep
    their original text and order, rejoined with ``\\n`` into
    ``out_col``; every other column passes through.

    Plan shape at 100 TB: one explode → one (group, line-hash)
    aggregation (map-side combined; xxhash64 keys, the raw line never
    shuffles twice), one anti-join of the line stream against the
    (small) offender set keyed by the same (group, hash), one
    near-unique-key groupBy(id) to reassemble.  All JVM — no UDF.
    """
    gcols = [group_col] if group_col else []
    norm = F.lower(F.trim(F.col("__line")))
    lines = df.select(
        F.col(id_col), *gcols,
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__idx", "__line"
        ),
    ).withColumn("__h", F.xxhash64(norm))
    nonblank = lines.filter(norm != "")

    counts = nonblank.groupBy(*gcols, "__h").agg(
        F.count_distinct(F.col(id_col)).alias("__docs")
    )
    bad = counts.filter(F.col("__docs") > max_df).select(*gcols, "__h")

    kept = lines.join(bad, [*gcols, "__h"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__idx", "__line"))
                ),
                lambda s: s["__line"],
            ),
        ).alias(out_col)
    )
    return df.join(rebuilt, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    tokens_col_name: str = "tokens",
    n_buckets: int = 3,
    discount: float = 0.75,
    scores: DataFrame | None = None,
) -> DataFrame:
    """``(<id>, lang, ppl, bucket)`` — CCNet's quality split (Wenzek
    et al., LREC 2020): rank every document by LM perplexity WITHIN
    its language and cut the ranking into ``n_buckets`` equal-depth
    buckets — lowest perplexity (cleanest text) first.  With the
    default 3 buckets the labels are CCNet's ``head``/``middle``/
    ``tail``; other counts label ``b1..bn``.

    The LM is the corpus's own interpolated Kneser–Ney bigram model
    (:func:`kneser_ney_logprob`; pass ``scores`` to reuse a
    precomputed ``(id, ppl)`` frame, e.g. from a held-out reference
    corpus as CCNet does with Wikipedia).  Docs with < 2 tokens have
    no bigram perplexity and are absent, like the scorer itself.

    Determinism: ntile over (ppl asc, id asc) — ppl is the scorer's
    6-decimal-rounded value, ties broken by id, so the split is
    reproducible and mirrored exactly by the SQL oracle.

    Scale shape: ONE window = one hash shuffle on ``lang`` + per-lang
    sort.  Languages are few but skewed (English ≫ rest), so at
    100 TB prefer :func:`perplexity_buckets_approx` — same labels to
    within the sketch error, no per-language global sort.
    """
    sc = (
        scores
        if scores is not None
        else kneser_ney_logprob(df, id_col, tokens_col_name, discount)
    )
    joined = df.select(id_col, lang_col).join(
        sc.select(id_col, "ppl"), id_col
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.asc("ppl"), F.asc(id_col)
    )
    nt = F.ntile(n_buckets).over(w)
    if n_buckets == 3:
        bucket = (
            F.when(F.col("_nt") == 1, F.lit("head"))
            .when(F.col("_nt") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        bucket = F.concat(F.lit("b"), F.col("_nt").cast("string"))
    return (
        joined.withColumn("_nt", nt)
        .withColumn("bucket", bucket)
        .select(id_col, lang_col, "ppl", "bucket")
    )


def perplexity_buckets_approx(
    df: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    tokens_col_name: str = "tokens",
    n_buckets: int = 3,
    discount: float = 0.75,
    accuracy: int = 10000,
    scores: DataFrame | None = None,
) -> DataFrame:
    """The 100 TB shape of :func:`perplexity_buckets`: per-language
    cut points from ONE ``percentile_approx`` aggregation (Greenwald–
    Khanna sketch, map-side combined — no per-language sort), then a
    stateless broadcast-join + comparison labels every doc.  Labels
    match the exact ntile split up to sketch error at the bucket
    boundaries (CCNet itself thresholds on precomputed cutoffs, so
    boundary tolerance is the published semantics).  ``accuracy`` is
    Spark's sketch knob (error ≤ 1/accuracy)."""
    sc = (
        scores
        if scores is not None
        else kneser_ney_logprob(df, id_col, tokens_col_name, discount)
    )
    joined = df.select(id_col, lang_col).join(
        sc.select(id_col, "ppl"), id_col
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = joined.groupBy(lang_col).agg(
        F.percentile_approx("ppl", qs, accuracy).alias("_cuts")
    )
    labelled = joined.join(F.broadcast(cuts), lang_col)
    # bucket = 1 + number of cut points strictly below ppl
    nt = F.lit(1) + F.aggregate(
        "_cuts",
        F.lit(0),
        lambda acc, c: acc
        + F.when(F.col("ppl") > c, F.lit(1)).otherwise(F.lit(0)),
    )
    if n_buckets == 3:
        bucket = (
            F.when(F.col("_nt") == 1, F.lit("head"))
            .when(F.col("_nt") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        bucket = F.concat(F.lit("b"), F.col("_nt").cast("string"))
    return (
        labelled.withColumn("_nt", nt)
        .withColumn("bucket", bucket)
        .select(id_col, lang_col, "ppl", "bucket")
    )
