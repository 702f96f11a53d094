"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 on the sf0.001 documents table.
``queries()`` — one entry per implemented operator (SURVEY.md §2);
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible one.

Both sides share EXACT semantics: the tokenizer is the reference's
``SentenceUtil.splitToWords`` (lowercase, non-letters→space, split);
BM25 uses the reference's tf = rank/len variant with k1=1.5 b=0.75
(application.properties:19-20), the 20-term stop-list, rarest-lemma
candidate generation, and the global-df/local-N site quirk.  Floating
scores are rounded to 6 dp on both sides; averages are computed as
exact-integer-SUM / COUNT so they are bit-deterministic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K1, B = 1.5, 0.75
STOPLIST_SIZE = 20

# shared robots.txt body for the robots_filter contract query — the
# oracle embeds the SAME literal and re-parses it in SQL
ROBOTS_BODY = (
    "# synthetic policy\n"
    "User-agent: googlebot\n"
    "User-agent: crawler\n"
    "Disallow: /p1\n"
    "Allow: /p12*\n"
    "Disallow: /*3$\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
)
FLAGSHIP_TERMS = ["dup", "fast", "key"]
FLAGSHIP_QUERY = " ".join(FLAGSHIP_TERMS)
MLT_SRC_DOC = 7  # more_like_this contract source document
# lemma-analyzer flagship: "data" exercises the exception table
# (data -> datum), "dup" is the rare candidate-generation term
FLAGSHIP_LEMMA_QUERY = "data dup line"
SITES_RESTRICTED = ["src1", "src2"]
# exact-phrase flagship for the positional-postings surface: a bigram
# that occurs in ~10% of docs at sf0.01 (selective but non-trivial)
PHRASE_TERMS = ["table", "hash"]
# synonym-group flagship: "dup" rides with non-stop "key", "fast"
# with non-stop "vector" — both groups change df AND tf vs the plain
# term query, so the oracle exercises union-df and summed group tf
SYNONYM_QUERY = "dup fast"
SYNONYM_MAP = {"dup": ["key"], "fast": ["vector"]}
# proximity flagship: two non-stop mid-frequency terms (min cover
# span for m=2 == min |pos_a − pos_b|, exactly SQL-expressible)
PROX_TERMS = ["key", "line"]
# rank-eval query set: graded qrels = docs containing ≥2 distinct
# query terms (rel = n_matching_terms − 1); run = docs ranked by
# summed query-term tf.  Exercises MRR / graded nDCG / recall@k.
EVAL_QUERIES = [(0, "dup fast"), (1, "key line"), (2, "vector column")]
# (k1, b) grid for the bm25_tuning sweep; combo 0 = engine default
TUNING_GRID = [(1.5, 0.75), (1.2, 0.75), (0.9, 0.4), (2.0, 0.9)]
# Taily-Erlang contract: "dup" fits Erlang shape k=1 on one parity
# shard and k=3 on the other (non-trivial factorial sum); the
# two-term query exercises the co-occurrence product f=n^(1-|Q|)·Πn_t.
# s_c sits mid-tail for both shards (survival mass strictly in (0,1)).
TAILY_QUERY = "dup"
TAILY_MULTI_QUERY = "dup fast"
TAILY_SC = 0.15
# full-Gamma Taily contract: n_c=2 < f_all on both parity shards, so
# the fractional-shape fit AND the global-cutoff bisection genuinely
# fire (k_all ~ 0.26, s_c ~ 0.318 at sf0.01) instead of the n_c>=f_all
# short-circuit; both shards stay live (est 1.685 / 0.217)
TAILY_NC = 2
# percolator (reverse search) registered query set: rare + common
# terms, an absent-term query and an all-stoplist query (both must
# match nothing), exercising R13 rarest-membership per query
PERCOLATE_QUERIES = [
    (0, "dup fast"),
    (1, "key line"),
    (2, "vector column"),
    (3, "zzznope unknownzz"),       # absent from the dictionary
    (4, "table hash window"),       # every term stop-listed
    (5, "dup value the query"),
]

# ---------------------------------------------------------------------------
# shared helpers (Spark side)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict = {}
_COMPACT_CACHE: dict = {}
_FED_CACHE: dict = {}


def _docs_index(spark: SparkSession, sf_dir: str):
    """Tokens-analyzer inverted index over the documents table
    (cached per sf_dir within the process)."""
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.pages import documents_as_pages

    key = (id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        docs = documents_as_pages(spark, sf_dir)
        _INDEX_CACHE[key] = build_index(
            docs, id_col="doc_id", analyzer="tokens"
        )
    return _INDEX_CACHE[key]


def _docs_index_lemma(spark: SparkSession, sf_dir: str):
    """PRODUCTION-analyzer (lemma) inverted index over the documents
    table — oracle-checked via a generated word→lemma VALUES map on
    the DuckDB side (see :func:`_lemma_map_cte`)."""
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.pages import documents_as_pages

    key = (id(spark), sf_dir, "lemma")
    if key not in _INDEX_CACHE:
        from search_engine_spark.functions.textproc import (
            analyze_text_udf,
        )

        docs = documents_as_pages(spark, sf_dir)
        # fused T3–T7 counts: with `analyzed` in the cached
        # projection, every query re-derives postings as a JVM
        # explode of the cached counts — WITHOUT this column the
        # lemma Arrow UDF re-runs over the corpus per query
        # (doc_len stays the token count, matching the oracle)
        docs = docs.withColumn(
            "analyzed", analyze_text_udf(F.col("text"), F.col("lang"))
        )
        _INDEX_CACHE[key] = build_index(
            docs, id_col="doc_id", analyzer="lemma"
        )
    return _INDEX_CACHE[key]


def _search_docs_lemma(spark, sf_dir, query, offset=0, limit=10):
    from search_engine_spark.plans.search import search

    idx = _docs_index_lemma(spark, sf_dir)
    res = search(idx, query, offset=offset, limit=limit,
                 analyzer="lemma")
    return res.select(
        "doc_id", F.round("score", 6).alias("score"),
        F.col("rn").cast("int").alias("rn"),
    )


def _docs_compact(spark: SparkSession, sf_dir: str):
    """Compacted (delta+varint block) twin of :func:`_docs_index` —
    the WAND queries prove the compressed path is rank-identical to
    the DuckDB oracle too.  The documents table's natural key is
    literally named doc_id, which collides with the composed block
    ids — rename it for the compact build and alias back on read."""
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index

    key = (id(spark), sf_dir)
    if key not in _COMPACT_CACHE:
        idx = _docs_index(spark, sf_dir)
        renamed = replace(
            idx,
            postings=idx.postings.withColumnRenamed("doc_id", "nat_id"),
            doc_lens=idx.doc_lens.withColumnRenamed("doc_id", "nat_id"),
            id_col="nat_id",
            cached=(),
        )
        cidx = compact_index(renamed, n_segments=16)
        cidx.segments = cidx.segments.cache()
        cidx.doc_map = cidx.doc_map.cache()
        _COMPACT_CACHE[key] = cidx
    return _COMPACT_CACHE[key]


def _docs_compact_shards(spark: SparkSession, sf_dir: str):
    """TWO compact indexes over disjoint halves of the documents table
    (doc_id parity split) — the federation fixture.  Federated search
    over them must equal the monolithic index's ranking exactly, so
    the ORACLE is the unchanged bm25_topk SQL over all documents."""
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.pages import documents_as_pages

    key = (id(spark), sf_dir)
    if key not in _FED_CACHE:
        shards = []
        for parity in (0, 1):
            docs = documents_as_pages(spark, sf_dir).filter(
                F.col("doc_id") % 2 == parity
            )
            idx = build_index(docs, id_col="doc_id", analyzer="tokens")
            renamed = replace(
                idx,
                postings=idx.postings.withColumnRenamed(
                    "doc_id", "nat_id"
                ),
                doc_lens=idx.doc_lens.withColumnRenamed(
                    "doc_id", "nat_id"
                ),
                id_col="nat_id",
                cached=(),
            )
            cidx = compact_index(renamed, n_segments=8)
            cidx.segments = cidx.segments.cache()
            cidx.doc_map = cidx.doc_map.cache()
            shards.append(cidx)
        _FED_CACHE[key] = shards
    return _FED_CACHE[key]


def _search_docs_wand(spark, sf_dir, query, offset=0, limit=10,
                      prune=True):
    from search_engine_spark.plans.wand import search_compact

    cidx = _docs_compact(spark, sf_dir)
    res = search_compact(cidx, query, offset=offset, limit=limit,
                         analyzer="tokens", prune=prune)
    return res.select(
        F.col("nat_id").alias("doc_id"),
        F.round("score", 6).alias("score"),
        F.col("rn").cast("int").alias("rn"),
    )


def _docs_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_engine_spark.sources.pages import documents_as_pages

    return documents_as_pages(spark, sf_dir)


# words appended to a reindexed page's text (R25 upsert fixture);
# lowercase letters only so both tokenizers see exactly 3 new tokens
REINDEX_MARKER = " reindexed marker reindexed"
_INCR_CACHE: dict = {}
# per-step wall times of the last _incremental_dir run: bench.py
# splits the headline `incremental_lifecycle` line into engine
# maintenance ops vs contract-checkpoint materialization (the full-
# index decodes written ONLY so DuckDB can hash-check each state)
_INCR_TIMINGS: dict = {}


def _incremental_dir(spark: SparkSession, sf_dir: str) -> str:
    """Run the FULL incremental-maintenance lifecycle once per
    (spark, sf_dir) and return its index directory.

    base build (doc_id%10<8) → append (%10==8) → append (%10==9)
    → tombstone (%9==0 of base; R23/R24) → reindex-upsert (%9==4 of
    base with text+REINDEX_MARKER; R25) → merge_delta_epochs (three
    LSM delta epochs → one; N3) → [checkpoint: decoded live postings]
    → vacuum (tombstones physically dropped; N3/S8) → [checkpoints:
    decoded final postings + maintained term_stats].

    Checkpoint frames are MATERIALIZED to parquet inside the index
    dir before the next mutation step — Spark plans are lazy and the
    maintenance ops rewrite the very files a decoded-postings plan
    would read.  The DuckDB oracles recompute each checkpoint from
    the logical final corpus (all documents, minus tombstoned, with
    reindexed text swapped in), so the engine's most state-heavy path
    — df merge on append, decode-based df decrement on tombstone,
    delta-epoch consolidation, vacuum rebuild — is hash-checked
    end-to-end.  Reference semantics: IndexRepository.java:23-36,
    LemmaServiceImpl.java:103-115, RecursiveWebParser.java:94-117."""
    import tempfile

    key = (id(spark), sf_dir)
    if key in _INCR_CACHE:
        return _INCR_CACHE[key]

    from search_engine_spark.config import BM25Config, EngineConfig
    from search_engine_spark.operators.compact import decode_segments
    from search_engine_spark.plans.build import (
        build_and_write,
        read_segments,
    )
    from search_engine_spark.plans.incremental import (
        append_pages,
        merge_delta_epochs,
        read_tombstones,
        reindex_pages,
        tombstone_urls,
        vacuum,
    )

    out = tempfile.mkdtemp(prefix="incr_contract_")
    import time as _time

    steps: dict = {}
    _t = [_time.time()]

    def _mark(name: str) -> None:
        now = _time.time()
        steps[name] = round(now - _t[0], 3)
        _t[0] = now

    pages = _docs_enriched(spark, sf_dir).select(
        "doc_id", "url", "text", "lang"
    )
    base = pages.filter(F.col("doc_id") % 10 < 8)
    config = EngineConfig(bm25=BM25Config(k1=K1, b=B), index_buckets=8)
    build_and_write(
        spark, base.drop("doc_id"), out,
        analyzer="tokens", config=config, n_segments=8,
    )
    _mark("base_build")
    # keep every lifecycle generation readable: checkpoint 3 below
    # time-travels back to gen 1 (the base corpus) after all
    # mutations.  This is itself the commit that becomes gen 1.
    from search_engine_spark.plans.incremental import (
        set_snapshot_retention,
    )

    set_snapshot_retention(out, 16)
    for parity in (8, 9):
        append_pages(
            spark, out,
            pages.filter(F.col("doc_id") % 10 == parity).drop("doc_id"),
        )
    _mark("appends")
    dead_urls = [
        r["url"]
        for r in base.filter(F.col("doc_id") % 9 == 0)
        .select("url").collect()
    ]
    tombstone_urls(spark, out, dead_urls)
    _mark("tombstone")
    modified = base.filter(F.col("doc_id") % 9 == 4).withColumn(
        "text", F.concat(F.col("text"), F.lit(REINDEX_MARKER))
    )
    reindex_pages(spark, out, modified.drop("doc_id"))
    _mark("reindex")
    merged = merge_delta_epochs(spark, out)
    assert merged["merged_epochs"] >= 2, merged
    _mark("lsm_merge")

    nat = F.regexp_extract(F.col("url"), r"([0-9]+)$", 1).cast("long")

    def _nat_postings(segs, tomb=None, meta=None):
        # tombstones anti-join on the DENSE id (a reindexed url's old
        # and new versions share the natural id — only the old dense
        # id is dead), exactly as the query path applies them
        posts = decode_segments(segs)
        if tomb is not None:
            posts = posts.join(
                F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
            )
        from search_engine_spark.plans.build import (
            load_stats,
            table_path,
        )

        if meta is None:
            meta = load_stats(spark, out)
        docs_map = spark.read.parquet(table_path(out, "docs", meta))
        # time-travel mask: the docs table is additive in place, so a
        # snapshot read filters by its archived id-segment cursor
        # (open_index_at applies the same ceiling)
        docs_map = docs_map.filter(
            F.col("doc_id")
            < (int(meta.get("next_id_segment", 1 << 20)) << 40)
        )
        return posts.join(docs_map.select("doc_id", "url"), "doc_id").select(
            nat.alias("doc_id"), "term",
            F.col("tf").cast("long").alias("tf"),
        )

    # checkpoint 1: live postings after LSM consolidation
    _nat_postings(
        read_segments(spark, out), read_tombstones(spark, out)
    ).write.mode("overwrite").parquet(
        os.path.join(out, "check_postings_merged")
    )
    _mark("checkpoint_merged")

    vacuum(spark, out)
    _mark("vacuum")
    # checkpoint 2: postings after the physical rewrite
    _nat_postings(read_segments(spark, out)).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "check_postings_final"))
    _mark("checkpoint_final")

    # checkpoint 3: TIME TRAVEL — generation 1 (base corpus, before
    # any append/tombstone/reindex) read back through the archived
    # snapshot descriptor AFTER all mutations ran.  snapshot_retention
    # was raised right after the build, so vacuum's expiry kept the
    # gen-1 dirs; the oracle recomputes postings from the ORIGINAL
    # doc_id%10<8 corpus slice.
    from search_engine_spark.plans.incremental import (
        snapshot_descriptor,
    )

    meta1 = snapshot_descriptor(out, 1)
    _nat_postings(
        read_segments(spark, out, meta1),
        read_tombstones(spark, out, meta1),
        meta=meta1,
    ).write.mode("overwrite").parquet(
        os.path.join(out, "check_postings_gen1")
    )
    _mark("checkpoint_gen1")
    ops = ("base_build", "appends", "tombstone", "reindex",
           "lsm_merge", "vacuum")
    steps["engine_ops_sec"] = round(
        sum(v for k, v in steps.items() if k in ops), 3
    )
    steps["checkpoints_sec"] = round(
        sum(v for k, v in steps.items()
            if k.startswith("checkpoint_")), 3
    )
    _INCR_TIMINGS[key] = steps

    _INCR_CACHE[key] = out
    return out


def _incremental_pos_dir(spark: SparkSession, sf_dir: str) -> str:
    """Positional-index co-maintenance lifecycle (its own cached dir
    so the headline `incremental_lifecycle` bench line stays
    comparable across rounds): build + compressed positional index →
    append (%10==8; positional rows co-appended) → reindex-upsert
    (%9==4 of base, text+marker; stale rows become dead-id-keyed) →
    tombstone (%9==0 of base) → vacuum (positional co-rewrite drops
    every dead row).  The checkpoint decodes the ENTIRE post-vacuum
    positional dir to (natural doc_id, term, pos); the DuckDB oracle
    recomputes token positions from the logical final corpus with
    unnest-with-ordinality.  Green means tokenize→delta-varint pack →
    per-epoch co-append → vacuum co-rewrite is position-exact
    end-to-end."""
    import tempfile

    key = (id(spark), sf_dir, "positions")
    if key in _INCR_CACHE:
        return _INCR_CACHE[key]

    from search_engine_spark.functions.textproc import tokens_col
    from search_engine_spark.operators.phrases import (
        decode_positions,
        write_compact_positional_index,
    )
    from search_engine_spark.plans.build import (
        load_stats,
        table_path,
    )
    from search_engine_spark.plans.incremental import (
        append_pages,
        reindex_pages,
        tombstone_urls,
        vacuum,
    )

    out = tempfile.mkdtemp(prefix="incr_pos_contract_")
    pages = _docs_enriched(spark, sf_dir).select(
        "doc_id", "url", "text", "lang"
    )
    base = pages.filter(F.col("doc_id") % 10 < 8)
    from search_engine_spark.config import BM25Config, EngineConfig

    config = EngineConfig(bm25=BM25Config(k1=K1, b=B), index_buckets=4)
    from search_engine_spark.plans.build import build_and_write

    build_and_write(
        spark, base.drop("doc_id"), out,
        analyzer="tokens", config=config, n_segments=4,
    )
    docs_map = spark.read.parquet(
        table_path(out, "docs", load_stats(spark, out))
    ).select("doc_id", "url")
    pos_dir = out + "/positions"
    write_compact_positional_index(
        base.drop("doc_id")
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .join(docs_map, "url"),
        pos_dir, n_buckets=4, id_col="doc_id",
    )
    append_pages(
        spark, out, pages.filter(F.col("doc_id") % 10 == 8).drop("doc_id")
    )
    modified = base.filter(F.col("doc_id") % 9 == 4).withColumn(
        "text", F.concat(F.col("text"), F.lit(REINDEX_MARKER))
    )
    reindex_pages(spark, out, modified.drop("doc_id"))
    dead_urls = [
        r["url"]
        for r in base.filter(F.col("doc_id") % 9 == 0)
        .select("url").collect()
    ]
    tombstone_urls(spark, out, dead_urls)
    vacuum(spark, out)

    nat = F.regexp_extract(F.col("url"), r"([0-9]+)$", 1).cast("long")
    docs_final = spark.read.parquet(
        table_path(out, "docs", load_stats(spark, out))
    ).select("doc_id", "url")
    (
        decode_positions(spark.read.parquet(pos_dir), id_col="doc_id")
        .join(docs_final, "doc_id")
        .select(
            nat.alias("doc_id"), "term",
            F.col("pos").cast("long").alias("pos"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "check_positions_final"))
    )
    _INCR_CACHE[key] = out
    return out


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _search_docs(spark, sf_dir, query, sites=None, offset=0, limit=10,
                 exclude_terms=None, candidates="rarest"):
    from search_engine_spark.plans.search import search

    idx = _docs_index(spark, sf_dir)
    res = search(idx, query, sites=sites, offset=offset, limit=limit,
                 analyzer="tokens", exclude_terms=exclude_terms,
                 candidates=candidates)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"),
        F.col("rn").cast("int").alias("rn"),
    )


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB side) — mirror the engine exactly
# ---------------------------------------------------------------------------

_TOKS = r"""
toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(
             trim(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g')),
             '\s+'),
           t -> t <> '')) AS term
  FROM documents
)
"""

_POSTINGS = "postings AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)"

# positional twin of _TOKS: DuckDB zips parallel unnests, so pairing
# unnest(toklist) with unnest(range(len(toklist))) yields (term, pos)
_TOKS_POS = r"""
toks_pos AS (
  SELECT doc_id,
         unnest(toklist) AS term,
         unnest(range(len(toklist))) AS pos
  FROM (
    SELECT doc_id,
           list_filter(
             string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g')),
               '\s+'),
             t -> t <> '') AS toklist
    FROM documents)
)
"""


def _phrase_ctes(terms: list[str]) -> str:
    """offsets/occ/tfd CTE chain mirroring operators/phrases.py."""
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(terms))
    return f"""
offsets(i, term) AS (VALUES {vals}),
occ AS (
  SELECT tp.doc_id, tp.pos - o.i AS start
  FROM toks_pos tp JOIN offsets o USING (term)
  WHERE tp.pos - o.i >= 0
  GROUP BY 1, 2
  HAVING count(DISTINCT o.i) = {len(terms)}
),
tfd AS (SELECT doc_id, count(*) AS phrase_tf FROM occ GROUP BY 1)
"""


def _gram_cte(n: int) -> str:
    """grams{n}/cnt{n}/agg{n} CTE chain over a ``base(doc_id,
    toklist)`` relation — mirrors operators/curation._gram_counts."""
    return f"""
grams{n} AS (
  SELECT doc_id,
         unnest(list_transform(
           range(greatest(len(toklist) - {n - 1}, 0)),
           i -> array_to_string(toklist[i+1:i+{n}], ' '))) AS gram
  FROM base),
cnt{n} AS (
  SELECT doc_id, gram, count(*) AS c FROM grams{n} GROUP BY 1, 2),
agg{n} AS (
  SELECT doc_id, max(c) AS max_c,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
  FROM cnt{n} GROUP BY 1)
"""


def _frac_sql(col: str, n: int, len_expr: str = "l.n_tokens") -> str:
    """curation._frac in SQL: coverage fraction, capped, null→0."""
    return (
        f"round(CASE WHEN {col} IS NULL OR {len_expr} <= 0 THEN 0.0 "
        f"ELSE least({col} * {n}.0 / {len_expr}, 1.0) END, 6)"
    )


def _gopher_core_sql(stopword_list: str) -> str:
    """gram2/gram3/m CTE chain over a ``base(doc_id, low, toklist)``
    relation — the metric block shared by the standalone gate oracle
    and the composed-pipeline oracle."""
    return f"""{_gram_cte(2)}, {_gram_cte(3)},
        m AS (
          SELECT b.doc_id,
                 CAST(len(toklist) AS BIGINT) AS n_tokens,
                 round(CASE WHEN len(toklist) > 0
                       THEN list_aggregate(
                              list_transform(toklist, t -> length(t)),
                              'sum') * 1.0 / len(toklist)
                       ELSE 0.0 END, 6) AS mean_word_len,
                 round(CASE WHEN length(low) > 0
                       THEN length(regexp_replace(
                              low, '[a-z0-9а-яё\\s]', '', 'g'))
                            * 1.0 / length(low)
                       ELSE 0.0 END, 6) AS symbol_ratio,
                 CAST(len(list_filter(
                   toklist, t -> t IN ({stopword_list})))
                   AS BIGINT) AS n_stopwords,
                 {_frac_sql('a2.max_c', 2, 'len(b.toklist)')}
                   AS top_2gram_frac,
                 {_frac_sql('a3.dup_c', 3, 'len(b.toklist)')}
                   AS dup_3gram_frac
          FROM base b
          LEFT JOIN agg2 a2 USING (doc_id)
          LEFT JOIN agg3 a3 USING (doc_id))"""


def _gopher_keep_cond() -> str:
    from search_engine_spark.operators.curation import (
        GATE_MAX_DUP3GRAM_FRAC,
        GATE_MAX_MEAN_WORD_LEN,
        GATE_MAX_SYMBOL_RATIO,
        GATE_MAX_TOKENS,
        GATE_MAX_TOP2GRAM_FRAC,
        GATE_MIN_MEAN_WORD_LEN,
        GATE_MIN_STOPWORDS,
        GATE_MIN_TOKENS,
    )

    return f"""(n_tokens >= {GATE_MIN_TOKENS}
                AND n_tokens <= {GATE_MAX_TOKENS}
                AND mean_word_len >= {GATE_MIN_MEAN_WORD_LEN}
                AND mean_word_len <= {GATE_MAX_MEAN_WORD_LEN}
                AND symbol_ratio <= {GATE_MAX_SYMBOL_RATIO}
                AND n_stopwords >= {GATE_MIN_STOPWORDS}
                AND top_2gram_frac <= {GATE_MAX_TOP2GRAM_FRAC}
                AND dup_3gram_frac <= {GATE_MAX_DUP3GRAM_FRAC})"""


def _extract_links_sql() -> str:
    """DuckDB mirror of functions/textproc.extract_links_col over the
    same synthesized per-doc HTML as the ``extract_links`` query."""
    from search_engine_spark.functions.textproc import (
        FORBIDDEN_URL_TYPES,
    )

    forb = ", ".join(f"'{t}'" for t in FORBIDDEN_URL_TYPES)
    return f"""
        WITH pg AS (
          SELECT doc_id,
                 'https://' || source || '.example' AS root,
                 'https://' || source || '.example/p' || doc_id AS url,
                 '<html><body><a href="/sec/' || (doc_id % 5)
                   || '">r</a><a href="https://' || source
                   || '.example/page' || (doc_id % 7)
                   || '">a</a><a href="https://other.example/q">o</a>'
                   || '<a href="/img/' || doc_id
                   || '.png">i</a><a href="/sec/' || (doc_id % 5)
                   || '">dup</a><a href="https://' || source
                   || '.example/p' || doc_id
                   || '">self</a></body></html>' AS html
          FROM documents),
        raw AS (
          SELECT doc_id, root, url,
                 regexp_extract_all(html,
                   '(?is)<a\\s[^>]*?href\\s*=\\s*["'']([^"'']*)["'']',
                   1) AS hrefs
          FROM pg),
        absolutized AS (
          SELECT doc_id, root, url,
                 list_transform(hrefs, h -> CASE
                    WHEN starts_with(h, 'http') THEN h
                    WHEN starts_with(h, '/') THEN root || h
                    END) AS links
          FROM raw),
        kept AS (
          SELECT doc_id,
                 list_distinct(list_filter(links, h ->
                    h IS NOT NULL
                    AND starts_with(h, root || '/')
                    AND h <> root || '/'
                    AND h <> url
                    AND len(list_filter([{forb}],
                          t -> contains(h, t))) = 0)) AS links
          FROM absolutized)
        SELECT doc_id, unnest(links) AS link FROM kept
    """


_ANCHOR_HTML_SQL = """
          SELECT doc_id,
                 'https://corpus.example' AS root,
                 'https://corpus.example/p' || doc_id AS url,
                 '<html><body><a href="/p' || ((doc_id * 3 + 1) % 100)
                   || '">fast dup</a><a href="/p'
                   || ((doc_id * 7 + 2) % 100)
                   || '">key <b>dup</b></a>'
                   || '<a href="https://other.example/x">fast</a>'
                   || '<a href="/img/' || doc_id || '.png">key</a>'
                   || '<a href="/p' || doc_id
                   || '">dup</a></body></html>' AS html
          FROM documents
"""


def _anchor_postings_sql() -> str:
    """DuckDB mirror of operators/anchors.anchor_postings over the
    same synthesized per-doc HTML as the ``anchor_postings`` query
    (same-site absolutization + forbidden-type/self filters, tag
    strip, tokens-analyzer tokenization, (target, term) counts)."""
    from search_engine_spark.functions.textproc import (
        FORBIDDEN_URL_TYPES,
    )

    forb = ", ".join(f"'{t}'" for t in FORBIDDEN_URL_TYPES)
    return f"""
        pg AS ({_ANCHOR_HTML_SQL}),
        pairs AS (
          SELECT doc_id, root, url,
                 unnest(regexp_extract_all(html,
                   '(?is)<a\\s[^>]*?href\\s*=\\s*["'']([^"'']*)["''][^>]*>(.*?)</a>',
                   1)) AS href,
                 unnest(regexp_extract_all(html,
                   '(?is)<a\\s[^>]*?href\\s*=\\s*["'']([^"'']*)["''][^>]*>(.*?)</a>',
                   2)) AS anchor
          FROM pg),
        absolutized AS (
          SELECT doc_id, root, url,
                 CASE WHEN starts_with(href, 'http') THEN href
                      WHEN starts_with(href, '/') THEN root || href
                 END AS link,
                 regexp_replace(anchor, '<[^>]*>', ' ', 'g') AS anchor
          FROM pairs),
        kept AS (
          SELECT link, anchor FROM absolutized
          WHERE link IS NOT NULL
            AND starts_with(link, root || '/')
            AND link <> root || '/'
            AND link <> url
            AND len(list_filter([{forb}],
                  t -> contains(link, t))) = 0),
        atoks AS (
          SELECT link AS target,
                 unnest(list_filter(
                   string_split_regex(
                     trim(regexp_replace(lower(anchor),
                                         '[^a-z\\s]', ' ', 'g')),
                     '\\s+'),
                   t -> t <> '')) AS term
          FROM kept),
        anchor_postings AS (
          SELECT target, term, count(*) AS tf
          FROM atoks GROUP BY 1, 2)
    """


def _anchored_search_sql(terms: list[str], w: float,
                         limit: int) -> str:
    """DuckDB mirror of operators/anchors.search_anchored: simple-
    BM25F merge of body postings with the synthesized anchor field
    (wtf = tf_body + w·tf_anchor before saturation, wlen likewise,
    Robertson IDF over any-field df restricted to corpus docs)."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
{_anchor_postings_sql()},
a_mapped AS (
  SELECT CAST(regexp_extract(target, 'p(\\d+)$', 1) AS BIGINT)
           AS doc_id,
         term, tf
  FROM anchor_postings),
qterms AS (
  SELECT unnest([{term_list}]) AS term
  EXCEPT SELECT term FROM stop),
alens AS (
  SELECT doc_id, sum(tf) AS anchor_len FROM a_mapped GROUP BY 1),
wlens AS (
  SELECT l.doc_id,
         l.doc_len + {w} * coalesce(al.anchor_len, 0) AS wlen
  FROM lens l LEFT JOIN alens al USING (doc_id)),
nn AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT avg(wlen) FROM wlens) AS avg_wlen),
body AS (
  SELECT doc_id, term, tf FROM postings
  WHERE term IN (SELECT term FROM qterms)),
anch AS (
  SELECT doc_id, term, tf FROM a_mapped
  WHERE term IN (SELECT term FROM qterms)),
merged AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         coalesce(b.term, a.term) AS term,
         coalesce(b.tf, 0)::DOUBLE
           + {w} * coalesce(a.tf, 0)::DOUBLE AS wtf
  FROM body b
  FULL OUTER JOIN anch a
    ON b.doc_id = a.doc_id AND b.term = a.term),
si AS (
  SELECT m.doc_id, m.term, m.wtf, wl.wlen
  FROM merged m JOIN wlens wl USING (doc_id)),
dfreq AS (SELECT term, count(*) AS df FROM si GROUP BY 1),
qt AS (
  SELECT d.term,
         ln((nn.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfreq d CROSS JOIN nn
  WHERE (nn.n - d.df + 0.5) / (d.df + 0.5) > 0),
scored AS (
  SELECT si.doc_id,
         sum(qt.idf * (si.wtf / si.wlen) * ({K1} + 1)
             / ((si.wtf / si.wlen)
                + {K1} * (1 - {B} + {B} * si.wlen / nn.avg_wlen)))
           AS score
  FROM si JOIN qt USING (term) CROSS JOIN nn
  GROUP BY si.doc_id),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _qt_cte(terms: list[str]) -> str:
    """Surviving-query-term CTE (stop-filtered, positive-idf) shared
    by the impact/pruned oracle SQL — mirrors _bm25_sql's qt."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
)"""


# per-posting u (plans/impact.impact_u_col): the idf-free BM25 factor,
# arithmetic written in EXACTLY the Spark expression's operation order
_PU = f"""
pu AS (
  SELECT p.term, p.doc_id, p.tf, l.doc_len,
         (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
           / ((p.tf::DOUBLE / l.doc_len)
              + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len)) AS u
  FROM postings p
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN nn
)"""

_NN = """
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len)
"""


def _impact_topk_sql(terms: list[str], bits: int, limit: int) -> str:
    """DuckDB mirror of plans/impact.impact_topk: global-u_max 2^bits
    quantization, score = sum(idf * q) over union candidates."""
    levels = 1 << bits
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
{_qt_cte(terms)}, {_PU},
umax AS (SELECT max(u) AS u_max FROM pu),
quant AS (
  SELECT pu.term, pu.doc_id,
         least(CAST(floor(pu.u / umax.u_max * {float(levels)}) AS INTEGER) + 1,
               {levels}) AS q
  FROM pu CROSS JOIN umax),
scored AS (
  SELECT qn.doc_id, sum(qt.idf * qn.q) AS score
  FROM quant qn JOIN qt ON qt.term = qn.term
  GROUP BY qn.doc_id),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _bm25_pruned_sql(terms: list[str], keep: int, limit: int) -> str:
    """DuckDB mirror of search() over plans/impact.prune_postings:
    per-term top-``keep`` postings by (u desc, doc_id asc); stats
    (df / N / avg_len / stoplist) stay full-corpus, so surviving
    postings score exactly as in bm25_topk."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
{_qt_cte(terms)}, {_PU},
pruned AS (
  SELECT term, doc_id, tf FROM (
    SELECT term, doc_id, tf,
           row_number() OVER (PARTITION BY term
                              ORDER BY u DESC, doc_id ASC) AS rnk
    FROM pu)
  WHERE rnk <= {keep}),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (
  SELECT p.doc_id FROM pruned p JOIN rarest r ON p.term = r.term),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN pruned p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _rescore_sql(
    terms: list[str], bits: int, first_k: int, limit: int
) -> str:
    """DuckDB mirror of plans/impact.rescore_topk: quantized-impact
    first pass selects top-``first_k`` candidates, exact BM25 (same
    operation order as _bm25_sql's scorer) re-ranks them."""
    levels = 1 << bits
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
{_qt_cte(terms)}, {_PU},
umax AS (SELECT max(u) AS u_max FROM pu),
quant AS (
  SELECT pu.term, pu.doc_id,
         least(CAST(floor(pu.u / umax.u_max * {float(levels)}) AS INTEGER) + 1,
               {levels}) AS q
  FROM pu CROSS JOIN umax),
fscored AS (
  SELECT qn.doc_id, sum(qt.idf * qn.q) AS fscore
  FROM quant qn JOIN qt ON qt.term = qn.term
  GROUP BY qn.doc_id),
franked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY fscore DESC, doc_id ASC) AS frn
  FROM fscored),
cand AS (SELECT doc_id FROM franked WHERE frn <= {first_k}),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _pl2_sql(terms: list[str], c: float, limit: int) -> str:
    """DuckDB mirror of plans/dfr.search_pl2: PL2
    divergence-from-randomness (Poisson, Laplace, normalization 2),
    union candidates, log2 expressed as ln·(1/ln 2) with the SAME
    python double literal as the Spark side."""
    import math as _math

    inv = repr(1.0 / _math.log(2.0))
    twopi = repr(2.0 * _math.pi)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
qt AS (SELECT p.term, CAST(sum(p.tf) AS DOUBLE) AS cf
       FROM postings p
       WHERE p.term IN ({term_list})
         AND p.term NOT IN (SELECT term FROM stop)
       GROUP BY 1),
pt AS (
  SELECT p.doc_id, p.term,
         p.tf::DOUBLE * (ln(1 + {c} * nn.avg_len / l.doc_len) * {inv})
           AS tfn
  FROM postings p
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN nn
  WHERE p.term IN (SELECT term FROM qt)),
scored AS (
  SELECT pt.doc_id,
         sum((pt.tfn * ln(pt.tfn / (qt.cf / nn.n)) * {inv}
              + ((qt.cf / nn.n) - pt.tfn) * {inv}
              + 0.5 * ln({twopi} * pt.tfn) * {inv})
             / (pt.tfn + 1.0)) AS score
  FROM pt JOIN qt ON qt.term = pt.term CROSS JOIN nn
  GROUP BY 1),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _sdm_sql(
    toks: list[str],
    mu: float = 2500.0,
    lambdas: tuple[float, float, float] = (0.85, 0.10, 0.05),
    window: int = 8,
    limit: int = 10,
) -> str:
    """DuckDB mirror of plans/sdm.search_sdm: Dirichlet-smoothed
    unigram + ordered-adjacent + unordered-window features over the
    query token sequence, union candidates, pair-count semantics."""
    from search_engine_spark.plans.sdm import query_bigrams

    lt, lo, lu = lambdas
    terms = sorted(set(toks))
    bigrams = query_bigrams(toks)
    term_list = ", ".join(f"'{t}'" for t in terms)

    pair_ctes, pair_joins, pair_exprs = [], [], []
    for i, (a, b) in enumerate(bigrams):
        pair_ctes.append(f"""
po{i} AS (
  SELECT a.doc_id, count(*) AS n
  FROM toks_pos a JOIN toks_pos b
    ON b.doc_id = a.doc_id AND a.term = '{a}' AND b.term = '{b}'
   AND b.pos = a.pos + 1
  GROUP BY 1),
pu{i} AS (
  SELECT a.doc_id, count(*) AS n
  FROM toks_pos a JOIN toks_pos b
    ON b.doc_id = a.doc_id AND a.term = '{a}' AND b.term = '{b}'
   AND abs(b.pos - a.pos) <= {window - 1} AND b.pos <> a.pos
  GROUP BY 1),
pocf{i} AS (SELECT coalesce(sum(n), 0) AS cf FROM po{i}),
pucf{i} AS (SELECT coalesce(sum(n), 0) AS cf FROM pu{i})""")
        pair_joins.append(
            f"LEFT JOIN po{i} ON po{i}.doc_id = c.doc_id\n"
            f"  LEFT JOIN pu{i} ON pu{i}.doc_id = c.doc_id\n"
            f"  CROSS JOIN pocf{i} CROSS JOIN pucf{i}"
        )
        pair_exprs.append(
            f"+ CASE WHEN pocf{i}.cf > 0 THEN {lo} * ln("
            f"(coalesce(po{i}.n, 0) + {mu} * (pocf{i}.cf / tot.c))"
            f" / (l.doc_len + {mu})) ELSE 0 END\n"
            f"         + CASE WHEN pucf{i}.cf > 0 THEN {lu} * ln("
            f"(coalesce(pu{i}.n, 0) + {mu} * (pucf{i}.cf / tot.c))"
            f" / (l.doc_len + {mu})) ELSE 0 END"
        )

    term_joins, term_logs = [], []
    for i, t in enumerate(terms):
        term_joins.append(
            f"LEFT JOIN (SELECT doc_id, tf FROM utf WHERE term = '{t}')"
            f" t{i} ON t{i}.doc_id = c.doc_id\n"
            f"  CROSS JOIN (SELECT CAST(cf AS DOUBLE) AS cf FROM ucf"
            f" WHERE term = '{t}') cf{i}"
        )
        term_logs.append(
            f"ln((coalesce(t{i}.tf, 0) + {mu} * (cf{i}.cf / tot.c))"
            f" / (l.doc_len + {mu}))"
        )

    return f"""
WITH {_TOKS_POS},
plens AS (
  SELECT d.doc_id, coalesce(t.c, 0) AS doc_len
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks_pos GROUP BY 1) t
  USING (doc_id)),
tot AS (SELECT CAST(sum(doc_len) AS DOUBLE) AS c FROM plens),
utf AS (SELECT doc_id, term, count(*) AS tf FROM toks_pos
        WHERE term IN ({term_list}) GROUP BY 1, 2),
ucf AS (SELECT term, sum(tf) AS cf FROM utf GROUP BY 1),
{",".join(pair_ctes)},
cand AS (SELECT DISTINCT doc_id FROM utf),
scored AS (
  SELECT c.doc_id,
         {lt} * ({" + ".join(term_logs)})
         {" ".join(pair_exprs)}
         AS score
  FROM cand c
  JOIN plens l ON l.doc_id = c.doc_id
  CROSS JOIN tot
  {" ".join(term_joins)}
  {" ".join(pair_joins)}),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _qpp_pre_sql(terms: list[str]) -> str:
    """DuckDB mirror of plans/qpp.preretrieval_predictors for the
    flagship query: IDF moments, simplified clarity (SCS), avg SCQ."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
{_qt_cte(terms)},
qcf AS (SELECT p.term, CAST(sum(p.tf) AS DOUBLE) AS cf
        FROM postings p
        WHERE p.term IN (SELECT term FROM qt) GROUP BY 1),
tot AS (SELECT CAST(sum(doc_len) AS DOUBLE) AS c FROM lens),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM qt)
SELECT CAST(m.m AS INTEGER) AS n_terms,
       round(sum(qt.idf) / m.m, 6) AS avg_idf,
       round(max(qt.idf), 6) AS max_idf,
       round(sum((1.0 / m.m)
                 * log2((1.0 / m.m) / (qcf.cf / tot.c))), 6) AS scs,
       round(sum((1 + ln(qcf.cf)) * qt.idf) / m.m, 6) AS avg_scq
FROM qt JOIN qcf ON qcf.term = qt.term CROSS JOIN tot CROSS JOIN m
GROUP BY m.m
"""


def _clarity_sql(terms: list[str], k: int) -> str:
    """DuckDB mirror of plans/qpp.clarity_score: KL divergence of the
    BM25 top-``k`` relevance model from the collection model."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
{_qt_cte(terms)},
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (
  SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id),
top AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored)
  WHERE rn <= {k}),
ntop AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM top),
prel AS (
  SELECT p.term,
         sum((p.tf::DOUBLE / l.doc_len) / ntop.c) AS pr
  FROM postings p
  JOIN top USING (doc_id)
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN ntop
  GROUP BY 1),
cfs AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf
        FROM postings
        WHERE term IN (SELECT term FROM prel) GROUP BY 1),
tot AS (SELECT CAST(sum(doc_len) AS DOUBLE) AS c FROM lens)
SELECT round(sum(prel.pr * log2(prel.pr / (cfs.cf / tot.c))), 6)
         AS clarity
FROM prel JOIN cfs USING (term) CROSS JOIN tot
"""


def _bm25var_sql(
    terms: list[str], variant: str, delta: float, limit: int
) -> str:
    """DuckDB mirror of plans/bm25var.search_bm25_variant (BM25+ /
    BM25L, rarest-term candidates) — same CTEs as _bm25_sql, variant
    scoring expression in the Spark operation order."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    tfn = "(p.tf::DOUBLE / l.doc_len)"
    norm = f"(1 - {B} + {B} * l.doc_len / nn.avg_len)"
    if variant == "plus":
        expr = (
            f"qt.idf * ({tfn} * ({K1} + 1)"
            f" / ({tfn} + {K1} * {norm}) + {delta})"
        )
    else:
        cp = f"({tfn} / {norm})"
        expr = (
            f"qt.idf * ({K1} + 1) * ({cp} + {delta})"
            f" / ({K1} + {cp} + {delta})"
        )
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP}, {_NN},
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (
  SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term),
scored AS (
  SELECT c.doc_id, sum({expr}) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _passage_sql(terms: list[str], window: int, limit: int) -> str:
    """DuckDB mirror of plans/passage.passage_topk: max-passage BM25
    over disjoint ``window``-token spans; passage lengths from
    doc_len arithmetic, document-level Robertson IDF."""
    return f"""
WITH {_TOKS}, {_TOKS_POS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
{_NN}, {_qt_cte(terms)},
wtf AS (
  SELECT doc_id, CAST(floor(pos / {window}) AS INTEGER) AS w,
         term, count(*) AS tf
  FROM toks_pos
  WHERE term IN (SELECT term FROM qt)
  GROUP BY 1, 2, 3),
wtf2 AS (
  SELECT wtf.doc_id, wtf.w, wtf.term, wtf.tf,
         CASE WHEN (wtf.w + 1) * {window} <= l.doc_len
              THEN CAST({window} AS DOUBLE)
              ELSE CAST(l.doc_len - wtf.w * {window} AS DOUBLE)
         END AS plen
  FROM wtf JOIN lens l ON l.doc_id = wtf.doc_id),
ps AS (
  SELECT t.doc_id, t.w,
         sum(qt.idf * (t.tf::DOUBLE / t.plen) * ({K1} + 1)
             / ((t.tf::DOUBLE / t.plen)
                + {K1} * (1 - {B} + {B} * t.plen / {window}))) AS pscore
  FROM wtf2 t JOIN qt ON qt.term = t.term
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, w AS passage, pscore AS score FROM (
    SELECT doc_id, w, pscore,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY pscore DESC, w ASC) AS r
    FROM ps)
  WHERE r = 1),
ranked AS (
  SELECT doc_id, passage, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM best)
SELECT doc_id, passage, score, rn FROM ranked WHERE rn <= {limit}
"""


def _ltr_sql(terms: list[str], limit: int) -> str:
    """DuckDB mirror of plans/ltr.ltr_features for ONE query —
    rarest-term candidates, per-doc BM25 + match statistics."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (
  SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term),
si AS (
  SELECT c.doc_id, p.term, p.tf, qt.idf, l.doc_len,
         qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
           / ((p.tf::DOUBLE / l.doc_len)
              + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))
           AS term_score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn),
feats AS (
  SELECT doc_id,
         sum(term_score) AS bm25_raw,
         CAST(count(*) AS BIGINT) AS matched_terms,
         CAST((SELECT count(*) FROM qt) AS INTEGER) AS n_query_terms,
         count(*)::DOUBLE
           / (SELECT count(*) FROM qt)::DOUBLE AS coverage,
         CAST(sum(tf) AS BIGINT) AS sum_tf,
         CAST(max(tf) AS BIGINT) AS max_tf,
         round(sum(idf), 6) AS idf_sum,
         round(max(idf), 6) AS idf_max,
         CAST(max(doc_len) AS BIGINT) AS doc_len
  FROM si GROUP BY doc_id),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY bm25_raw DESC, doc_id ASC)
           AS rn
  FROM feats)
SELECT doc_id, round(bm25_raw, 6) AS bm25, matched_terms,
       n_query_terms, coverage, sum_tf, max_tf, idf_sum, idf_max,
       doc_len
FROM ranked WHERE rn <= {limit}
"""


def _gopher_gate_sql(toks_list: str, stopword_list: str) -> str:
    return f"""
        WITH base AS (
          SELECT doc_id, lower(text) AS low,
                 {toks_list} AS toklist
          FROM documents),
        {_gopher_core_sql(stopword_list)}
        SELECT *, {_gopher_keep_cond()} AS keep FROM m
    """

_LENS = """
lens AS (
  SELECT d.doc_id, d.source AS site, coalesce(t.c, 0) AS doc_len
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t
  USING (doc_id)
)
"""

_TSTATS = "tstats AS (SELECT term, count(*) AS df FROM postings GROUP BY 1)"

_STOP = f"stop AS (SELECT term FROM tstats ORDER BY df DESC, term ASC LIMIT {STOPLIST_SIZE})"


def _cand_body(mode: str, cand_site: str, cand_not: str) -> str:
    """Candidate CTE body for _bm25_sql: reference R13 rarest-term
    membership, strict-AND ("all": docs containing EVERY surviving
    scoring term — mirrors search(candidates='all')'s count
    aggregate), or OR ("union": docs containing ANY surviving term —
    mirrors search(candidates='union') / search_maxscore_compact)."""
    if mode == "union":
        return f"""
  SELECT DISTINCT p.doc_id FROM postings p
  JOIN qt ON p.term = qt.term
  {cand_site}
  {cand_not}
"""
    if mode == "all":
        return f"""
  SELECT p.doc_id FROM postings p
  JOIN qt ON p.term = qt.term
  {cand_site}
  {cand_not}
  GROUP BY p.doc_id
  HAVING count(*) = (SELECT count(*) FROM qt)
"""
    return f"""
  SELECT p.doc_id FROM postings p
  JOIN rarest r ON p.term = r.term
  {cand_site}
  {cand_not}
"""


def _bm25_sql(terms: list[str], sites: list[str] | None = None,
              offset: int = 0, limit: int = 10,
              postings_cte: str = _POSTINGS,
              extra_cte: str = "",
              exclude: list[str] | None = None,
              mode: str = "rarest",
              collapse_per_site: int | None = None,
              prior_weight: float | None = None,
              prior_expr: str | None = None) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    cand_not = ""
    if exclude:
        ex_list = ", ".join(f"'{t}'" for t in exclude)
        cand_not = (
            f"WHERE p.doc_id NOT IN (SELECT doc_id FROM postings "
            f"WHERE term IN ({ex_list}))"
        )
    if sites:
        site_list = ", ".join(f"'{s}'" for s in sites)
        n_expr = f"(SELECT count(*) FROM documents WHERE source IN ({site_list}))"
        cand_site = f"JOIN lens lc ON lc.doc_id = p.doc_id AND lc.site IN ({site_list})"
    else:
        n_expr = "(SELECT count(*) FROM documents)"
        cand_site = ""
    return f"""
WITH {_TOKS}, {extra_cte}{postings_cte}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT {n_expr} AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS ({_cand_body(mode, cand_site, cand_not)}),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
{_collapse_cte(collapse_per_site)}{_prior_cte(prior_weight, prior_expr)}
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM {"boosted" if prior_weight is not None
        else "collapsed" if collapse_per_site else "scored"}
)
SELECT doc_id, score, rn FROM ranked
WHERE rn > {offset} AND rn <= {offset + limit}
"""


def _prior_cte(weight: float | None,
               prior_expr: str | None = None) -> str:
    """Static-prior boost CTE mirroring plans/search.search_with_priors.

    ``prior_expr`` is the per-doc prior as a SQL expression over
    ``doc_id``; default is the deterministic ``1 + doc_id % 10``
    prior used by the bm25_priors_topk entry (bm25_fresh_topk passes
    the closed form of its synthetic recency decay instead)."""
    if weight is None:
        return ""
    if prior_expr is None:
        prior_expr = "CAST(1 + doc_id % 10 AS DOUBLE)"
    return f"""
boosted AS (
  SELECT doc_id,
         score + {weight} * ln({prior_expr}) AS score
  FROM scored
),"""


def _collapse_cte(per_site: int | None) -> str:
    """Host-crowding CTE mirroring plans/search.search_collapsed: at
    most per_site survivors per site by (score desc, doc_id asc),
    cut BEFORE the global ranking."""
    if not per_site:
        return ""
    return f"""
collapsed AS (
  SELECT doc_id, score FROM (
    SELECT s.doc_id, s.score,
           row_number() OVER (PARTITION BY l.site
                              ORDER BY s.score DESC, s.doc_id ASC) AS sr
    FROM scored s JOIN lens l USING (doc_id))
  WHERE sr <= {per_site}
),"""


def _prf_sql(terms: list[str], fb_docs: int = 10, fb_terms: int = 3,
             beta: float = 0.4, limit: int = 10) -> str:
    """DuckDB mirror of plans/feedback.search_prf: rarest-candidate
    initial ranking → top-fb_docs feedback set by (round(score,6)
    desc, doc_id asc) → Rocchio weights w(t)=Σ tfn·idf over non-query
    non-stop idf-positive terms, top-fb_terms by (round(w,6) desc,
    term asc) → union-candidate re-ranking with expansion terms
    down-weighted by beta."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    bm25 = (
        f"(p.tf::DOUBLE / l.doc_len) * ({K1} + 1)"
        f" / ((p.tf::DOUBLE / l.doc_len)"
        f" + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))"
    )
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
ti AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
qt AS (
  SELECT term, df, idf FROM ti
  WHERE term IN ({term_list})
    AND term NOT IN (SELECT term FROM stop)
),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand0 AS (SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term),
scored0 AS (
  SELECT c.doc_id, sum(qt.idf * {bm25}) AS score
  FROM cand0 c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
fb AS (SELECT doc_id FROM scored0
       ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {fb_docs}),
et AS (
  SELECT p.term, sum((p.tf::DOUBLE / l.doc_len) * ti.idf) AS w
  FROM postings p
  JOIN fb ON fb.doc_id = p.doc_id
  JOIN lens l ON l.doc_id = p.doc_id
  JOIN ti ON ti.term = p.term
  WHERE p.term NOT IN ({term_list})
    AND p.term NOT IN (SELECT term FROM stop)
  GROUP BY p.term
  ORDER BY round(w, 6) DESC, p.term ASC
  LIMIT {fb_terms}
),
wq AS (
  SELECT term, idf, 1.0 AS wt FROM qt
  UNION ALL
  SELECT ti.term, ti.idf, {beta} AS wt FROM et JOIN ti USING (term)
),
cand AS (SELECT DISTINCT p.doc_id FROM postings p
         JOIN wq ON wq.term = p.term),
scored AS (
  SELECT c.doc_id, sum(wq.wt * wq.idf * {bm25}) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN wq ON wq.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored
)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _cms_md5_sql(toks_list: str, keys: list[str], depth: int = 5,
                 width: int = 2048) -> str:
    """DuckDB mirror of cms_build+cms_estimate(hash_method='md5'):
    the depth×width cell table and the min-over-probes estimates,
    bucket = md5-substring-int('key#row') mod width."""
    def bucket(expr, row):
        return (
            f"(('0x' || substr(md5({expr} || '#{row}'), 18, 15))"
            f"::BIGINT % {width})"
        )

    cell_rows = "\n                UNION ALL\n                ".join(
        f"SELECT {r} AS row, {bucket('term', r)} AS col FROM tk"
        for r in range(depth)
    )
    probe_rows = "\n                UNION ALL\n                ".join(
        f"SELECT key, {r} AS row, {bucket('key', r)} AS col FROM pk"
        for r in range(depth)
    )
    key_vals = ", ".join(f"('{k}')" for k in sorted(set(keys)))
    return f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            tk AS (SELECT unnest(tokens) AS term FROM lt),
            cells AS (
              SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
              FROM (
                {cell_rows})
              GROUP BY row, col),
            pk AS (SELECT * FROM (VALUES {key_vals}) AS v(key)),
            pc AS (
                {probe_rows})
            SELECT pc.key,
                   min(coalesce(c.cnt, 0)) AS est
            FROM pc LEFT JOIN cells c USING (row, col)
            GROUP BY pc.key
"""


BLOOM_M, BLOOM_K = 4096, 5


def _bloom_md5_bit(expr: str, i: int, m: int = BLOOM_M) -> str:
    return (
        f"(('0x' || substr(md5({expr} || '#{i}'), 18, 15))"
        f"::BIGINT % {m})"
    )


def _bloom_md5_ctes(m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    """CTE chain ending in ``bits(bit)`` — DuckDB mirror of
    operators/bloom.bloom_build(hash_method='md5') over the
    doc_id%3==0 member set of the documents table."""
    bit_rows = "\n              UNION ALL\n              ".join(
        f"SELECT {_bloom_md5_bit('doc_id::VARCHAR', i, m)} AS bit "
        "FROM members"
        for i in range(k)
    )
    return f"""
            members AS (SELECT doc_id FROM documents
                        WHERE doc_id % 3 = 0),
            bits AS (
              SELECT DISTINCT bit FROM (
              {bit_rows}))
"""


def _bloom_contains_sql(m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    """Mirror of bloom_contains: all k probe bits set ⇒ true."""
    probe_rows = "\n              UNION ALL\n              ".join(
        f"SELECT key, {_bloom_md5_bit('key', i, m)} AS bit FROM probes"
        for i in range(k)
    )
    return f"""
            WITH {_bloom_md5_ctes(m, k)},
            probes AS (SELECT DISTINCT doc_id::VARCHAR AS key
                       FROM documents),
            pc AS (
              {probe_rows})
            SELECT pc.key,
                   count(*) = sum(CASE WHEN b.bit IS NOT NULL
                                       THEN 1 ELSE 0 END)
                     AS might_contain
            FROM pc LEFT JOIN bits b USING (bit)
            GROUP BY pc.key
"""


QSK_BITS, QSK_DEPTH, QSK_WIDTH = 12, 3, 256
QSK_PROBES = [64, 256, 1024, 3000]


def _qsk_bucket(key_expr: str, row: int, width: int = QSK_WIDTH) -> str:
    return (
        f"(('0x' || substr(md5(({key_expr})::VARCHAR || '#{1000 + row}'),"
        f" 18, 15))::BIGINT % {width})"
    )


def _qsk_cells_cte() -> str:
    """CTE ``qcells(lvl, row, col, cnt)`` — DuckDB mirror of
    operators/sketches.quantile_build(hash_method='md5') over
    documents.n_chars (clamped to [0, 2^bits))."""
    clamp = f"least(greatest(n_chars, 0), {(1 << QSK_BITS) - 1})"
    branches = "\n              UNION ALL\n              ".join(
        f"SELECT {lvl} AS lvl, {row} AS row, "
        f"{_qsk_bucket(f'{clamp} >> {lvl}', row)} AS col FROM documents"
        for lvl in range(QSK_BITS)
        for row in range(QSK_DEPTH)
    )
    return f"""
            qcells AS (
              SELECT lvl, row, col, CAST(count(*) AS BIGINT) AS cnt
              FROM (
              {branches})
              GROUP BY lvl, row, col)
"""


def _qsk_ranks_sql(probes: list[int]) -> str:
    """Rank estimates for literal probe values: for each set bit b of
    v the dyadic node (lvl=b, key=(v>>b)^1), node count = CMS min
    over rows, rank = sum of node counts — the exact arithmetic of
    sketches._rank_from_cells, with every md5 bucket recomputed by
    DuckDB from the (lvl, key, row) triple."""
    node_rows = []
    for v in probes:
        vc = max(0, min(int(v), (1 << QSK_BITS) - 1))
        for b in range(QSK_BITS):
            if (vc >> b) & 1:
                key = (vc >> b) ^ 1
                for row in range(QSK_DEPTH):
                    node_rows.append(f"({v}, {b}, {row}, {key})")
    values = ",\n              ".join(node_rows)
    return f"""
            WITH {_qsk_cells_cte()},
            pn AS (SELECT * FROM (VALUES
              {values}) AS t(v, lvl, row, key)),
            nodes AS (
              SELECT pn.v, pn.lvl, pn.key,
                     min(coalesce(c.cnt, 0)) AS node_cnt
              FROM pn LEFT JOIN qcells c
                ON c.lvl = pn.lvl AND c.row = pn.row
               AND c.col = CASE pn.row
                     {" ".join(f"WHEN {r} THEN {_qsk_bucket('pn.key', r)}"
                               for r in range(QSK_DEPTH))}
                   END
              GROUP BY pn.v, pn.lvl, pn.key)
            SELECT CAST(v AS BIGINT) AS value,
                   CAST(sum(node_cnt) AS BIGINT) AS rank_est
            FROM nodes GROUP BY v
"""


def _hll_md5_ctes(lg_k: int = 8) -> str:
    """CTE chain ending in ``reg(lang, bucket, rho)`` — DuckDB mirror
    of operators/sketches.hll_registers_md5 over the documents table:
    bucket = top lg_k bits of the 60-bit md5-substring hash of
    doc_id, rho = leading zeros of the remaining w bits + 1."""
    w = 60 - lg_k
    mask = (1 << w) - 1
    return f"""
            h AS (SELECT lang,
                         ('0x' || substr(md5(doc_id::VARCHAR), 18, 15))
                             ::BIGINT AS h
                  FROM documents),
            r AS (SELECT lang, h >> {w} AS bucket,
                         CASE WHEN (h & {mask}) = 0 THEN {w + 1}
                              ELSE {w} - length(bin(h & {mask})) + 1
                         END AS rho
                  FROM h),
            reg AS (SELECT lang, bucket,
                           CAST(max(rho) AS INTEGER) AS rho
                    FROM r GROUP BY lang, bucket)
"""


def _hll_md5_estimate_sql(lg_k: int = 8) -> str:
    """Estimator over the register CTE — the exact double constants
    the Spark side uses (alpha·m² and 2.5·m inlined via repr) so both
    engines run identical IEEE arithmetic."""
    m = 1 << lg_k
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    return f"""
            WITH {_hll_md5_ctes(lg_k)},
            agg AS (SELECT lang,
                           sum(power(2.0, -rho)) AS s,
                           count(*) AS nz
                    FROM reg GROUP BY lang),
            raws AS (SELECT lang,
                            {alpha_m2!r} / (s + ({m} - nz)) AS raw,
                            {m} - nz AS zeros
                     FROM agg)
            SELECT lang,
                   round(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                              THEN {float(m)!r}
                                   * ln({float(m)!r} / zeros)
                              ELSE raw END, 6) AS est
            FROM raws
"""


def _simhash_md5_ctes(toks_list: str) -> str:
    """CTE chain ending in ``sig(doc_id, simhash)`` — DuckDB mirror
    of simhash_table(hash_method='md5'): 60-bit signatures from
    per-bit ±1 sums over md5-substring token hashes (token-less docs
    get signature 0, matching the UDF path)."""
    bitsums = ",\n                     ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS b{b}"
        for b in range(60)
    )
    sig_expr = "\n                     | ".join(
        f"((CASE WHEN b{b} > 0 THEN CAST(1 AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END) << {b})"
        for b in range(60)
    )
    return f"""
            lt AS (SELECT doc_id, {toks_list} AS tokens
                   FROM documents),
            ex AS (SELECT doc_id, unnest(tokens) AS tok FROM lt),
            th AS (SELECT doc_id,
                          ('0x' || substr(md5(tok), 18, 15))::BIGINT
                            AS h
                   FROM ex),
            bs AS (SELECT doc_id,
                     {bitsums}
                   FROM th GROUP BY doc_id),
            sg0 AS (SELECT doc_id,
                     {sig_expr} AS simhash
                    FROM bs),
            sig AS (SELECT d.doc_id,
                           coalesce(s.simhash, 0) AS simhash
                    FROM documents d LEFT JOIN sg0 s USING (doc_id))"""


def _simhash_md5_pairs_sql(toks_list: str, bands: int = 4,
                           max_hamming: int = 3) -> str:
    """DuckDB mirror of simhash_near_dup_pairs(hash_method='md5'):
    15-bit bands over the 60-bit signature, exact banded candidate
    join, bit_count(xor) Hamming verify."""
    width = 60 // bands
    mask = (1 << width) - 1
    band_selects = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, simhash, {i} AS band,"
        f" (simhash >> {i * width}) & {mask} AS bk FROM sig"
        for i in range(bands)
    )
    return f"""
            WITH {_simhash_md5_ctes(toks_list)},
            bnd AS (
              {band_selects}),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                     x.simhash AS sa, y.simhash AS sb
              FROM bnd x JOIN bnd y
                ON x.band = y.band AND x.bk = y.bk
              WHERE x.doc_id < y.doc_id)
            SELECT id_a, id_b,
                   CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
            FROM cand
            WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _minhash_md5_sql(toks_list: str, k: int = 16, bands: int = 4,
                     threshold: float = 0.5) -> str:
    """DuckDB mirror of minhash_lsh_pairs(hash_method='md5'): the
    seed-varied signature minima, band hashes, candidate join and
    estimated-Jaccard verify all replayed with the md5-substring
    integer hash (3-gram shingles)."""
    r = k // bands
    mins_cols = ",\n                     ".join(
        f"min(('0x' || substr(md5(shingle || '#{i}'), 18, 15))"
        f"::BIGINT) AS h{i}"
        for i in range(k)
    )
    band_selects = "\n              UNION ALL\n              ".join(
        "SELECT doc_id, {b} AS band, ('0x' || substr(md5({cc}), 18, "
        "15))::BIGINT AS bh FROM mins".format(
            b=i,
            cc=" || '#' || ".join(
                f"CAST(h{j} AS VARCHAR)"
                for j in range(i * r, (i + 1) * r)
            ),
        )
        for i in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(k)
    )
    return f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     tokens[i] || ' ' || tokens[i+1] || ' '
                       || tokens[i+2] AS shingle
              FROM lt, unnest(range(1, len(tokens) - 1)) AS r(i)
              WHERE len(tokens) >= 3),
            mins AS (SELECT doc_id,
                     {mins_cols}
                     FROM sh GROUP BY doc_id),
            bnd AS (
              {band_selects}),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bnd x JOIN bnd y
                ON x.band = y.band AND x.bh = y.bh
              WHERE x.doc_id < y.doc_id),
            est AS (
              SELECT c.id_a, c.id_b,
                     round(({agree}) / {float(k)}, 6) AS est_jaccard
              FROM cand c
              JOIN mins a ON a.doc_id = c.id_a
              JOIN mins b ON b.doc_id = c.id_b)
            SELECT id_a, id_b, est_jaccard FROM est
            WHERE est_jaccard >= {threshold}
"""


def _winnow_fp_ctes(toks_list: str, k: int = 5, w: int = 4) -> str:
    """CTE chain ending in ``fp(doc_id, pos, h)`` — DuckDB mirror of
    operators/winnow.winnow_fingerprints: md5-substring gram hashes,
    per-window minima with the rightmost-tie rule, short docs keep
    one partial window."""
    gram = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(k))
    return f"""
            lt AS (SELECT doc_id, {toks_list} AS tokens FROM documents),
            g AS (
              SELECT doc_id,
                     CAST(i - 1 AS BIGINT) AS pos,
                     ('0x' || substr(md5({gram}), 18, 15))::BIGINT AS h,
                     CAST(len(tokens) - {k - 1} AS BIGINT) AS ng
              FROM lt, unnest(range(1, len(tokens) - {k - 2})) AS r(i)
              WHERE len(tokens) >= {k}
            ),
            st AS (
              SELECT doc_id, pos, h, s
              FROM g, unnest(range(greatest(pos - {w - 1}, 0),
                                   least(pos, greatest(ng - {w}, 0)) + 1)
                            ) AS r(s)
            ),
            sel AS (
              SELECT doc_id, s, pos, h,
                     row_number() OVER (PARTITION BY doc_id, s
                                        ORDER BY h ASC, pos DESC) AS rr
              FROM st
            ),
            fp AS (SELECT DISTINCT doc_id, pos, h FROM sel WHERE rr = 1)"""


def _champions_sql(terms: list[str], m: int = 5,
                   limit: int = 10) -> str:
    """DuckDB mirror of operators/champions.search_champions
    (exact_fallback=False): per-term top-m champions by
    (round(tf/doc_len, 6) desc, doc_id asc), union candidates,
    full-postings BM25 scoring."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
champ AS (
  SELECT term, doc_id FROM (
    SELECT p.term, p.doc_id,
           row_number() OVER (
             PARTITION BY p.term
             ORDER BY round(p.tf::DOUBLE / l.doc_len, 6) DESC,
                      p.doc_id ASC) AS r
    FROM postings p JOIN lens l USING (doc_id))
  WHERE r <= {m}
),
cand AS (SELECT DISTINCT c.doc_id FROM champ c
         JOIN qt ON qt.term = c.term),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored
)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _synonyms_sql(limit: int = 10) -> str:
    """DuckDB mirror of plans/synonyms.search_synonyms: member
    stop-filter, exact union df per group, Robertson idf positivity
    drop, rarest-GROUP candidates, summed group tf through the shared
    BM25 arithmetic."""
    groups = {
        t: sorted({t, *SYNONYM_MAP.get(t, [])})
        for t in SYNONYM_QUERY.split()
    }
    gvals = ", ".join(
        f"('{g}', '{m}')"
        for g, ms in sorted(groups.items())
        for m in ms
    )
    gmap = f"gmap(grp, term) AS (VALUES {gvals})"
    return _group_bm25_sql(gmap, limit)


def _group_bm25_sql(gmap_cte: str, limit: int) -> str:
    """Shared group-BM25 oracle body (plans/synonyms.search_groups):
    the caller supplies the ``gmap`` CTE (group → member terms)."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
{gmap_cte},
gkept AS (SELECT grp, term FROM gmap
          WHERE term NOT IN (SELECT term FROM stop)),
gdf AS (SELECT g.grp, count(DISTINCT p.doc_id) AS df
        FROM gkept g JOIN postings p ON p.term = g.term GROUP BY 1),
gidf AS (SELECT gdf.grp, gdf.df,
                ln((nn.n - gdf.df + 0.5) / (gdf.df + 0.5)) AS idf
         FROM gdf CROSS JOIN nn
         WHERE (nn.n - gdf.df + 0.5) / (gdf.df + 0.5) > 0),
rarest AS (SELECT grp FROM gidf ORDER BY df ASC, grp ASC LIMIT 1),
cand AS (SELECT DISTINCT p.doc_id FROM postings p
         JOIN gkept g ON g.term = p.term
         JOIN rarest r ON r.grp = g.grp),
gtf AS (SELECT p.doc_id, g.grp, sum(p.tf) AS gtf
        FROM postings p
        JOIN gkept g ON g.term = p.term
        JOIN gidf gi ON gi.grp = g.grp
        GROUP BY 1, 2),
scored AS (
  SELECT c.doc_id,
         sum(gi.idf * (t.gtf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((t.gtf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN gtf t ON t.doc_id = c.doc_id
  JOIN gidf gi ON gi.grp = t.grp
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY 1),
ranked AS (SELECT doc_id, round(score, 6) AS score,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
           FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _prefix_sql(limit: int = 10, max_expansions: int = 50) -> str:
    """DuckDB mirror of plans/prefix.search_prefix for the contract
    query "v* dup": the 'v*' group expands to the top-``max_
    expansions`` non-stop dictionary terms with the prefix (df desc,
    term asc — plans/prefix.expand_prefix), then scores through the
    shared group-BM25 body."""
    gmap = f"""gmap AS (
  SELECT 'v*' AS grp, term FROM (
    SELECT term FROM tstats
    WHERE term LIKE 'v%'
      AND term NOT IN (SELECT term FROM stop)
    ORDER BY df DESC, term ASC LIMIT {max_expansions})
  UNION ALL
  SELECT 'dup' AS grp, 'dup' AS term)"""
    return _group_bm25_sql(gmap, limit)


def _explain_sql(terms: list[str]) -> str:
    """DuckDB mirror of plans/explain.explain_score over the rank-1
    doc of the rarest-candidate BM25 ranking (the bm25_topk plan,
    LIMIT 1) — per-term tf/doc_len/df/idf/tf_norm/term_score."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (SELECT DISTINCT p.doc_id FROM postings p
         JOIN rarest r ON p.term = r.term),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY 1),
top1 AS (SELECT doc_id FROM scored
         ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT p.term,
       CAST(p.tf AS BIGINT) AS tf,
       CAST(l.doc_len AS BIGINT) AS doc_len,
       CAST(qt.df AS BIGINT) AS df,
       round(qt.idf, 6) AS idf,
       round(p.tf::DOUBLE / l.doc_len, 6) AS tf_norm,
       round(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len)),
             6) AS term_score
FROM top1 t
JOIN postings p ON p.doc_id = t.doc_id AND p.term IN
     (SELECT term FROM qt)
JOIN qt ON qt.term = p.term
JOIN lens l ON l.doc_id = t.doc_id
CROSS JOIN nn
"""


def _did_you_mean_sql(
    t1: str, t2: str, gamma: float = 5.0, alpha: float = 1.0
) -> str:
    """DuckDB mirror of plans/spell.suggest_query for the two-term
    typo query: exact levenshtein≤1 candidate sets (SymSpell's
    neighborhood is exact — pytest-pinned), add-α bigram noisy
    channel, argmax (score desc, suggestion asc)."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_TSTATS}, {_TOKS_POS},
big AS (SELECT a.term AS w1, b.term AS w2, count(*) AS c2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2),
pref AS (SELECT w1, sum(c2) AS c FROM big GROUP BY 1),
v AS (SELECT count(*) AS v FROM tstats),
nn AS (SELECT count(*) AS n FROM documents),
c1 AS (SELECT term, df, levenshtein(term, '{t1}') AS d FROM tstats
       WHERE levenshtein(term, '{t1}') <= 1),
c2c AS (SELECT term, levenshtein(term, '{t2}') AS d FROM tstats
        WHERE levenshtein(term, '{t2}') <= 1),
scored AS (
  SELECT c1.term || ' ' || c2c.term AS suggestion,
         ln((c1.df + {alpha}) / (nn.n + {alpha} * v.v))
         + ln((coalesce(b.c2, 0) + {alpha})
              / (coalesce(p.c, 0) + {alpha} * v.v))
         - {gamma} * (c1.d + c2c.d) AS score
  FROM c1 CROSS JOIN c2c
  LEFT JOIN big b ON b.w1 = c1.term AND b.w2 = c2c.term
  LEFT JOIN pref p ON p.w1 = c1.term
  CROSS JOIN v CROSS JOIN nn)
SELECT suggestion, round(score, 6) AS score
FROM scored ORDER BY score DESC, suggestion ASC LIMIT 1
"""


def _wildcard_sql(limit: int = 10, max_expansions: int = 50) -> str:
    """DuckDB mirror of plans/wildcard.search_wildcard for the
    contract query "*u* line": the '*u*' group expands to the
    non-stop dictionary terms matching the pattern (LIKE ≡ the
    engine's verify regex; the k-gram probe is a pure pruning step,
    so the oracle needn't model it), df desc / term asc, capped."""
    gmap = f"""gmap AS (
  SELECT '*u*' AS grp, term FROM (
    SELECT term FROM tstats
    WHERE term LIKE '%u%'
      AND term NOT IN (SELECT term FROM stop)
    ORDER BY df DESC, term ASC LIMIT {max_expansions})
  UNION ALL
  SELECT 'line' AS grp, 'line' AS term)"""
    return _group_bm25_sql(gmap, limit)


def _wildcard_terms_sql(max_expansions: int = 3) -> str:
    """DuckDB mirror of plans/wildcard.expand_wildcard('*e*') — the
    cap encodes the expansion's (df desc, term asc) order in the
    returned membership."""
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_TSTATS}, {_STOP}
SELECT term, CAST(df AS BIGINT) AS df FROM (
  SELECT term, df FROM tstats
  WHERE term LIKE '%e%'
    AND term NOT IN (SELECT term FROM stop)
  ORDER BY df DESC, term ASC LIMIT {max_expansions})
"""


def _near_sql(slop: int = 3, limit: int = 10) -> str:
    """DuckDB mirror of operators/phrases.near_search for the
    two-term PROX_TERMS query: candidates are docs whose min cover
    span ≤ (m−1)+slop, scored with the shared BM25 arithmetic."""
    t0, t1 = sorted(PROX_TERMS)
    term_list = ", ".join(f"'{t}'" for t in sorted(PROX_TERMS))
    max_span = 1 + slop
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0),
{_TOKS_POS},
a AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t0}'),
b AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t1}'),
spans AS (SELECT a.doc_id, min(abs(a.pos - b.pos)) AS span
          FROM a JOIN b USING (doc_id) GROUP BY 1),
cand AS (SELECT doc_id FROM spans WHERE span <= {max_span}),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY 1),
ranked AS (SELECT doc_id, round(score, 6) AS score,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
           FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _next_token_sql(word: str, k: int = 10) -> str:
    """DuckDB mirror of curation.next_token_suggestions."""
    return f"""
WITH {_TOKS_POS},
big AS (SELECT a.term AS w1, b.term AS w2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
SELECT w2 AS next_term, CAST(count(*) AS BIGINT) AS n
FROM big WHERE w1 = '{word}'
GROUP BY 1 ORDER BY n DESC, next_term ASC LIMIT {k}
"""


_CORPUS_DIFF_SQL = """
WITH old_v AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
new_v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' edited'
              ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0),
o AS (SELECT doc_id, md5(text) AS f1 FROM old_v),
n AS (SELECT doc_id, md5(text) AS f2 FROM new_v),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, f1, f2
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN f1 IS NULL THEN 'added'
            WHEN f2 IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j
WHERE f1 IS NULL OR f2 IS NULL OR f1 <> f2
"""


def _collocations_sql(min_count: int = 5, limit: int = 20) -> str:
    """DuckDB mirror of operators/curation.collocations (PMI over the
    corpus bigram/unigram counts)."""
    return f"""
WITH {_TOKS_POS},
big AS (SELECT a.term AS w1, b.term AS w2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
uni AS (SELECT term, count(*) AS c FROM toks_pos GROUP BY 1),
tot AS (SELECT count(*) AS t FROM toks_pos),
pairs AS (SELECT w1, w2, count(*) AS n FROM big
          GROUP BY 1, 2 HAVING count(*) >= {min_count})
SELECT p.w1, p.w2, CAST(p.n AS BIGINT) AS n,
       round(ln(p.n::DOUBLE * tot.t / (u1.c::DOUBLE * u2.c)), 6)
         AS pmi
FROM pairs p
JOIN uni u1 ON u1.term = p.w1
JOIN uni u2 ON u2.term = p.w2
CROSS JOIN tot
ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT {limit}
"""


def _lm_sql(terms: list[str], mu: float = 500.0,
            limit: int = 10) -> str:
    """DuckDB mirror of plans/lm.search_lm: Dirichlet query
    likelihood, rank-preserving present-term decomposition, |C| as
    the exact doc_len sum (the Spark side reconstructs the same
    integer from avg_len·n_docs)."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
tot AS (SELECT CAST(sum(doc_len) AS DOUBLE) AS c FROM lens),
qt AS (SELECT p.term, CAST(sum(p.tf) AS DOUBLE) AS cf
       FROM postings p
       WHERE p.term IN ({term_list})
         AND p.term NOT IN (SELECT term FROM stop)
       GROUP BY 1),
nq AS (SELECT count(*) AS m FROM qt),
cand AS (SELECT DISTINCT doc_id FROM postings
         WHERE term IN (SELECT term FROM qt)),
present AS (
  SELECT p.doc_id,
         sum(ln(1 + p.tf::DOUBLE / ({mu} * qt.cf / tot.c))) AS ps
  FROM postings p JOIN qt ON qt.term = p.term CROSS JOIN tot
  GROUP BY 1),
scored AS (
  SELECT c.doc_id,
         pr.ps + nq.m * ln({mu} / (l.doc_len + {mu})) AS score
  FROM cand c
  JOIN present pr ON pr.doc_id = c.doc_id
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nq),
ranked AS (SELECT doc_id, round(score, 6) AS score,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
           FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _cori_sql(terms: list[str]) -> str:
    """DuckDB mirror of plans/federate.cori_shard_scores over the
    doc_id-parity shard split: T·I belief with |DB|=2, cw from exact
    per-shard token totals, cf = shards containing the term."""
    term_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS},
sh_cw AS (SELECT doc_id % 2 AS shard,
                 CAST(sum(doc_len) AS DOUBLE) AS cw
          FROM lens GROUP BY 1),
sh_df AS (SELECT doc_id % 2 AS shard, term,
                 CAST(count(*) AS DOUBLE) AS df
          FROM postings WHERE term IN ({term_list}) GROUP BY 1, 2),
avgcw AS (SELECT avg(cw) AS acw FROM sh_cw),
cf AS (SELECT term, count(*) AS cf FROM sh_df GROUP BY 1),
grid AS (
  SELECT s.shard, c.term, c.cf, coalesce(d.df, 0) AS df, s.cw
  FROM sh_cw s CROSS JOIN cf c
  LEFT JOIN sh_df d ON d.shard = s.shard AND d.term = c.term),
belief AS (
  SELECT shard,
         avg(0.4 + 0.6
             * (df / (df + 50.0 + 150.0 * cw / avgcw.acw))
             * (ln(2.5 / cf) / ln(3.0))) AS belief
  FROM grid CROSS JOIN avgcw GROUP BY 1)
SELECT CAST(shard AS INTEGER) AS shard,
       round(belief, 6) AS belief
FROM belief
"""


def _mlt_sql(src: int, n_terms: int = 8, k: int = 10) -> str:
    """DuckDB mirror of plans/search.more_like_this: the source doc's
    top tf·idf terms (pool limited to n_terms+stoplist BEFORE the
    stop/df>1 filter, exactly like the Spark collect), then the
    union-candidate BM25 ranking with the source excluded and the
    ORIGINAL ranks kept (no renumbering after the exclusion)."""
    pool = n_terms + STOPLIST_SIZE
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*)
               FROM lens) AS avg_len),
src_terms AS (
  SELECT p.term, ts.df,
         p.tf * CASE WHEN (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
                     THEN ln((nn.n - ts.df + 0.5) / (ts.df + 0.5))
                END AS w
  FROM postings p JOIN tstats ts USING (term) CROSS JOIN nn
  WHERE p.doc_id = {src}
),
pool AS (
  SELECT term, df, w FROM (
    SELECT term, df, w,
           row_number() OVER (ORDER BY w DESC NULLS LAST, term ASC)
             AS prn
    FROM src_terms
  ) WHERE prn <= {pool}
),
mlt AS (
  SELECT term FROM (
    SELECT term,
           row_number() OVER (ORDER BY w DESC NULLS LAST, term ASC)
             AS rk
    FROM pool
    WHERE df > 1 AND term NOT IN (SELECT term FROM stop)
  ) WHERE rk <= {n_terms}
),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN (SELECT term FROM mlt)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
cand AS (
  SELECT DISTINCT p.doc_id FROM postings p JOIN qt ON p.term = qt.term
),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len)))
           AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INTEGER) AS rn
  FROM scored
)
SELECT doc_id, score, rn FROM ranked
WHERE rn <= {k + 1} AND doc_id <> {src}
ORDER BY rn ASC LIMIT {k}
"""


# 0.5 · 2^60: fraction-0.5 cut on the 60-bit md5-substring doc hash
# (plans/federate.REDDE_HASH_BITS idiom, same as the CMS/HLL twins)
REDDE_THR = 576460752303423488
_REDDE_SAMPLED = (
    "('0x' || substr(md5(doc_id::VARCHAR), 18, 15))::BIGINT "
    f"< {REDDE_THR}"
)


def _redde_sql(terms: list[str], n_csi: int = 20) -> str:
    """DuckDB mirror of plans/federate.redde_csi + redde_shard_scores
    over the doc_id-parity shard split: md5-hash 50% sample, BM25
    top-``n_csi`` over the sample under the SAMPLE'S own
    stats/stoplist (rarest-term candidates, same arithmetic as
    _bm25_sql), votes scaled by each shard's inverse sampling rate
    N_j/n_j, normalized over the voting shards."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH samp AS (
  SELECT doc_id, text FROM documents WHERE {_REDDE_SAMPLED}
),
toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(
             trim(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g')),
             '\s+'),
           t -> t <> '')) AS term
  FROM samp
),
postings AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
lens AS (
  SELECT s.doc_id, coalesce(t.c, 0) AS doc_len
  FROM samp s
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t
  USING (doc_id)
),
tstats AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
stop AS (SELECT term FROM tstats
         ORDER BY df DESC, term ASC LIMIT {STOPLIST_SIZE}),
nn AS (SELECT (SELECT count(*) FROM samp) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*)
               FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (
  SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term
),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len)))
           AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
topn AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {n_csi}
),
sizes AS (
  SELECT doc_id % 2 AS shard, count(*) AS n_docs,
         count(*) FILTER (WHERE {_REDDE_SAMPLED}) AS n_sample
  FROM documents GROUP BY 1
),
votes AS (
  SELECT t.doc_id % 2 AS shard, count(*) AS votes
  FROM topn t GROUP BY 1
),
est AS (
  SELECT s.shard, coalesce(v.votes, 0) AS votes,
         CASE WHEN s.n_sample > 0
              THEN coalesce(v.votes, 0) * s.n_docs::DOUBLE / s.n_sample
              ELSE 0.0 END AS est_rel
  FROM sizes s LEFT JOIN votes v USING (shard)
)
SELECT CAST(shard AS INTEGER) AS shard,
       CAST(votes AS BIGINT) AS votes,
       round(est_rel, 6) AS est_rel,
       round(CASE WHEN sum(est_rel) OVER () > 0
                  THEN est_rel / sum(est_rel) OVER ()
                  ELSE 0.0 END, 6) AS score
FROM est
ORDER BY shard
"""


# deterministic re-punctuation of the (punctuation-free) synthetic
# corpus so T8 split / T12 ordering / T11 300-char assembly see real
# multi-sentence inputs: fixed-width slices joined by terminators.
# 3×120-char sentences (121 chars after strip → the T10 crop path);
# 5×112-char sentences (≤120 → no crop, but 3 pieces exceed the
# 300-char budget → the assembly cut triggers).
SNIP3_SLICES = [(1, 120, ". "), (121, 120, "! "), (241, 120, "?")]
# OVERLAPPING starts: the corpus averages ~300 chars, so disjoint
# slices would leave later sentences empty — overlap guarantees ~5
# full sentences per doc and forces the 300-char assembly cut.
SNIP5_SLICES = [
    (1, 112, ". "), (61, 112, "! "), (121, 112, "? "),
    (181, 112, ". "), (241, 112, "."),
]
# caller-supplied lemma→IDF map (attach_snippets' public contract
# takes any dict): common lemmas with DISTINCT dyadic idfs so many
# sentences match — exercising multi-highlight sentences, the T10
# crop on long sentences, T12 ordering between different idf vectors,
# and the T11 300-char cut.  Dyadic constants are bit-exact in both
# engines.
SNIP_FIXED_IDF = {"vector": 3.0, "key": 1.5, "line": 0.75}


def _snip_text_spark(slices):
    parts = []
    for pos, ln, term in slices:
        parts.append(F.substring(F.col("text"), pos, ln))
        parts.append(F.lit(term))
    return F.concat(*parts)


def _snip_text_sql(slices) -> str:
    return " || ".join(
        f"substr(d.text, {pos}, {ln}) || '{term}'"
        for pos, ln, term in slices
    )


def _snippets_sql(
    lemma_terms: list[str],
    lemma_cte: str,
    text_expr: str = "d.text",
    fixed_idf: dict[str, float] | None = None,
) -> str:
    """DuckDB replay of the T8–T12 snippet pipeline over the
    lemma-analyzer top-10 (plans/snippets.py):

    - T8 sentence split: the SAME regex via regexp_extract_all;
    - T9 highlight: distinct tokens in first-occurrence order whose
      lemma is a (stop-removed, positive-idf) query lemma, folded
      over the sentence with list_reduce ∘ regexp_replace('gi') —
      sequential case-insensitive replacement of the LOWERCASED
      token, exactly StringUtils.replaceIgnoreCase;
    - T12 ordering: the Java comparator (ascending compare of
      ascending-sorted IDF vectors, equal prefix → more lemmas
      first) is encoded as lexicographic order with missing = +∞
      (pad the sorted vector with 1e308), ties stable by sentence
      index;
    - T10 crop: SentenceUtil.java:15-43's exact 0-based arithmetic
      (including the rfind=-1 → end one char before the close-tag
      quirk), transcribed to 1-based substr/strpos;
    - T11 assembly: include a cropped piece while the running total
      of previous pieces' len+1 is < 300; join with ' ' + trailing
      space.
    """
    terms_in = ", ".join(f"'{t}'" for t in sorted(set(lemma_terms)))
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    sent_re = r"[^.!?]*[.!?]+(?:\s+|$)|[^.!?]+$"
    top10 = _bm25_sql(
        lemma_terms, limit=10,
        postings_cte=_LPOSTINGS, extra_cte=lemma_cte + ", ",
    )
    if fixed_idf is None:
        qt_cte = f"""qt AS (
  SELECT ts.term AS lemma,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({terms_in})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0)"""
    else:
        vals = ", ".join(
            f"('{k}', {v!r})" for k, v in sorted(fixed_idf.items())
        )
        qt_cte = (
            f"qt AS (SELECT * FROM (VALUES {vals}) q(lemma, idf))"
        )
    return f"""
WITH {_TOKS}, {lemma_cte}, {_LPOSTINGS}, {_TSTATS}, {_STOP},
nn AS (SELECT count(*) AS n FROM documents),
{qt_cte},
top10 AS (SELECT doc_id, rn FROM ({top10}) b),
pages AS (
  SELECT t.rn, d.doc_id, {text_expr} AS text
  FROM top10 t JOIN documents d USING (doc_id)),
sents AS (
  SELECT rn, doc_id,
         unnest(slist) AS sent,
         unnest(range(len(slist))) AS sidx
  FROM (SELECT rn, doc_id,
               regexp_extract_all(text, '{sent_re}') AS slist
        FROM pages)),
stoks AS (
  SELECT rn, doc_id, sidx, sent,
         list_filter(string_split_regex(
           trim(regexp_replace(lower(sent), '[^a-z\\s]', ' ', 'g')),
           '\\s+'), t -> t <> '') AS toklist
  FROM sents),
firstocc AS (
  SELECT rn, doc_id, sidx, word, min(pos) AS fpos
  FROM (SELECT rn, doc_id, sidx,
               unnest(toklist) AS word,
               unnest(range(len(toklist))) AS pos
        FROM stoks)
  GROUP BY 1, 2, 3, 4),
matched AS (
  SELECT f.rn, f.doc_id, f.sidx, f.word, f.fpos, lm.lemma, q.idf
  FROM firstocc f
  JOIN lemma_map lm ON lm.word = f.word
  JOIN qt q ON q.lemma = lm.lemma),
sentvec AS (
  SELECT rn, doc_id, sidx, list_sort(list(idf)) AS fvec
  FROM (SELECT rn, doc_id, sidx, lemma, min(idf) AS idf
        FROM matched GROUP BY 1, 2, 3, 4)
  GROUP BY 1, 2, 3),
hl AS (
  SELECT m.rn, m.doc_id, m.sidx, v.fvec,
         trim(list_reduce(
           list_prepend(s.sent, list(m.word ORDER BY m.fpos)),
           (acc, w) -> regexp_replace(
             acc, w, '<b>' || w || '</b>', 'gi')),
           {ws}) AS s
  FROM matched m
  JOIN stoks s ON s.rn = m.rn AND s.doc_id = m.doc_id
              AND s.sidx = m.sidx
  JOIN sentvec v ON v.rn = m.rn AND v.doc_id = m.doc_id
               AND v.sidx = m.sidx
  GROUP BY m.rn, m.doc_id, m.sidx, v.fvec, s.sent),
cropin AS (
  SELECT rn, doc_id, sidx, fvec, s, len(s) AS slen,
         strpos(s, '<b>') - 1 AS sl,
         strpos(s, '</b>') + 3 AS el
  FROM hl),
crop2 AS (
  SELECT *, el - sl AS span,
         120 - (el - sl) // 2 AS remain
  FROM cropin),
crop3 AS (
  SELECT *,
    CASE WHEN sl - remain < 0 THEN 0
         WHEN strpos(substr(s, sl - remain + 1), ' ') > 0
           THEN sl - remain + strpos(substr(s, sl - remain + 1), ' ')
         ELSE 0 END AS cstart,
    CASE WHEN el + remain > slen THEN slen
         WHEN strpos(reverse(substr(s, el + 1, remain)), ' ') = 0
           THEN el - 1
         ELSE el + len(substr(s, el + 1, remain))
                 - strpos(reverse(substr(s, el + 1, remain)), ' ')
         END AS cend
  FROM crop2),
pieces AS (
  SELECT rn, doc_id, sidx, fvec,
    CASE
      WHEN slen <= 120 THEN s
      WHEN span > 120
        THEN '...' || substr(s, sl + 1, span) || '...'
      ELSE (CASE WHEN cstart > 0 THEN '...' ELSE '' END)
           || substr(s, cstart + 1, greatest(cend - cstart, 0))
           || (CASE WHEN cend < slen THEN '...' ELSE '' END)
    END AS piece
  FROM crop3),
ordered AS (
  SELECT rn, doc_id, piece,
         row_number() OVER (PARTITION BY doc_id ORDER BY
           coalesce(fvec[1], 1e308), coalesce(fvec[2], 1e308),
           coalesce(fvec[3], 1e308), sidx) AS oidx
  FROM pieces),
cum AS (
  SELECT rn, doc_id, piece, oidx,
         coalesce(sum(len(piece) + 1) OVER (
           PARTITION BY doc_id ORDER BY oidx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prev_total
  FROM ordered),
snips AS (
  SELECT rn, doc_id,
         string_agg(piece, ' ' ORDER BY oidx) || ' ' AS snippet
  FROM cum WHERE prev_total < 300 GROUP BY 1, 2)
SELECT t.doc_id, CAST(t.rn AS INTEGER) AS rn,
       coalesce(s.snippet, '') AS snippet
FROM top10 t LEFT JOIN snips s USING (doc_id)
"""


# logical final corpus of the incremental-maintenance lifecycle
# (_incremental_dir): every document, minus tombstoned base docs
# (%10<8 ∧ %9==0), with reindexed base docs (%10<8 ∧ %9==4) carrying
# the appended marker text
_INCR_DOCS = f"""
incr_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 8 AND doc_id % 9 = 4
              THEN text || '{REINDEX_MARKER}'
              ELSE text END AS text
  FROM documents
  WHERE NOT (doc_id % 10 < 8 AND doc_id % 9 = 0))
"""
_INCR_TOKS = r"""
itoks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(
             trim(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g')),
             '\s+'),
           t -> t <> '')) AS term
  FROM incr_docs
)
"""
_INCR_POSTINGS_SQL = f"""
WITH {_INCR_DOCS}, {_INCR_TOKS}
SELECT doc_id, term, count(*) AS tf FROM itoks GROUP BY 1, 2
"""
_TIME_TRAVEL_POSTINGS_SQL = f"""
WITH base_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
btoks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(
             trim(regexp_replace(lower(text), '[^a-z\\s]', ' ', 'g')),
             '\\s+'),
           t -> t <> '')) AS term
  FROM base_docs)
SELECT doc_id, term, count(*) AS tf FROM btoks GROUP BY 1, 2
"""

_INCR_TSTATS_SQL = f"""
WITH {_INCR_DOCS}, {_INCR_TOKS},
ipostings AS (
  SELECT term, doc_id FROM itoks GROUP BY 1, 2)
SELECT term, count(*) AS df FROM ipostings GROUP BY 1
"""

# logical final corpus of the POSITIONAL lifecycle
# (_incremental_pos_dir): base (%10<8) ∪ appended (%10==8), minus
# tombstoned base (%9==0), with reindexed base (%9==4) modified —
# %10==9 docs are never appended in that lifecycle
_INCR_POSITIONS_SQL = f"""
WITH ipos_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 8 AND doc_id % 9 = 4
              THEN text || '{REINDEX_MARKER}'
              ELSE text END AS text
  FROM documents
  WHERE doc_id % 10 <> 9
    AND NOT (doc_id % 10 < 8 AND doc_id % 9 = 0)),
ipos AS (
  SELECT doc_id,
         unnest(toklist) AS term,
         unnest(range(len(toklist))) AS pos
  FROM (
    SELECT doc_id,
           list_filter(
             string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z\\s]', ' ',
                                   'g')),
               '\\s+'),
             t -> t <> '') AS toklist
    FROM ipos_docs))
SELECT doc_id, term, CAST(pos AS BIGINT) AS pos FROM ipos
"""


def _taily_erlang_sql(terms: list[str], s_c: float) -> str:
    """DuckDB mirror of plans/federate.taily_shard_scores_erlang over
    the doc_id-parity shard split: per-shard BM25 score moments
    (n, Σs, Σs²) per query term under SHARD-LOCAL statistics, the
    co-occurrence estimate f = n_docs^(1−|Q|)·Πn_t, the moment-matched
    Gamma fit with integer (Erlang) shape k = floor(E²/V + 0.5)
    clamped to [1,100] and mean-preserving θ = E/k, and the survival
    mass at cutoff s_c as the finite sum e^{-x}·Σ_{j<k} x^j/j!."""
    ts = sorted(set(terms))
    term_list = ", ".join(f"'{t}'" for t in ts)
    nq = len(ts)
    return f"""
WITH {_TOKS}, {_LENS},
sh_postings AS (
  SELECT doc_id % 2 AS shard, term, doc_id, count(*) AS tf
  FROM toks WHERE term IN ({term_list}) GROUP BY 1, 2, 3),
sh_stat AS (
  SELECT doc_id % 2 AS shard, count(*) AS n_docs,
         CAST(sum(doc_len) AS DOUBLE) / count(*) AS avg_len
  FROM lens GROUP BY 1),
sh_df AS (
  SELECT shard, term, count(*) AS df
  FROM sh_postings GROUP BY 1, 2),
scored AS (
  SELECT p.shard, p.term,
         ln((ss.n_docs - d.df + 0.5) / (d.df + 0.5))
           * ((p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
              / ((p.tf::DOUBLE / l.doc_len)
                 + {K1} * (1 - {B} + {B} * l.doc_len / ss.avg_len)))
           AS s
  FROM sh_postings p
  JOIN sh_df d ON d.shard = p.shard AND d.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  JOIN sh_stat ss ON ss.shard = p.shard),
tmom AS (
  SELECT shard, term, count(*) AS n,
         sum(s) AS s1, sum(s * s) AS s2
  FROM scored GROUP BY 1, 2),
fit AS (
  SELECT t.shard,
         count(*) AS n_terms,
         exp(sum(ln(CAST(t.n AS DOUBLE))))
           * pow(CAST(max(ss.n_docs) AS DOUBLE), 1 - {nq}) AS f,
         sum(t.s1 / t.n) AS e,
         greatest(sum(greatest(
           t.s2 / t.n - (t.s1 / t.n) * (t.s1 / t.n), 0.0)),
           1e-12) AS v
  FROM tmom t JOIN sh_stat ss USING (shard)
  GROUP BY t.shard),
erlang AS (
  SELECT shard, n_terms, f, e,
         CAST(least(greatest(floor(e * e / v + 0.5), 1), 100)
              AS INTEGER) AS k
  FROM fit),
est AS (
  SELECT shard,
         CASE WHEN e <= 0 OR f <= 0 THEN 0.0 ELSE
           f * exp(-({s_c!r} / (e / k)))
             * list_sum(list_transform(range(k),
                 j -> pow({s_c!r} / (e / k), j)
                      / CAST(factorial(CAST(j AS INTEGER)) AS DOUBLE)))
         END AS est_docs
  FROM erlang WHERE n_terms = {nq}),
shards AS (SELECT DISTINCT doc_id % 2 AS shard FROM documents)
SELECT CAST(s.shard AS INTEGER) AS shard,
       round(coalesce(e.est_docs, 0.0), 6) AS est_docs
FROM shards s LEFT JOIN est e USING (shard)
"""


def _taily_gamma_p_series(k: str, x: str) -> str:
    """Regularized lower incomplete gamma P(k, x) as a DuckDB
    expression: P = e^{-x} Σ_{n≥0} x^{k+n}/Γ(k+n+1) — the exact
    series plans/federate._gammp sums (and whose continued-fraction
    branch equals to ~1e-15); truncated at 1200 terms, converged to
    full double precision for x ≲ 1e3 (the contract's x is O(1))."""
    return (
        f"list_sum(list_transform(range(1200), n -> "
        f"exp(-({x}) + (({k}) + n) * ln({x}) "
        f"- lgamma(({k}) + n + 1.0))))"
    )


def _taily_gamma_sf(k: str, th: str, s: str) -> str:
    """Gamma(shape k, scale th) survival P(X > s) — mirrors
    plans/federate._gamma_sf incl. the s<=0 short-circuit."""
    ps = _taily_gamma_p_series(k, f"({s}) / ({th})")
    return f"(CASE WHEN ({s}) <= 0 THEN 1.0 ELSE 1.0 - {ps} END)"


def _taily_gamma_sql(terms: list[str], n_c: int) -> str:
    """DuckDB mirror of the FULL plans/federate.taily_shard_scores
    broker (fractional Gamma shape + bisected global cutoff) over the
    doc_id-parity shard split.

    Same per-shard moment CTEs as :func:`_taily_erlang_sql`, then:
    the moment-merged all-shards Gamma (f_all, E_all, Var_all →
    k_all = E²/V, θ_all = V/E), the cutoff s_c solving
    f_all·SF(s_c) = n_c replayed as a recursive CTE running the
    engine's exact algorithm (hi-doubling while SF(hi) > p capped at
    1e12, then ≤200 bisection steps with the 1e-12·max(1,hi)
    early-stop — plans/federate._gamma_isf), and per-shard
    est = f_i·SF_i(s_c) with v clamped to ≥1e-12.  The incomplete
    gamma is the exact power series (SQL-expressible after all —
    this entry carried the contract's only ``no_oracle`` row for
    four rounds)."""
    ts = sorted(set(terms))
    term_list = ", ".join(f"'{t}'" for t in ts)
    nq = len(ts)
    sf_all_hi = _taily_gamma_sf("k_all", "th_all", "hi")
    sf_all_mid = _taily_gamma_sf("k_all", "th_all", "(lo + hi) / 2")
    sf_shard = _taily_gamma_sf(
        "(l.e * l.e / l.v)", "(l.v / l.e)", "c.s_c"
    )
    return f"""
WITH RECURSIVE {_TOKS}, {_LENS},
sh_postings AS (
  SELECT doc_id % 2 AS shard, term, doc_id, count(*) AS tf
  FROM toks WHERE term IN ({term_list}) GROUP BY 1, 2, 3),
sh_stat AS (
  SELECT doc_id % 2 AS shard, count(*) AS n_docs,
         CAST(sum(doc_len) AS DOUBLE) / count(*) AS avg_len
  FROM lens GROUP BY 1),
sh_df AS (
  SELECT shard, term, count(*) AS df
  FROM sh_postings GROUP BY 1, 2),
scored AS (
  SELECT p.shard, p.term,
         ln((ss.n_docs - d.df + 0.5) / (d.df + 0.5))
           * ((p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
              / ((p.tf::DOUBLE / l.doc_len)
                 + {K1} * (1 - {B} + {B} * l.doc_len / ss.avg_len)))
           AS s
  FROM sh_postings p
  JOIN sh_df d ON d.shard = p.shard AND d.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  JOIN sh_stat ss ON ss.shard = p.shard),
tmom AS (
  SELECT shard, term, count(*) AS n,
         sum(s) AS s1, sum(s * s) AS s2
  FROM scored GROUP BY 1, 2),
fit AS (
  SELECT t.shard,
         count(*) AS n_terms,
         exp(sum(ln(CAST(t.n AS DOUBLE))))
           * pow(CAST(max(ss.n_docs) AS DOUBLE), 1 - {nq}) AS f,
         sum(t.s1 / t.n) AS e,
         sum(greatest(
           t.s2 / t.n - (t.s1 / t.n) * (t.s1 / t.n), 0.0)) AS v_raw
  FROM tmom t JOIN sh_stat ss USING (shard)
  GROUP BY t.shard),
live AS (
  SELECT shard, f, e, v_raw, greatest(v_raw, 1e-12) AS v
  FROM fit WHERE n_terms = {nq} AND f > 0 AND e > 0),
gpar AS (
  SELECT f_all, e_all,
         e_all * e_all / var_all AS k_all,
         var_all / e_all AS th_all
  FROM (
    SELECT f_all, e_all,
           greatest(m2_all - e_all * e_all, 1e-12) AS var_all
    FROM (
      SELECT sum(f) AS f_all,
             sum(f * e) / sum(f) AS e_all,
             sum(f * (v_raw + e * e)) / sum(f) AS m2_all
      FROM live))),
bis AS (
  SELECT 0 AS step, 'grow' AS ph,
         CAST(0.0 AS DOUBLE) AS lo,
         CAST(CASE WHEN greatest(k_all * th_all, th_all) = 0
              THEN 1.0 ELSE greatest(k_all * th_all, th_all) END
              AS DOUBLE) AS hi,
         0 AS it,
         k_all, th_all, CAST({n_c} AS DOUBLE) / f_all AS p
  FROM gpar WHERE {n_c} < f_all
  UNION ALL
  SELECT step + 1,
         CASE WHEN ph = 'grow' THEN
           CASE WHEN {sf_all_hi} > p AND hi * 2 <= 1e12
                THEN 'grow' ELSE 'bis' END
         ELSE
           CASE WHEN it + 1 >= 200
                     OR (CASE WHEN {sf_all_mid} > p
                         THEN hi ELSE (lo + hi) / 2 END)
                      - (CASE WHEN {sf_all_mid} > p
                         THEN (lo + hi) / 2 ELSE lo END)
                      <= 1e-12 * greatest(1.0,
                        CASE WHEN {sf_all_mid} > p
                        THEN hi ELSE (lo + hi) / 2 END)
                THEN 'done' ELSE 'bis' END
         END,
         CASE WHEN ph = 'grow' THEN lo
              WHEN {sf_all_mid} > p
              THEN (lo + hi) / 2 ELSE lo END,
         CASE WHEN ph = 'grow' THEN
           CASE WHEN {sf_all_hi} > p THEN hi * 2 ELSE hi END
              WHEN {sf_all_mid} > p
              THEN hi ELSE (lo + hi) / 2 END,
         CASE WHEN ph = 'grow' THEN it ELSE it + 1 END,
         k_all, th_all, p
  FROM bis WHERE ph IN ('grow', 'bis')),
cutoff AS (
  SELECT CASE
    WHEN NOT EXISTS (SELECT 1 FROM gpar WHERE {n_c} < f_all) THEN 0.0
    ELSE (SELECT (lo + hi) / 2 FROM bis ORDER BY step DESC LIMIT 1)
  END AS s_c),
est AS (
  SELECT l.shard, l.f * {sf_shard} AS est_docs
  FROM live l CROSS JOIN cutoff c),
shards AS (SELECT DISTINCT doc_id % 2 AS shard FROM documents)
SELECT CAST(s.shard AS INTEGER) AS shard,
       round(coalesce(e.est_docs, 0.0), 6) AS est_docs
FROM shards s LEFT JOIN est e USING (shard)
"""


def _kneser_ney_sql(d: float = 0.75) -> str:
    """DuckDB mirror of operators/curation.kneser_ney_logprob:
    interpolated KN with fixed discount — max(c2−D,0)/c1 +
    (D·N1+(w1,·)/c1)·N1+(·,w2)/N1+(·,·)."""
    return f"""
WITH {_TOKS_POS},
big AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
lft AS (SELECT w1, sum(c2) AS c1, count(*) AS n_cont
        FROM c2 GROUP BY 1),
rgt AS (SELECT w2, count(*) AS n_ctx FROM c2 GROUP BY 1),
nt AS (SELECT count(*) AS n_types FROM c2),
per AS (
  SELECT big.doc_id,
         -ln(greatest(c2.c2 - {d}, 0) / lft.c1
             + ({d} * lft.n_cont / lft.c1)
               * (rgt.n_ctx / CAST(nt.n_types AS DOUBLE))) AS nlp
  FROM big JOIN c2 USING (w1, w2) JOIN lft USING (w1)
  JOIN rgt USING (w2) CROSS JOIN nt)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nlp), 6) AS nll, round(exp(avg(nlp)), 6) AS ppl
FROM per GROUP BY 1
"""


def _ppl_buckets_sql(d: float = 0.75) -> str:
    """DuckDB mirror of operators/curation.perplexity_buckets: the
    KN per-doc perplexity (same CTEs as _kneser_ney_sql) cut into
    CCNet head/middle/tail by per-language ntile over
    (ppl asc, doc_id asc)."""
    return f"""
WITH {_TOKS_POS},
big AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
lft AS (SELECT w1, sum(c2) AS c1, count(*) AS n_cont
        FROM c2 GROUP BY 1),
rgt AS (SELECT w2, count(*) AS n_ctx FROM c2 GROUP BY 1),
nt AS (SELECT count(*) AS n_types FROM c2),
per AS (
  SELECT big.doc_id,
         -ln(greatest(c2.c2 - {d}, 0) / lft.c1
             + ({d} * lft.n_cont / lft.c1)
               * (rgt.n_ctx / CAST(nt.n_types AS DOUBLE))) AS nlp
  FROM big JOIN c2 USING (w1, w2) JOIN lft USING (w1)
  JOIN rgt USING (w2) CROSS JOIN nt),
kn AS (SELECT doc_id, round(exp(avg(nlp)), 6) AS ppl
       FROM per GROUP BY 1),
lab AS (SELECT dd.doc_id, dd.lang, kn.ppl,
               ntile(3) OVER (PARTITION BY dd.lang
                              ORDER BY kn.ppl ASC, dd.doc_id ASC)
                 AS ntl
        FROM documents dd JOIN kn ON kn.doc_id = dd.doc_id)
SELECT doc_id, lang, ppl,
       CASE ntl WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
FROM lab
"""


def _lm_jm_sql(terms: list[str], lam: float = 0.3,
               limit: int = 10) -> str:
    """DuckDB mirror of plans/lm.search_lm(smoothing="jm"):
    Jelinek–Mercer query likelihood, rank-preserving present-term
    decomposition Σ ln(1 + ((1−λ)/λ)·tf/(len·cf/|C|)) — no per-doc
    constant term."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    ratio = (1.0 - lam) / lam
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
tot AS (SELECT CAST(sum(doc_len) AS DOUBLE) AS c FROM lens),
qt AS (SELECT p.term, CAST(sum(p.tf) AS DOUBLE) AS cf
       FROM postings p
       WHERE p.term IN ({term_list})
         AND p.term NOT IN (SELECT term FROM stop)
       GROUP BY 1),
scored AS (
  SELECT p.doc_id,
         sum(ln(1 + {ratio!r} * p.tf::DOUBLE
                / (l.doc_len * qt.cf / tot.c))) AS score
  FROM postings p
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN tot
  GROUP BY 1),
ranked AS (SELECT doc_id, round(score, 6) AS score,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
           FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _min_span_sql(t0: str, t1: str) -> str:
    """DuckDB mirror of operators/phrases.min_cover_span for two
    terms: the minimum cover span equals min |pos_a − pos_b|."""
    return f"""
WITH {_TOKS_POS},
a AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t0}'),
b AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t1}')
SELECT a.doc_id, CAST(min(abs(a.pos - b.pos)) AS INTEGER) AS span
FROM a JOIN b USING (doc_id)
GROUP BY 1
"""


def _proximity_sql(terms: list[str], prox_weight: float = 1.0,
                   depth: int = 50, limit: int = 10) -> str:
    """DuckDB mirror of operators/phrases.proximity_search (m=2):
    unrounded BM25 rarest-candidate scores, top-``depth`` pool, min
    |pos_a − pos_b| span, the (1 + w/(1 + span − 1)) boost, re-rank."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    t0, t1 = sorted(terms)
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ({term_list})
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0),
rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC LIMIT 1),
cand AS (SELECT p.doc_id FROM postings p JOIN rarest r ON p.term = r.term),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY 1),
pool AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {depth}),
{_TOKS_POS},
a AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t0}'),
b AS (SELECT doc_id, pos FROM toks_pos WHERE term = '{t1}'),
spans AS (SELECT a.doc_id, min(abs(a.pos - b.pos)) AS span
          FROM a JOIN b USING (doc_id) GROUP BY 1),
boosted AS (
  SELECT p.doc_id,
         CASE WHEN s.span IS NOT NULL
              THEN p.score * (1.0 + {prox_weight} / (1.0 + s.span - 1))
              ELSE p.score END AS score
  FROM pool p LEFT JOIN spans s USING (doc_id)),
ranked AS (SELECT doc_id, round(score, 6) AS score,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
           FROM boosted)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {limit}
"""


def _bigram_sql(alpha: float = 0.1) -> str:
    """DuckDB mirror of operators/curation.bigram_logprob: bigrams by
    positional self-join (pos+1), add-α conditional probabilities
    against bigram-prefix counts, vocab = distinct unigrams."""
    return f"""
WITH {_TOKS_POS},
big AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
        FROM toks_pos a
        JOIN toks_pos b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
v AS (SELECT count(DISTINCT term) AS v FROM toks_pos),
per AS (
  SELECT big.doc_id,
         -ln((c2.c2 + {alpha}) / (c1.c1 + {alpha} * v.v)) AS nlp
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nlp), 6) AS nll, round(exp(avg(nlp)), 6) AS ppl
FROM per GROUP BY 1
"""


_LATEST_SNAPSHOT_SQL = """
WITH g AS (
  SELECT doc_id, source, doc_id // 3 AS k FROM documents)
SELECT 'https://' || source || '.example/p/' || CAST(k AS VARCHAR)
         AS canonical_url,
       max(doc_id) AS doc_id
FROM g GROUP BY source, k
"""


def _site_quality_sql(toks_list: str, stopword_list: str) -> str:
    """DuckDB mirror of operators/curation.site_quality_stats — the
    per-doc quality expression is the text_quality oracle's, averaged
    per domain (per-doc round 6, then round-6 average, matching the
    engine's quality_score → avg order)."""
    return f"""
WITH lt AS (
  SELECT doc_id, source, text, {toks_list} AS tokens FROM documents),
q AS (
  SELECT source AS site,
         round(
           0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
           + 0.3 * (CASE WHEN length(lower(text)) > 0
               THEN length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                    / length(lower(text)) ELSE 0.0 END)
           + 0.3 * (1.0 - abs((CASE WHEN len(tokens) > 0
               THEN len(list_filter(tokens,
                    t -> t IN ({stopword_list})))::DOUBLE / len(tokens)
               ELSE 0.0 END) - 0.15) / 0.85), 6) AS q
  FROM lt)
SELECT site, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(q), 6) AS avg_quality
FROM q GROUP BY 1
"""


def _rank_eval_sql(k: int = 10) -> str:
    """DuckDB mirror of plans/eval.rank_eval over the deterministic
    summed-tf run and graded (matching-terms − 1) qrels built by the
    rank_eval contract query."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in EVAL_QUERIES
        for t in sorted(set(q.split()))
    )
    return f"""
WITH {_TOKS}, {_POSTINGS},
qt(query_id, term) AS (VALUES {qvals}),
j AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
      FROM postings p JOIN qt ON qt.term = p.term),
qrels AS (SELECT query_id, doc_id,
                 CAST(count(DISTINCT term) - 1 AS INTEGER) AS rel
          FROM j GROUP BY 1, 2),
scores AS (SELECT query_id, doc_id, sum(tf) AS s FROM j GROUP BY 1, 2),
run AS (SELECT query_id, doc_id, rn FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, doc_id ASC)
                AS INTEGER) AS rn
    FROM scores) WHERE rn <= {k}),
pos AS (SELECT * FROM qrels WHERE rel > 0),
hits AS (SELECT r.query_id, r.doc_id, r.rn, p.rel
         FROM run r JOIN pos p USING (query_id, doc_id)),
gains AS (SELECT query_id,
                 max(1.0 / rn) AS rr,
                 sum((pow(2.0, rel) - 1) / log2(rn + 1)) AS dcg,
                 CAST(count(*) AS DOUBLE) AS n_hit
          FROM hits GROUP BY 1),
ideal AS (SELECT query_id,
                 sum((pow(2.0, rel) - 1) / log2(ir + 1)) AS idcg
          FROM (SELECT query_id, rel, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY rel DESC, doc_id ASC)
                         AS ir
                FROM pos) WHERE ir <= {k} GROUP BY 1),
nrel AS (SELECT query_id, CAST(count(*) AS DOUBLE) AS n_rel
         FROM pos GROUP BY 1)
SELECT n.query_id,
       round(coalesce(g.rr, 0), 6) AS rr,
       round(CASE WHEN i.idcg > 0
                  THEN coalesce(g.dcg, 0) / i.idcg
                  ELSE 0 END, 6) AS ndcg,
       round(coalesce(g.n_hit, 0) / n.n_rel, 6) AS recall
FROM nrel n JOIN ideal i USING (query_id)
LEFT JOIN gains g USING (query_id)
"""


def _tune_sql(k: int = 10) -> str:
    """DuckDB mirror of plans/tuning.tune_bm25 over EVAL_QUERIES /
    TUNING_GRID: parameter-independent rarest-term candidates, per-
    combo BM25 with grid k1/b columns, then rank_eval's metric
    definitions (rounded per query, then averaged) per combo."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in EVAL_QUERIES
        for t in sorted(set(q.split()))
    )
    gvals = ", ".join(
        f"({i}, CAST({k1} AS DOUBLE), CAST({b} AS DOUBLE))"
        for i, (k1, b) in enumerate(TUNING_GRID)
    )
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt0(query_id, term) AS (VALUES {qvals}),
j AS (SELECT qt0.query_id, p.doc_id, p.term, p.tf
      FROM postings p JOIN qt0 ON qt0.term = p.term),
qrels AS (SELECT query_id, doc_id,
                 CAST(count(DISTINCT term) - 1 AS INTEGER) AS rel
          FROM j GROUP BY 1, 2),
qt AS (SELECT q.query_id, q.term, ts.df,
              ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
       FROM (SELECT DISTINCT query_id, term FROM qt0) q
       JOIN tstats ts ON ts.term = q.term CROSS JOIN nn
       WHERE q.term NOT IN (SELECT term FROM stop)
         AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0),
rarest AS (SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY df ASC, term ASC) AS rr
    FROM qt) WHERE rr = 1),
cand AS (SELECT r.query_id, p.doc_id
         FROM postings p JOIN rarest r ON r.term = p.term),
m AS (SELECT qt.query_id, p.doc_id, p.tf, qt.idf, l.doc_len
      FROM postings p
      JOIN qt ON qt.term = p.term
      JOIN lens l ON l.doc_id = p.doc_id),
grid(combo, k1, b) AS (VALUES {gvals}),
scored AS (
  SELECT g.combo, g.k1, g.b, c.query_id, c.doc_id,
         sum(m.idf * (m.tf::DOUBLE / m.doc_len) * (g.k1 + 1)
             / ((m.tf::DOUBLE / m.doc_len)
                + g.k1 * (1 - g.b + g.b * m.doc_len / nn.avg_len)))
           AS s
  FROM cand c
  JOIN m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
  CROSS JOIN grid g CROSS JOIN nn
  GROUP BY 1, 2, 3, 4, 5),
run AS (SELECT combo, query_id, doc_id, rn FROM (
    SELECT combo, query_id, doc_id,
           row_number() OVER (PARTITION BY combo, query_id
                              ORDER BY s DESC, doc_id ASC) AS rn
    FROM scored) WHERE rn <= {k}),
pos AS (SELECT * FROM qrels WHERE rel > 0),
hits AS (SELECT r.combo, r.query_id, r.rn, p.rel
         FROM run r JOIN pos p
           ON p.query_id = r.query_id AND p.doc_id = r.doc_id),
gains AS (SELECT combo, query_id,
                 max(1.0 / rn) AS rr,
                 sum((pow(2.0, rel) - 1) / log2(rn + 1)) AS dcg,
                 CAST(count(*) AS DOUBLE) AS n_hit
          FROM hits GROUP BY 1, 2),
ideal AS (SELECT query_id,
                 sum((pow(2.0, rel) - 1) / log2(ir + 1)) AS idcg
          FROM (SELECT query_id, rel, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY rel DESC,
                                                   doc_id ASC) AS ir
                FROM pos) WHERE ir <= {k} GROUP BY 1),
nrel AS (SELECT query_id, CAST(count(*) AS DOUBLE) AS n_rel
         FROM pos GROUP BY 1),
perq AS (
  SELECT gc.combo, n.query_id,
         round(coalesce(ga.rr, 0), 6) AS rr,
         round(CASE WHEN i.idcg > 0
                    THEN coalesce(ga.dcg, 0) / i.idcg
                    ELSE 0 END, 6) AS ndcg,
         round(coalesce(ga.n_hit, 0) / n.n_rel, 6) AS recall
  FROM nrel n
  JOIN ideal i USING (query_id)
  CROSS JOIN (SELECT DISTINCT combo FROM grid) gc
  LEFT JOIN gains ga
    ON ga.combo = gc.combo AND ga.query_id = n.query_id)
SELECT p.combo, g.k1, g.b,
       round(avg(rr), 6) AS mrr,
       round(avg(ndcg), 6) AS ndcg,
       round(avg(recall), 6) AS recall
FROM perq p JOIN grid g ON g.combo = p.combo
GROUP BY 1, 2, 3
"""


def _percolate_sql(queries: list[tuple[int, str]], mode: str) -> str:
    """DuckDB mirror of plans/percolate.percolate over the documents
    table (tokens analyzer): same stop-list removal, Robertson-IDF
    positivity drop, R13 rarest-term membership (``mode='rarest'``)
    or conjunctive containment (``mode='all'``), and the shared BM25
    per-term arithmetic."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in queries
        for t in sorted(set(q.split()))
    )
    cond = (
        "matched_terms = n_terms" if mode == "all" else "has_rarest = 1"
    )
    return f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qraw(query_id, term) AS (VALUES {qvals}),
qt AS (
  SELECT qraw.query_id, ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM qraw JOIN tstats ts USING (term) CROSS JOIN nn
  WHERE ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
qn AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
rarest AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY idf DESC, term ASC) AS rn
    FROM qt) WHERE rn = 1
),
matched AS (
  SELECT qt.query_id, p.doc_id, l.site, qt.term,
         qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
           / ((p.tf::DOUBLE / l.doc_len)
              + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len)) AS ts
  FROM postings p
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN nn
),
agg AS (
  SELECT m.query_id, m.doc_id, m.site,
         sum(m.ts) AS score,
         CAST(count(*) AS INTEGER) AS matched_terms,
         max(CASE WHEN r.term IS NOT NULL THEN 1 ELSE 0 END) AS has_rarest
  FROM matched m
  LEFT JOIN rarest r ON r.query_id = m.query_id AND r.term = m.term
  GROUP BY 1, 2, 3
)
SELECT CAST(a.query_id AS BIGINT) AS query_id, a.doc_id, a.site,
       round(a.score, 6) AS score, a.matched_terms
FROM agg a JOIN qn USING (query_id)
WHERE {cond}
"""


def _canonical_urls_sql() -> str:
    """DuckDB mirror of operators/curation.canonical_url_col over the
    same deterministically-synthesized messy URLs (tracking strip-list
    imported from the engine so the two sides cannot drift)."""
    from search_engine_spark.operators.curation import TRACKING_PARAMS

    tracked = ", ".join(f"'{t.lower()}'" for t in TRACKING_PARAMS)
    return rf"""
WITH messy AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example:443//p//'
                  || CAST(doc_id AS VARCHAR) || '/?utm_source=x&b=2&a=1'
      WHEN 1 THEN 'http://' || source || '.example.:80/p/'
                  || CAST(doc_id AS VARCHAR) || '?fbclid=zz&z=9&y=#sec'
      WHEN 2 THEN 'HTTP://' || upper(source) || '.EXAMPLE/P//'
                  || CAST(doc_id AS VARCHAR)
      ELSE 'https://' || source || '.example/p/'
           || CAST(doc_id AS VARCHAR) || '/?b=2&a=1&ref=tw'
    END AS u
  FROM documents),
parts AS (
  SELECT doc_id, u,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS host0,
    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(u, '\?([^#]*)', 1) AS query0
  FROM messy),
norm AS (
  SELECT doc_id, u, scheme,
    regexp_replace(regexp_replace(
      CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
           WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
           ELSE host0 END, '\.$', ''), '^www\.', '') AS host,
    regexp_replace(regexp_replace(path0, '/{{2,}}', '/', 'g'), '/+$', '') AS path,
    list_sort(list_filter(string_split(query0, '&'),
      p -> p <> ''
        AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
        AND lower(split_part(p, '=', 1)) NOT IN ({tracked})
    )) AS params
  FROM parts)
SELECT doc_id,
  CASE WHEN scheme IN ('http', 'https') THEN
    scheme || '://' || host || path ||
    CASE WHEN len(params) > 0
         THEN '?' || array_to_string(params, '&') ELSE '' END
  ELSE trim(u) END AS canonical_url
FROM norm
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents (rank semantics of
    the reference search endpoint)."""
    return _search_docs(spark, "/root/testdata/sf0.001", FLAGSHIP_QUERY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_engine_spark.functions.analysis import (
        alpha_ratio,
        bpe_token_count,
        fingerprint,
        lang_id,
        quality_score,
        stopword_ratio,
        ws_token_count,
    )
    from search_engine_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_table,
    )
    from search_engine_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    def tokenize_doclen(spark, sf):
        return _docs_enriched(spark, sf).select(
            "doc_id", F.col("doc_len").cast("long").alias("doc_len")
        )

    def postings_q(spark, sf):
        idx = _docs_index(spark, sf)
        return idx.postings.select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def term_stats_q(spark, sf):
        return _docs_index(spark, sf).term_stats.select("term", "df")

    def doc_stats_q(spark, sf):
        idx = _docs_index(spark, sf)
        return spark.createDataFrame(
            [(idx.n_docs, idx.avg_len)], "n_docs long, avg_len double"
        )

    def stoplist_q(spark, sf):
        idx = _docs_index(spark, sf)
        return spark.createDataFrame(
            [(t,) for t in idx.stoplist], "term string"
        )

    def idf_q(spark, sf):
        from search_engine_spark.plans.search import query_term_idf

        idx = _docs_index(spark, sf)
        idf = query_term_idf(idx, FLAGSHIP_TERMS)
        rows = [(t, float(round(v, 6))) for t, v in sorted(idf.items())]
        return spark.createDataFrame(rows, "term string, idf double")

    def bm25_topk(spark, sf):
        return _search_docs(spark, sf, FLAGSHIP_QUERY, limit=10)

    def more_like_this_q(spark, sf):
        """Lucene-style More-Like-This (plans/search.more_like_this):
        the source doc's top-8 tf·idf non-stop df>1 index terms drive
        a union-candidate BM25 ranking with the source excluded —
        term selection, pool-before-filter quirk, and original rank
        preservation all hash-checked against the DuckDB replay."""
        from search_engine_spark.plans.search import more_like_this

        idx = _docs_index(spark, sf)
        res = more_like_this(idx, MLT_SRC_DOC, k=10, n_terms=8)
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def impact_topk_q(spark, sf):
        """Anytime ranking by 8-bit quantized impacts
        (plans/impact.py, Anh–Moffat): score = Σ idf·q over union
        candidates — no doc-length join at query time; the length
        normalization was baked into q at build time."""
        from search_engine_spark.plans.impact import impact_topk

        idx = _docs_index(spark, sf)
        res = impact_topk(
            idx, FLAGSHIP_QUERY, bits=8, limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_topk_pruned_q(spark, sf):
        """Exact BM25 over a statically-pruned index (plans/impact.
        prune_postings, Carmel et al.): each term keeps only its 20
        highest-impact postings; full-corpus stats are preserved so
        surviving postings score identically to the full index."""
        from search_engine_spark.plans.impact import prune_postings
        from search_engine_spark.plans.search import search

        idx = _docs_index(spark, sf)
        pruned = prune_postings(idx, keep_per_term=20)
        res = search(
            pruned, FLAGSHIP_QUERY, limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_rescore_topk_q(spark, sf):
        """Two-stage retrieve-then-rescore (plans/impact.rescore_topk,
        Lucene QueryRescorer semantics): 8-bit quantized-impact first
        pass picks 25 candidates, exact BM25 re-ranks them."""
        from search_engine_spark.plans.impact import rescore_topk

        idx = _docs_index(spark, sf)
        res = rescore_topk(
            idx, FLAGSHIP_QUERY, first_k=25, limit=10, bits=8,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def vsm_topk_q(spark, sf):
        """SMART lnc.ltc TF-IDF cosine top-10 (plans/vsm.py) — the
        classic vector-space ranking next to BM25 and Dirichlet LM."""
        from search_engine_spark.plans.vsm import vsm_topk

        idx = _docs_index(spark, sf)
        return vsm_topk(
            idx, FLAGSHIP_QUERY, limit=10, analyzer="tokens"
        )

    def bm25_federated_topk(spark, sf):
        """Federated BM25 over TWO disjoint half-corpus compact
        indexes (plans/federate.py) — exact merged global stats, so
        the oracle is the unchanged monolithic bm25_topk SQL."""
        from search_engine_spark.plans.federate import search_federated

        shards = _docs_compact_shards(spark, sf)
        res = search_federated(
            shards, FLAGSHIP_QUERY, limit=10, analyzer="tokens"
        )
        return res.select(
            F.col("nat_id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def cori_shard_scores_q(spark, sf):
        """CORI resource ranking (plans/federate.cori_shard_scores)
        over the two parity-split shards — per-shard belief for the
        flagship query from shard metadata only."""
        from search_engine_spark.plans.federate import (
            cori_shard_scores,
        )

        shards = _docs_compact_shards(spark, sf)
        scores = cori_shard_scores(
            shards, FLAGSHIP_QUERY, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(int(i), round(float(b), 6)) for i, b in scores],
            "shard int, belief double",
        )

    def redde_shard_scores_q(spark, sf):
        """ReDDE sample-based resource selection (plans/federate.
        redde_csi + redde_shard_scores, Si & Callan SIGIR 2003) over
        the two parity-split shards: md5-hash 50% sample into a
        central sample index, BM25 top-20 votes scaled by each
        shard's inverse sampling rate, normalized."""
        from search_engine_spark.plans.federate import (
            redde_csi,
            redde_shard_scores,
        )

        docs = _docs_enriched(spark, sf)
        shards = [
            docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)
        ]
        csi, shard_of, sizes = redde_csi(
            shards, fraction=0.5, id_col="doc_id", analyzer="tokens"
        )
        return redde_shard_scores(
            csi, shard_of, sizes, FLAGSHIP_QUERY, n_csi=20,
            analyzer="tokens",
        )

    def _taily_parity_stats(spark, sf):
        """Per-parity-shard Taily broker stats, cached per (spark,
        sf) — shared by the full-Gamma and Erlang contract entries."""
        from search_engine_spark.operators.postings import build_index
        from search_engine_spark.plans.federate import taily_term_stats

        key = (id(spark), sf, "taily_stats")
        if key not in _FED_CACHE:
            docs = _docs_enriched(spark, sf)
            stats = []
            for i in range(2):
                idx = build_index(
                    docs.filter(F.col("doc_id") % 2 == i),
                    id_col="doc_id", analyzer="tokens",
                )
                stats.append((taily_term_stats(idx).cache(), idx.n_docs))
            _FED_CACHE[key] = stats
        return _FED_CACHE[key]

    def taily_shard_scores_q(spark, sf):
        """Taily resource selection (plans/federate.taily_shard_scores,
        Aly et al. 2013) over the two parity-split shards — Gamma
        moment-matched estimate of each shard's top-n_c contribution.
        n_c=2 < f_all, so the FULL path runs: fractional-shape fit,
        moment-merged all-shards Gamma, and the bisected global
        cutoff.  Hash-checked since r05: the oracle replays the
        incomplete-gamma power series and the engine's exact
        bisection as a recursive CTE (_taily_gamma_sql); the Erlang
        twin below stays as the closed-form cross-check."""
        from search_engine_spark.plans.federate import taily_shard_scores

        stats = _taily_parity_stats(spark, sf)
        scores = taily_shard_scores(
            stats, TAILY_MULTI_QUERY, n_c=TAILY_NC, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(int(i), round(float(s), 6)) for i, s in scores],
            "shard int, est_docs double",
        )

    def taily_shard_scores_erlang_q(spark, sf):
        """Integer-shape (Erlang) Taily variant (plans/federate.
        taily_shard_scores_erlang) — DuckDB-checked end-to-end: the
        oracle recomputes the per-shard score moments, the Gamma fit
        with k = floor(E²/V + 0.5) and the finite Erlang survival sum
        from the raw documents table.  Query "dup" fits k=1 on one
        shard and k=3 on the other."""
        from search_engine_spark.plans.federate import (
            taily_shard_scores_erlang,
        )

        stats = _taily_parity_stats(spark, sf)
        scores = taily_shard_scores_erlang(
            stats, TAILY_QUERY, TAILY_SC, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(int(i), round(float(s), 6)) for i, s in scores],
            "shard int, est_docs double",
        )

    def tiered_merge_postings_q(spark, sf):
        """Size-tiered LSM consolidation (plans/incremental.
        merge_delta_epochs(policy='tiered')): base build + three
        different-sized appends, then a tiered merge that rewrites
        only the smallest size tier — the decoded live postings must
        still equal the from-scratch recount of the whole corpus
        (merge choice is a physical-layout decision; the logical
        (term, doc, tf) multiset is invariant by construction)."""
        import tempfile

        from search_engine_spark.config import BM25Config, EngineConfig
        from search_engine_spark.operators.compact import (
            decode_segments,
        )
        from search_engine_spark.plans.build import (
            build_and_write,
            load_stats,
            read_segments,
            table_path,
        )
        from search_engine_spark.plans.incremental import (
            append_pages,
            merge_delta_epochs,
        )

        key = (id(spark), sf, "tiered")
        if key not in _INCR_CACHE:
            out = tempfile.mkdtemp(prefix="tiered_contract_")
            pages = _docs_enriched(spark, sf).select(
                "doc_id", "url", "text", "lang"
            )
            config = EngineConfig(
                bm25=BM25Config(k1=K1, b=B), index_buckets=4
            )
            build_and_write(
                spark, pages.filter(F.col("doc_id") % 10 < 8)
                .drop("doc_id"),
                out, analyzer="tokens", config=config, n_segments=4,
            )
            deltas = [
                pages.filter(F.col("doc_id") % 10 == 8),      # big
                pages.filter(
                    (F.col("doc_id") % 10 == 9)
                    & (F.col("doc_id") % 20 == 9)
                ),                                            # small
                pages.filter(
                    (F.col("doc_id") % 10 == 9)
                    & (F.col("doc_id") % 20 == 19)
                ),                                            # small
            ]
            for d in deltas:
                append_pages(spark, out, d.drop("doc_id"))
            res = merge_delta_epochs(
                spark, out, policy="tiered", tier_ratio=3.0
            )
            assert res["merged_epochs"] >= 2, res
            meta = load_stats(spark, out)
            nat = F.regexp_extract(
                F.col("url"), r"([0-9]+)$", 1
            ).cast("long")
            docs_map = spark.read.parquet(
                table_path(out, "docs", meta)
            )
            posts = decode_segments(read_segments(spark, out, meta))
            (
                posts.join(docs_map.select("doc_id", "url"), "doc_id")
                .select(
                    nat.alias("doc_id"), "term",
                    F.col("tf").cast("long").alias("tf"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(out, "check_postings_tiered"))
            )
            _INCR_CACHE[key] = out
        return spark.read.parquet(
            os.path.join(_INCR_CACHE[key], "check_postings_tiered")
        )

    def incremental_postings_q(spark, sf):
        """Live postings after build→append×2→tombstone→reindex→
        merge_delta_epochs (R10/R23–R25 + N3), tombstones applied the
        query-path way; the oracle recomputes postings from the
        logical final corpus (see :func:`_incremental_dir`)."""
        out = _incremental_dir(spark, sf)
        return spark.read.parquet(
            os.path.join(out, "check_postings_merged")
        )

    def incremental_vacuum_postings_q(spark, sf):
        """Postings decoded from the physically vacuumed index (S8 +
        N3 full rewrite) — must equal the pre-vacuum live view and
        the same recomputed oracle."""
        out = _incremental_dir(spark, sf)
        return spark.read.parquet(
            os.path.join(out, "check_postings_final")
        )

    def time_travel_postings_q(spark, sf):
        """Snapshot time travel (plans/incremental.open_index_at):
        after the FULL maintenance lifecycle (append×2, tombstone,
        reindex, merge, vacuum), generation 1 — the untouched base
        corpus — is read back through its archived descriptor; the
        oracle recomputes those postings from the original
        doc_id%10<8 corpus slice.  Green means the snapshot masks
        (archived paths + delta-epoch list + id-segment cursor +
        per-gen tombstones) are exact."""
        out = _incremental_dir(spark, sf)
        return spark.read.parquet(
            os.path.join(out, "check_postings_gen1")
        )

    def incremental_positions_q(spark, sf):
        """The compressed positional index after its full maintenance
        lifecycle (build→append→reindex→tombstone→vacuum with
        positional co-maintenance and co-vacuum) decoded in full —
        the oracle recomputes (doc, term, pos) from the logical final
        corpus with unnest-with-ordinality."""
        out = _incremental_pos_dir(spark, sf)
        return spark.read.parquet(
            os.path.join(out, "check_positions_final")
        )

    def incremental_term_stats_q(spark, sf):
        """The MAINTAINED df table after the full lifecycle — merged
        by addition on append (R10), decremented via decoded dead-doc
        term lists on tombstone (R24), recomputed by vacuum — vs the
        oracle's from-scratch recount."""
        out = _incremental_dir(spark, sf)
        from search_engine_spark.plans.build import (
            load_stats,
            table_path,
        )

        return spark.read.parquet(
            table_path(out, "term_stats", load_stats(spark, out))
        ).select("term", F.col("df").cast("long").alias("df"))

    def snippets_topk_q(spark, sf):
        """T8–T12 end-to-end over the lemma-analyzer top-10
        (SentenceUtil.java:15-135, SearchServiceImpl.java:137-162):
        sentence split, per-sentence query-lemma highlight
        (replaceIgnoreCase of the lowercased token), IDF-vector
        sentence ordering, 120-char crop arithmetic (quirks
        included), 300-char assembly.  The oracle replays the exact
        string arithmetic in DuckDB, hash-matching the full
        ``<b>…</b>`` snippet strings."""
        return _snippets_over(spark, sf, None)

    def _snippets_over(spark, sf, slices, fixed_idf=None):
        """jobs/search.py's exact snippet flow: lemma top-10 →
        stop-removed query-lemma IDFs → attach_snippets; ``slices``
        optionally re-punctuates the corpus text (multi-sentence
        fixtures) and ``fixed_idf`` substitutes a caller-supplied
        lemma→idf map (the attach_snippets public contract)."""
        from search_engine_spark.plans.search import (
            analyze_query,
            query_term_idf,
            search,
        )
        from search_engine_spark.plans.snippets import attach_snippets

        idx = _docs_index_lemma(spark, sf)
        res = search(
            idx, FLAGSHIP_LEMMA_QUERY, limit=10, analyzer="lemma"
        )
        if fixed_idf is None:
            terms = [
                t
                for t in analyze_query(
                    FLAGSHIP_LEMMA_QUERY, analyzer="lemma"
                )
                if t not in set(idx.stoplist)
            ]
            lemma_idf = query_term_idf(idx, terms)
        else:
            lemma_idf = dict(fixed_idf)
        pages = _docs_enriched(spark, sf)
        if slices is not None:
            pages = pages.withColumn("text", _snip_text_spark(slices))
        out = attach_snippets(res, pages, lemma_idf, id_col="doc_id")
        return out.select(
            "doc_id", F.col("rn").cast("int").alias("rn"), "snippet"
        )

    def snippets_multisentence_q(spark, sf):
        """T8/T12/T11 over 3×120-char re-punctuated sentences with a
        dense fixed idf map — every sentence matches, so ordering
        compares real idf vectors and the 300-char budget engages."""
        return _snippets_over(spark, sf, SNIP3_SLICES, SNIP_FIXED_IDF)

    def snippets_assembly_cut_q(spark, sf):
        """T11's 300-char budget cut over 5×112-char sentences — the
        4th+ ordered pieces must drop when the running total passes
        the budget."""
        return _snippets_over(spark, sf, SNIP5_SLICES, SNIP_FIXED_IDF)

    def snippets_fixed_idf_q(spark, sf):
        """T10 crop on LONG single sentences (the unmodified 300–550
        char corpus rows) with many highlights: both crop sides, the
        word-boundary find/rfind arithmetic and the '...' affixes."""
        return _snippets_over(spark, sf, None, SNIP_FIXED_IDF)

    def taily_erlang_multiterm_q(spark, sf):
        """Two-term Erlang-Taily — exercises the co-occurrence
        estimate f = n_docs^(1−|Q|)·Π n_t and the summed per-term
        moments against the same DuckDB oracle family."""
        from search_engine_spark.plans.federate import (
            taily_shard_scores_erlang,
        )

        stats = _taily_parity_stats(spark, sf)
        scores = taily_shard_scores_erlang(
            stats, TAILY_MULTI_QUERY, TAILY_SC, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(int(i), round(float(s), 6)) for i, s in scores],
            "shard int, est_docs double",
        )

    def bm25_collapsed_topk(spark, sf):  # host-crowding collapse
        from search_engine_spark.plans.search import search_collapsed

        idx = _docs_index(spark, sf)
        res = search_collapsed(
            idx, FLAGSHIP_QUERY, per_site=2, limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_priors_topk(spark, sf):  # static-prior boosted ranking
        from search_engine_spark.plans.search import search_with_priors

        idx = _docs_index(spark, sf)
        priors = _read(spark, sf, "documents").select(
            "doc_id",
            (F.lit(1) + F.col("doc_id") % 10)
            .cast("double").alias("prior"),
        )
        res = search_with_priors(
            idx, FLAGSHIP_QUERY, priors, prior_weight=0.3,
            limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_fresh_topk(spark, sf):  # recency-decayed ranking
        # synthetic deterministic crawl timestamps: doc aged
        # (doc_id % 400) days at the fixed "now"; the engine goes
        # through real date arithmetic (to_date/datediff), the oracle
        # uses the closed form of the same decay
        from search_engine_spark.plans.freshness import search_fresh

        idx = _docs_index(spark, sf)
        now = "2026-08-19"
        pages = _read(spark, sf, "documents").select(
            "doc_id",
            F.date_sub(
                F.to_date(F.lit(now)),
                (F.col("doc_id") % 400).cast("int"),
            ).alias("warc_ts"),
        )
        res = search_fresh(
            idx, FLAGSHIP_QUERY, pages, now=now,
            half_life_days=90.0, prior_weight=0.3,
            limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_not_topk(spark, sf):
        return _search_docs(
            spark, sf, FLAGSHIP_QUERY, limit=10,
            exclude_terms=["window"],
        )

    def bm25_and_topk(spark, sf):  # strict-AND candidate mode
        return _search_docs(
            spark, sf, FLAGSHIP_QUERY, limit=10, candidates="all"
        )

    def bool_search(spark, sf):
        """Boolean mini-language: +must -must_not should."""
        from search_engine_spark.plans.boolquery import search_boolean

        idx = _docs_index(spark, sf)
        res = search_boolean(
            idx, "+key -window dup", limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_synonyms_topk(spark, sf):
        """Lucene-SynonymQuery semantics: group tf = Σ member tf,
        group df = exact union df (plans/synonyms.py)."""
        from search_engine_spark.plans.synonyms import search_synonyms

        idx = _docs_index(spark, sf)
        res = search_synonyms(
            idx, SYNONYM_QUERY, synonyms=SYNONYM_MAP, limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def sdm_topk(spark, sf):
        """Sequential Dependence Model (plans/sdm.py, Metzler & Croft
        2005): Dirichlet unigram + ordered-adjacent + unordered-window
        proximity features over the query token sequence."""
        from search_engine_spark.plans.sdm import search_sdm

        res = search_sdm(
            _docs_enriched(spark, sf), FLAGSHIP_QUERY,
            id_col="doc_id", limit=10,
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def qpp_predictors_q(spark, sf):
        """Pre-retrieval query performance predictors (plans/qpp.py
        — He & Ounis 2004 / Zhao et al. 2008): IDF moments, SCS,
        avg SCQ for the flagship query, one stats probe."""
        from search_engine_spark.plans.qpp import (
            preretrieval_predictors,
        )

        idx = _docs_index(spark, sf)
        p = preretrieval_predictors(
            idx, FLAGSHIP_QUERY, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(
                int(p["n_terms"]), round(p["avg_idf"], 6),
                round(p["max_idf"], 6), round(p["scs"], 6),
                round(p["avg_scq"], 6),
            )],
            "n_terms int, avg_idf double, max_idf double,"
            " scs double, avg_scq double",
        )

    def query_clarity_q(spark, sf):
        """Post-retrieval clarity score (plans/qpp.clarity_score,
        Cronen-Townsend et al. 2002): KL of the BM25 top-10 relevance
        model from the collection model."""
        from search_engine_spark.plans.qpp import clarity_score

        idx = _docs_index(spark, sf)
        c = clarity_score(
            idx, FLAGSHIP_QUERY, k=10, analyzer="tokens"
        )
        return spark.createDataFrame(
            [(round(float(c), 6),)], "clarity double"
        )

    def bm25plus_topk(spark, sf):
        """BM25+ (plans/bm25var.py, Lv & Zhai 2011): flat idf·δ
        lower bound on present terms fixes long-doc over-penalty."""
        from search_engine_spark.plans.bm25var import (
            search_bm25_variant,
        )

        idx = _docs_index(spark, sf)
        res = search_bm25_variant(
            idx, FLAGSHIP_QUERY, variant="plus", limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25l_topk(spark, sf):
        """BM25L (plans/bm25var.py): δ-shifted normalized tf before
        saturation — the other Lv & Zhai lower-bound fix."""
        from search_engine_spark.plans.bm25var import (
            search_bm25_variant,
        )

        idx = _docs_index(spark, sf)
        res = search_bm25_variant(
            idx, FLAGSHIP_QUERY, variant="l", limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_passage_topk(spark, sf):
        """Max-passage BM25 (plans/passage.py, Callan 1994 / Liu &
        Croft 2002): rank docs by their best disjoint 50-token
        passage; document-level IDF, passage-level normalization."""
        from search_engine_spark.plans.passage import passage_topk

        idx = _docs_index(spark, sf)
        res = passage_topk(
            idx, _docs_enriched(spark, sf), FLAGSHIP_QUERY,
            window=50, limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.col("passage").cast("int").alias("passage"),
            F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def pl2_topk(spark, sf):
        """PL2 divergence-from-randomness ranking (plans/dfr.py,
        Amati & van Rijsbergen 2002) — the third ranking family next
        to BM25 and query-likelihood LM."""
        from search_engine_spark.plans.dfr import search_pl2

        idx = _docs_index(spark, sf)
        res = search_pl2(
            idx, FLAGSHIP_QUERY, c=1.0, limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def lm_dirichlet_topk(spark, sf):
        """Dirichlet query-likelihood ranking (plans/lm.py) — the
        second ranking family next to BM25."""
        from search_engine_spark.plans.lm import search_lm

        idx = _docs_index(spark, sf)
        res = search_lm(
            idx, FLAGSHIP_QUERY, mu=500.0, limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def lm_jm_topk(spark, sf):
        """Jelinek–Mercer query-likelihood ranking (plans/lm.py,
        smoothing="jm") — interpolation smoothing in the same
        rank-preserving present-term decomposition."""
        from search_engine_spark.plans.lm import search_lm

        idx = _docs_index(spark, sf)
        res = search_lm(
            idx, FLAGSHIP_QUERY, smoothing="jm", lam=0.3, limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def min_span_docs(spark, sf):
        """Minimum cover span of PROX_TERMS per doc containing both
        (operators/phrases.min_cover_span)."""
        from search_engine_spark.operators.phrases import (
            min_cover_span,
            positional_postings,
        )

        pp = positional_postings(
            _docs_enriched(spark, sf), id_col="doc_id"
        )
        return min_cover_span(pp, PROX_TERMS, id_col="doc_id").select(
            "doc_id", F.col("span").cast("int").alias("span")
        )

    def proximity_topk(spark, sf):
        """BM25 top-50 re-ranked by term proximity
        (operators/phrases.proximity_search)."""
        from search_engine_spark.operators.phrases import (
            proximity_search,
        )

        idx = _docs_index(spark, sf)
        res = proximity_search(
            idx, _docs_enriched(spark, sf), SYNONYM_QUERY,
            prox_weight=1.0, rerank_depth=50, limit=10,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def near_topk(spark, sf):
        """Unordered NEAR/slop proximity query
        (operators/phrases.near_search)."""
        from search_engine_spark.operators.phrases import near_search

        idx = _docs_index(spark, sf)
        res = near_search(
            idx, _docs_enriched(spark, sf), " ".join(PROX_TERMS),
            slop=3, limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def next_token_q(spark, sf):
        """Bigram continuation suggestions
        (operators/curation.next_token_suggestions)."""
        from search_engine_spark.operators.curation import (
            next_token_suggestions,
        )

        return next_token_suggestions(
            _docs_enriched(spark, sf), "key", k=10
        ).select("next_term", "n")

    def corpus_diff_q(spark, sf):
        """Crawl-over-crawl drift report
        (operators/curation.corpus_diff) over two deterministic
        corpus slices."""
        from search_engine_spark.operators.curation import corpus_diff

        docs = _read(spark, sf, "documents")
        old = docs.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id", "text"
        )
        new = docs.filter(F.col("doc_id") % 7 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(" edited")),
            ).otherwise(F.col("text")).alias("text"),
        )
        return corpus_diff(old, new).select("doc_id", "status")

    def prefix_search_q(spark, sf):
        """Trailing-wildcard query 'v* dup' — dictionary expansion
        scored as one group (plans/prefix.search_prefix)."""
        from search_engine_spark.plans.prefix import search_prefix

        idx = _docs_index(spark, sf)
        res = search_prefix(
            idx, "v* dup", limit=10, analyzer="tokens"
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_search_after_q(spark, sf):
        """Cursor pagination (plans/search.search_after — ES
        search_after parity): page 2 of the flagship ranking via the
        (score, id) strict-successor filter; must equal the offset
        slice (the oracle ranks once and renumbers rows 6..10)."""
        from search_engine_spark.plans.search import (
            search,
            search_after,
        )

        idx = _docs_index(spark, sf)
        page1 = search(
            idx, FLAGSHIP_QUERY, limit=5, analyzer="tokens"
        ).collect()
        after = (page1[-1]["score"], page1[-1]["doc_id"])
        res = search_after(
            idx, FLAGSHIP_QUERY, after=after, limit=5,
            analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def explain_score_q(spark, sf):
        """Lucene/ES-_explain parity (plans/explain.explain_score):
        per-term BM25 breakdown of the flagship query's rank-1 doc;
        components sum to the production score (pytest-pinned)."""
        from search_engine_spark.plans.explain import explain_score
        from search_engine_spark.plans.search import search

        idx = _docs_index(spark, sf)
        top1 = search(
            idx, FLAGSHIP_QUERY, limit=1, analyzer="tokens"
        ).collect()[0]["doc_id"]
        parts = explain_score(
            idx, FLAGSHIP_QUERY, top1, analyzer="tokens"
        )
        return parts.select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_len").cast("long").alias("doc_len"),
            F.col("df").cast("long").alias("df"),
            F.round("idf", 6).alias("idf"),
            F.round("tf_norm", 6).alias("tf_norm"),
            F.round("term_score", 6).alias("term_score"),
        )

    def did_you_mean_q(spark, sf):
        """Context-sensitive noisy-channel query suggestion
        (plans/spell.suggest_query): bigram-LM Viterbi over exact
        SymSpell candidate sets for the typo query 'valu kay'."""
        from search_engine_spark.plans.spell import (
            bigram_count_table,
            suggest_query,
        )

        idx = _docs_index(spark, sf)
        big = bigram_count_table(_docs_enriched(spark, sf))
        got = suggest_query(idx, big, "valu kay")
        return spark.createDataFrame(
            [(got.query, round(got.score, 6))],
            "suggestion string, score double",
        )

    def wildcard_search_q(spark, sf):
        """Infix/leading wildcard query '*u* line' — k-gram dictionary
        expansion (IIR §3.2.2) + anchored-regex verify, scored as one
        group (plans/wildcard.search_wildcard over kgram_index)."""
        from search_engine_spark.plans.wildcard import (
            kgram_index,
            search_wildcard,
        )

        idx = _docs_index(spark, sf)
        kg = kgram_index(idx.term_stats, k=3)
        res = search_wildcard(
            idx, "*u* line", limit=10, analyzer="tokens", kgrams=kg
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def wildcard_terms_q(spark, sf):
        """Wildcard dictionary expansion '*e*' capped at 3 — the cap
        makes membership encode the (df desc, term asc) expansion
        order (plans/wildcard.expand_wildcard)."""
        from search_engine_spark.plans.wildcard import (
            expand_wildcard,
            kgram_index,
        )

        idx = _docs_index(spark, sf)
        kg = kgram_index(idx.term_stats, k=3)
        terms = expand_wildcard(
            idx, "*e*", max_expansions=3, kgrams=kg
        )
        return idx.term_stats.filter(
            F.col("term").isin(terms)
        ).select("term", F.col("df").cast("long").alias("df"))

    def collocations_q(spark, sf):
        """Top PMI collocations (operators/curation.collocations)."""
        from search_engine_spark.operators.curation import (
            collocations,
        )

        return collocations(
            _docs_enriched(spark, sf), min_count=5, limit=20
        ).select("w1", "w2", "n", "pmi")

    def bigram_logprob_q(spark, sf):
        """Add-α bigram-LM scoring (operators/curation.bigram_logprob)
        — the order-2 KenLM-style quality filter."""
        from search_engine_spark.operators.curation import (
            bigram_logprob,
        )

        return bigram_logprob(
            _docs_enriched(spark, sf), alpha=0.1
        ).select("doc_id", "n_bigrams", "nll", "ppl")

    def kneser_ney_q(spark, sf):
        """Interpolated Kneser-Ney bigram scoring (operators/
        curation.kneser_ney_logprob) — continuation-probability
        smoothing, the proper successor to add-α."""
        from search_engine_spark.operators.curation import (
            kneser_ney_logprob,
        )

        return kneser_ney_logprob(
            _docs_enriched(spark, sf), discount=0.75
        ).select("doc_id", "n_bigrams", "nll", "ppl")

    def ppl_buckets_q(spark, sf):
        """CCNet head/middle/tail perplexity split (operators/
        curation.perplexity_buckets, Wenzek et al. 2020) — per-lang
        ntile over the KN bigram perplexity."""
        from search_engine_spark.operators.curation import (
            perplexity_buckets,
        )

        return perplexity_buckets(
            _docs_enriched(spark, sf), id_col="doc_id"
        ).select("doc_id", "lang", "ppl", "bucket")

    def latest_snapshot_q(spark, sf):
        """Re-crawl dedup: synthetic decorated URL variants per
        (source, doc_id//3) group; latest warc_ts wins after
        canonicalization (operators/curation.latest_snapshot)."""
        from search_engine_spark.operators.curation import (
            latest_snapshot,
        )

        docs = _read(spark, sf, "documents")
        k = F.floor(F.col("doc_id") / 3).cast("long")
        deco = F.element_at(
            F.array(
                F.lit(""), F.lit("/?utm_source=x"), F.lit("/")
            ),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
        pages = docs.select(
            F.col("doc_id"),
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example/p/"), k.cast("string"), deco,
            ).alias("url"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("doc_id")
            ).alias("warc_ts"),
        )
        return latest_snapshot(pages).select("canonical_url", "doc_id")

    def site_quality_q(spark, sf):
        """Domain-level curation aggregate
        (operators/curation.site_quality_stats)."""
        from search_engine_spark.operators.curation import (
            site_quality_stats,
        )

        docs = _docs_enriched(spark, sf).withColumnRenamed(
            "site", "source"
        )
        return site_quality_stats(docs).select(
            "site", "n_docs", "avg_quality"
        )

    def rank_eval_q(spark, sf):
        """TREC-style relevance metrics (plans/eval.rank_eval) over a
        deterministic run (summed query-term tf ranking) and graded
        qrels (rel = matching-terms − 1)."""
        from pyspark.sql import Window

        from search_engine_spark.plans.eval import rank_eval

        idx = _docs_index(spark, sf)
        qt = spark.createDataFrame(
            [
                (qid, t)
                for qid, q in EVAL_QUERIES
                for t in sorted(set(q.split()))
            ],
            "query_id int, term string",
        )
        j = idx.postings.join(F.broadcast(qt), "term")
        qrels = j.groupBy("query_id", "doc_id").agg(
            (F.countDistinct("term") - F.lit(1))
            .cast("int")
            .alias("rel")
        )
        scores = j.groupBy("query_id", "doc_id").agg(
            F.sum("tf").alias("s")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("s"), F.asc("doc_id")
        )
        run = (
            scores.withColumn(
                "rn", F.row_number().over(w).cast("int")
            )
            .filter(F.col("rn") <= 10)
            .select("query_id", "doc_id", "rn")
        )
        return rank_eval(run, qrels, k=10).select(
            "query_id", "rr", "ndcg", "recall"
        )

    def bm25_site_restricted(spark, sf):
        return _search_docs(
            spark, sf, FLAGSHIP_QUERY, sites=SITES_RESTRICTED, limit=10
        )

    def bm25_pagination(spark, sf):
        return _search_docs(spark, sf, FLAGSHIP_QUERY, offset=3, limit=5)

    def postings_lemma(spark, sf):  # T5-T7, the production analyzer
        idx = _docs_index_lemma(spark, sf)
        return idx.postings.select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def bm25_topk_lemma(spark, sf):  # R12 over the lemma analyzer
        return _search_docs_lemma(
            spark, sf, FLAGSHIP_LEMMA_QUERY, limit=10
        )

    def bm25_prf_topk(spark, sf):
        """Rocchio pseudo-relevance-feedback expansion
        (plans/feedback.py): top-10 of the expanded query — feedback
        docs, expansion-term selection, and the beta-down-weighted
        final ranking all mirrored in the DuckDB oracle."""
        from search_engine_spark.plans.feedback import search_prf

        idx = _docs_index(spark, sf)
        res = search_prf(
            idx, FLAGSHIP_QUERY, fb_docs=10, fb_terms=3, beta=0.4,
            limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_champion_topk(spark, sf):
        """Champion-list tiered retrieval (operators/champions.py):
        tier-1-only top-10 (m=5 champions per term, no exact
        fallback — the branch-free latency-bound variant)."""
        from search_engine_spark.operators.champions import (
            search_champions,
        )

        idx = _docs_index(spark, sf)
        res = search_champions(
            idx, FLAGSHIP_QUERY, m=5, limit=10, analyzer="tokens",
            exact_fallback=False,
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def bm25_wand_topk(spark, sf):  # N5: same oracle as bm25_topk
        return _search_docs_wand(spark, sf, FLAGSHIP_QUERY, limit=10)

    def bm25_topk_local(spark, sf):
        """Driver-local (no-Spark) serving fast path
        (plans/local_serve.py) under the SAME oracle as bm25_topk:
        the documents corpus is persisted once via build_and_write,
        then the flagship query is answered entirely by pyarrow +
        the numpy block codec on the driver — the result rows are
        wrapped back into a DataFrame only for the contract compare.
        Ranks re-ordered by the oracle's (score desc, doc_id asc)
        tie-break after mapping the synthetic url back to doc_id
        (the on-disk index keys by url; same top-k set)."""
        import tempfile

        from search_engine_spark.plans.build import build_and_write
        from search_engine_spark.plans.local_serve import (
            open_local_index,
        )
        from search_engine_spark.sources.pages import (
            documents_as_pages,
        )

        key = (id(spark), sf, "local_serve")
        if key not in _INCR_CACHE:
            out = tempfile.mkdtemp(prefix="local_contract_") + "/idx"
            build_and_write(
                spark,
                documents_as_pages(spark, sf).drop("doc_id"),
                out, analyzer="tokens", n_segments=8,
            )
            _INCR_CACHE[key] = out
        lidx = open_local_index(_INCR_CACHE[key])
        pdf = lidx.search(FLAGSHIP_QUERY, limit=10)
        rows = sorted(
            (
                (int(u.rsplit("/", 1)[1]), float(s))
                for u, s in zip(pdf["url"], pdf["score"])
            ),
            key=lambda t: (-t[1], t[0]),  # full-precision sort,
        )                                 # round only for display
        return spark.createDataFrame(
            [
                (doc_id, round(score, 6), rn)
                for rn, (doc_id, score) in enumerate(rows, 1)
            ],
            "doc_id long, score double, rn int",
        )

    def bm25_wand_pagination(spark, sf):
        return _search_docs_wand(
            spark, sf, FLAGSHIP_QUERY, offset=3, limit=5
        )

    def bm25_maxscore_topk(spark, sf):
        # MaxScore-pruned union (OR) semantics over the compact
        # index — oracle is the union-candidates BM25 SQL
        from search_engine_spark.plans.maxscore import (
            search_maxscore_compact,
        )

        cidx = _docs_compact(spark, sf)
        res = search_maxscore_compact(
            cidx, FLAGSHIP_QUERY, limit=10, analyzer="tokens"
        )
        return res.select(
            F.col("nat_id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def _percolate(spark, sf, mode):
        from search_engine_spark.plans.percolate import percolate

        idx = _docs_index(spark, sf)
        hits = percolate(
            idx, PERCOLATE_QUERIES, mode=mode, analyzer="tokens"
        )
        return hits.select(
            "query_id",
            "doc_id",
            "site",
            F.round("score", 6).alias("score"),
            F.col("matched_terms").cast("int").alias("matched_terms"),
        )

    def percolate_rarest(spark, sf):  # reverse search, R13 membership
        return _percolate(spark, sf, "rarest")

    def canonical_urls(spark, sf):
        from search_engine_spark.operators.curation import (
            canonical_url_col,
        )

        d = F.col("doc_id").cast("string")
        src = F.col("source")
        m = F.col("doc_id") % 4
        messy = (
            F.when(m == 0, F.concat(
                F.lit("HTTPS://WWW."), src,
                F.lit(".Example:443//p//"), d,
                F.lit("/?utm_source=x&b=2&a=1")))
            .when(m == 1, F.concat(
                F.lit("http://"), src, F.lit(".example.:80/p/"), d,
                F.lit("?fbclid=zz&z=9&y=#sec")))
            .when(m == 2, F.concat(
                F.lit("HTTP://"), F.upper(src), F.lit(".EXAMPLE/P//"),
                d))
            .otherwise(F.concat(
                F.lit("https://"), src, F.lit(".example/p/"), d,
                F.lit("/?b=2&a=1&ref=tw")))
        )
        return _read(spark, sf, "documents").select(
            "doc_id", canonical_url_col(messy).alias("canonical_url")
        )

    def percolate_all(spark, sf):  # conjunctive percolator
        return _percolate(spark, sf, "all")

    def site_statistics_q(spark, sf):  # R22
        from search_engine_spark.plans.statistics import site_statistics

        idx = _docs_index(spark, sf)
        posts_site = idx.postings.join(
            idx.doc_lens.select("doc_id", "site"), "doc_id"
        )
        return site_statistics(
            posts_site.select("term", "site"),
            idx.doc_lens.select("doc_id", "site"),
        )

    def embedding_near_dup(spark, sf):
        from search_engine_spark.operators.similarity import (
            cosine_near_dup_pairs,
        )

        return cosine_near_dup_pairs(
            _read(spark, sf, "embeddings"), threshold=0.4
        )

    def embedding_near_dup_lsh(spark, sf):  # rows-only (approximate)
        from search_engine_spark.operators.similarity import (
            cosine_near_dup_pairs_lsh,
        )

        return cosine_near_dup_pairs_lsh(
            _read(spark, sf, "embeddings"), threshold=0.4
        )

    def embedding_near_dup_lsh_md5(spark, sf):
        """The same banded SRP near-dup pipeline with md5-grid planes
        — DuckDB regenerates the planes, the per-table sign buckets,
        the bucket-collision candidate join and the thresholded exact
        scoring, hash-checking the approximate pair set itself (the
        gaussian production path above stays rows-only)."""
        from search_engine_spark.operators.similarity import (
            cosine_near_dup_pairs_lsh,
        )

        return cosine_near_dup_pairs_lsh(
            _read(spark, sf, "embeddings"), threshold=0.4,
            plane_method="md5",
        )

    def dedup_exact(spark, sf):
        return exact_dedup_groups(
            _read(spark, sf, "documents"), "text", "doc_id"
        )

    def dedup_exact_normalized(spark, sf):
        # near-dups in the testdata differ only by an injected 'dup'
        # token; normalizing it away makes them exact dups.
        docs = _read(spark, sf, "documents").withColumn(
            "ntext",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\bdup\b", " "),
                    r"\s+", " ",
                )
            ),
        )
        return exact_dedup_groups(docs, "ntext", "doc_id").filter(
            F.col("n_dups") > 1
        )

    def ngram_jaccard(spark, sf):
        return ngram_jaccard_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            n=3, threshold=0.5,
        )

    def winnow_fps(spark, sf):
        """Winnowing (MOSS) fingerprint selection
        (operators/winnow.py): position-anchored k-gram minima with
        the rightmost-tie rule, k=5 w=4 — the passage-reuse detector;
        selection replayed exactly by the DuckDB oracle."""
        from search_engine_spark.operators.winnow import (
            winnow_fingerprints,
        )

        docs = _docs_enriched(spark, sf).select("doc_id", "text")
        fp = winnow_fingerprints(docs, k=5, w=4, hash_method="md5")
        return fp.select(
            "doc_id", F.col("pos").cast("long").alias("pos"), "h"
        )

    def winnow_pairs(spark, sf):
        """Local text-reuse pairs: docs sharing ≥ 2 winnowing
        fingerprints (guaranteed to catch any shared run of
        ≥ w + k − 1 = 8 tokens)."""
        from search_engine_spark.operators.winnow import (
            winnow_reuse_pairs,
        )

        docs = _docs_enriched(spark, sf).select("doc_id", "text")
        return winnow_reuse_pairs(
            docs, k=5, w=4, min_shared=2, hash_method="md5"
        )

    def ngram_containment(spark, sf):
        """Broder containment |S(A)∩S(B)|/|S(A)| ≥ 0.5 — the
        asymmetric quote-inclusion twin of the Jaccard pairs."""
        from search_engine_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        return ngram_containment_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            n=3, threshold=0.5,
        )

    def minhash_pairs(spark, sf):  # rows-only check (hash not in SQL)
        return minhash_lsh_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            n=3, k=32, bands=8, threshold=0.5,
        )

    def minhash_pairs_md5(spark, sf):
        """MinHash+LSH with the SQL-reproducible md5-substring hash:
        the DuckDB oracle hash-checks the WHOLE pipeline — seed-varied
        signature minima, band hashing, candidate join, estimated-
        Jaccard verify — not just row counts (the xxhash64 twin above
        stays the fast production default)."""
        return minhash_lsh_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            n=3, k=16, bands=4, threshold=0.5, hash_method="md5",
        )

    def simhash(spark, sf):  # rows-only check
        return simhash_table(_docs_enriched(spark, sf), "doc_id", "tokens")

    def simhash_md5(spark, sf):
        """60-bit md5-variant SimHash signatures as pure JVM column
        work — the DuckDB oracle replays the per-bit ±1 sums and
        bit assembly exactly (the blake2b Arrow-UDF twin above stays
        the fast default, rows-only)."""
        return simhash_table(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            hash_method="md5",
        )

    def simhash_pairs_md5(spark, sf):
        """Banded exact-Hamming near-dup pairs over the md5-variant
        signatures — the whole pipeline hash-checked in SQL."""
        from search_engine_spark.operators.dedup import (
            simhash_near_dup_pairs,
        )

        return simhash_near_dup_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            bands=4, max_hamming=3, hash_method="md5",
        )

    def simhash_pairs(spark, sf):  # rows-only (hash not in SQL);
        # banded join is EXACT for max_hamming < bands (pytest-proven
        # against brute force in tests/test_dedup.py)
        from search_engine_spark.operators.dedup import (
            simhash_near_dup_pairs,
        )

        return simhash_near_dup_pairs(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            bands=4, max_hamming=3,
        )

    def ann_cosine_topk(spark, sf):
        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") < 3)
        return cosine_topk_bruteforce(emb, qs, k=5).select(
            "query_id", "neighbor_id", "sim",
            F.col("rank").cast("int").alias("rank"),
        )

    def ann_cosine_lsh(spark, sf):  # rows-only check (approximate)
        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") < 3)
        return cosine_topk_lsh(emb, qs, k=5)

    def ann_cosine_lsh_md5(spark, sf):
        """SRP-LSH ANN with the SQL-reproducible md5-grid hyperplanes
        (operators/similarity._hyperplanes_md5): DuckDB regenerates
        the planes, the sign buckets, the banded candidate join and
        the exact rescoring — the approximate index itself is
        hash-checked, not just its brute-force twin.  The gaussian
        path above stays the production default (rows-only)."""
        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") < 3)
        return cosine_topk_lsh(emb, qs, k=5, plane_method="md5")

    def ann_cosine_ivfpq(spark, sf):  # rows-only (PQ-compressed ANN)
        from search_engine_spark.operators.similarity import (
            cosine_topk_ivfpq,
        )

        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") < 3)
        return cosine_topk_ivfpq(
            emb, qs, k=5, n_lists=16, n_probe=8, m=8, n_codes=64,
            refine=4,
        )

    def ann_cosine_ivfpq_md5(spark, sf):
        """IVF-PQ with SQL-reproducible md5-grid quantizers
        (operators/similarity.ivf_centroids_md5 / pq_codebooks_md5):
        DuckDB regenerates the coarse centroids and codebooks and
        replays the FULL compressed-ANN pipeline — argmax-dot list
        assignment, per-subspace argmin PQ encoding, n_probe list
        scan, ADC candidate ranking, and the exact-cosine rerank of
        the ADC top k·refine.  The k-means-trained production path
        above stays rows-only; this twin hash-checks the pipeline
        itself, not just its brute-force shadow."""
        from search_engine_spark.operators.similarity import (
            cosine_topk_ivfpq,
            ivf_centroids_md5,
            pq_codebooks_md5,
        )

        emb = _read(spark, sf, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        qs = emb.filter(F.col("vec_id") < 3)
        return cosine_topk_ivfpq(
            emb, qs, k=5, n_lists=16, n_probe=8, m=8, n_codes=64,
            refine=4,
            centroids=ivf_centroids_md5(16, dim),
            books=pq_codebooks_md5(8, 64, dim // 8),
        )

    def hybrid_rrf(spark, sf):
        """Hybrid lexical+vector: BM25 top-50 over documents fused
        with cosine top-50 over embeddings (id-aligned doc_id=vec_id)
        via reciprocal-rank fusion, k0=60."""
        from search_engine_spark.plans.hybrid import hybrid_topk
        from search_engine_spark.plans.search import search

        idx = _docs_index(spark, sf)
        lex = search(idx, FLAGSHIP_QUERY, limit=50, analyzer="tokens")
        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") == 0)
        vec = cosine_topk_bruteforce(emb, qs, k=50)
        return hybrid_topk(lex, vec, k=10).select(
            "doc_id", "rrf_score", "rank"
        )

    def mmr_diversify(spark, sf):
        """MMR-diversified rerank (plans/diversify.py) of the cosine
        top-50 pool for query vec 0 — λ=0.7, k=10.  ``normalize_rel``
        is off so the DuckDB oracle (unrolled greedy, one argmax CTE
        per rank) replays the selection exactly."""
        from search_engine_spark.plans.diversify import mmr_rerank

        emb = _read(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id") == 0)
        cands = cosine_topk_bruteforce(emb, qs, k=50).select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("sim").alias("score"),
        )
        return mmr_rerank(
            cands, emb, k=10, lambda_=0.7, pool_size=50,
            emb_id_col="vec_id", normalize_rel=False,
        )

    def kmeans_clusters(spark, sf):
        """Distributed spherical Lloyd (operators/embcluster.py),
        k=4 × 2 iterations, deterministic init (unit vectors of the
        4 smallest ids) — the DuckDB oracle unrolls the whole
        recursion (assign → per-cluster mean → renormalize) one CTE
        layer per iteration and hash-matches the final assignment."""
        from search_engine_spark.operators.embcluster import (
            assign_centroids, kmeans_lloyd,
        )

        emb = _read(spark, sf, "embeddings")
        cents = kmeans_lloyd(emb, k=4, n_iter=2)
        return assign_centroids(emb, cents).select(
            "vec_id", "cluster"
        )

    def semantic_dedup_q(spark, sf):
        """SemDeDup (Abbas 2023): Lloyd k=4×2 clustering + drop any
        doc with a smaller-id round-6-cosine ≥ 0.4 neighbor in its
        cluster (greedy canonical-min)."""
        from search_engine_spark.operators.embcluster import (
            semantic_dedup,
        )

        emb = _read(spark, sf, "embeddings")
        # k scales with corpus size (the SemDeDup regime: more
        # clusters → bounded within-cluster pair joins); 500 vecs →
        # k=4, matching the fixed-k DuckDB oracle at the sf0.01
        # correctness scale
        k = max(4, emb.count() // 125)
        return semantic_dedup(emb, eps=0.4, k=k, n_iter=2)

    def cluster_top_terms_q(spark, sf):
        """c-TF-IDF cluster labels (BERTopic): top-5 terms per Lloyd
        cluster, weight tf(t,c)·ln(1 + A/f(t)), round-6, term-asc
        tiebreak."""
        from search_engine_spark.operators.embcluster import (
            assign_centroids, cluster_top_terms, kmeans_lloyd,
        )

        emb = _read(spark, sf, "embeddings")
        # same size-scaled k as semantic_dedup (4 at oracle scale)
        k = max(4, emb.count() // 125)
        cents = kmeans_lloyd(emb, k=k, n_iter=2)
        assignment = assign_centroids(emb, cents).select(
            F.col("vec_id").alias("doc_id"), "cluster"
        )
        return cluster_top_terms(
            _docs_enriched(spark, sf), assignment, top_n=5
        )

    def text_quality(spark, sf):
        docs = _docs_enriched(spark, sf)
        return docs.select(
            "doc_id",
            ws_token_count(F.col("text")).alias("n_ws_tokens"),
            bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
            F.round(alpha_ratio(F.col("text")), 6).alias("alpha_ratio"),
            F.round(stopword_ratio(F.col("tokens")), 6).alias("stop_ratio"),
            quality_score(F.col("text"), F.col("tokens")).alias("quality"),
        )

    def lang_id_q(spark, sf):
        return _read(spark, sf, "documents").select(
            "doc_id", lang_id(F.col("text")).alias("lang_guess")
        )

    def fingerprint_q(spark, sf):
        return _read(spark, sf, "documents").select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        )

    def dedup_clusters(spark, sf):
        # Distributed connected components (large-star/small-star)
        # over CHAINED exact-dup pairs: consecutive same-fingerprint
        # docs form a path, so CC must take a real transitive closure
        # — whose fixpoint the SQL window oracle predicts exactly.
        from pyspark.sql.window import Window

        from search_engine_spark.operators.clusters import (
            assign_clusters,
        )

        docs = _read(spark, sf, "documents")
        fp = docs.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        )
        w = Window.partitionBy("fp").orderBy("doc_id")
        chain = (
            fp.withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(
                F.col("doc_id").alias("id_a"),
                F.col("prev").alias("id_b"),
            )
        )
        return assign_clusters(docs.select("doc_id"), chain).select(
            "doc_id", "cluster_id"
        )

    def dedup_keep_longest(spark, sf):
        # One survivor per normalized-near-dup cluster, longest text
        # (n_chars) winning, doc_id ascending as the tiebreak — the
        # standard web-pipeline "keep the richest variant" policy.
        from pyspark.sql.window import Window

        from search_engine_spark.operators.clusters import (
            dedup_keep_representative,
        )

        docs = _read(spark, sf, "documents").withColumn(
            "ntext",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\bdup\b", " "),
                    r"\s+", " ",
                )
            ),
        )
        nfp = docs.select(
            "doc_id", fingerprint(F.col("ntext")).alias("nfp")
        )
        w = Window.partitionBy("nfp").orderBy("doc_id")
        chain = (
            nfp.withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(
                F.col("doc_id").alias("id_a"),
                F.col("prev").alias("id_b"),
            )
        )
        kept = dedup_keep_representative(
            docs, chain, priority_col="n_chars"
        )
        return kept.select("doc_id", "source")

    def event_sessions(spark, sf):
        # gap-based sessionization via Spark's native session_window
        # (one shuffle, no sort-the-whole-log window pass); oracle is
        # the classic gaps-and-islands SQL — semantics must agree
        from search_engine_spark.operators.sessions import sessionize

        ev = _read(spark, sf, "events").withColumn(
            "value", F.col("value").cast("decimal(18,6)")
        )
        out = sessionize(ev, "user_id", "ts", "30 minutes", "value")
        return out.withColumn(
            "sum_value", F.col("sum_value").cast("double")
        )

    def user_activity_sketch(spark, sf):
        # HLL++ sketch next to its exact twin; the within_bound column
        # makes the sketch's error contract itself hash-checkable
        from search_engine_spark.operators.sessions import (
            user_activity_sketch as uas,
        )

        out = uas(_read(spark, sf, "events"), rsd=0.02)
        return out.select(
            "user_id", "n_events", "n_types_exact",
            (
                (
                    F.abs(
                        F.col("n_types_approx") - F.col("n_types_exact")
                    )
                    / F.col("n_types_exact")
                )
                <= F.lit(0.10)
            ).alias("within_bound"),
        )

    def asof_join_events(spark, sf):
        # point-in-time lookup: each click joined to the user's most
        # recent error at-or-before it — union+LOCF as-of join vs
        # DuckDB's NATIVE ASOF LEFT JOIN as the oracle
        from search_engine_spark.operators.asof import asof_join

        ev = _read(spark, sf, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", "ts", "value"
        )
        return asof_join(
            clicks, errors, on="ts", by="user_id",
            right_cols=["ts", "value"],
        ).select(
            "event_id", "user_id", "ts",
            F.col("ts_right").alias("err_ts"),
            F.col("value").alias("err_value"),
        )

    def range_join_events(spark, sf):
        # interval join via bucketed expansion (x3 probe + verify) —
        # the equi-join shape instead of a theta/cartesian join
        from search_engine_spark.operators.range import range_join

        ev = _read(spark, sf, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", "ts", "value"
        )
        return range_join(
            clicks, errors, on="ts", by="user_id", window="5 minutes"
        ).select(
            "event_id", "user_id", "ts",
            F.col("ts_right").alias("err_ts"),
            F.col("value").alias("err_value"),
        )

    def training_pipeline(spark, sf):
        # the COMPOSED curation plan (annotate → lang/quality/length
        # gates → exact dedup keep-min-id), oracle-checked end-to-end
        # with thresholds that actually drop rows at this SF, over
        # normalized text so the exact-dedup stage also fires
        from search_engine_spark.plans.pipeline import (
            PipelineConfig,
            prepare_training_data,
        )

        docs = _read(spark, sf, "documents").withColumn(
            "text",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\bdup\b", " "),
                    r"\s+", " ",
                )
            ),
        )
        return prepare_training_data(
            docs, cfg=PipelineConfig(min_quality=0.6, min_tokens=25)
        )

    def training_pipeline_curated(spark, sf):
        # the FULL composition: + Gopher repetition gate between the
        # row-local filters and the dedup shuffle, + deterministic
        # train/val/test split as the final stage — still
        # oracle-checked end-to-end
        from search_engine_spark.plans.pipeline import (
            PipelineConfig,
            prepare_training_data,
        )

        docs = _read(spark, sf, "documents").withColumn(
            "text",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\bdup\b", " "),
                    r"\s+", " ",
                )
            ),
        )
        return prepare_training_data(
            docs,
            cfg=PipelineConfig(
                min_quality=0.6, min_tokens=25, gopher=True,
                split=(0.8, 0.1, "v1"),
            ),
        )

    # ---- relational operator checks over the TPC-H-ish tables ----

    def agg_sum_by_key(spark, sf):  # R9: sum-by-key (TPC-H Q1 shape)
        li = _read(spark, sf, "lineitem")
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double").alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double").alias("sum_price"),
                F.count(F.lit(1)).alias("cnt"),
            )
        )

    def join_revenue_topk(spark, sf):  # R3 + R18
        orders = _read(spark, sf, "orders")
        cust = _read(spark, sf, "customer")
        return (
            orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .groupBy("c_name")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .orderBy(F.desc("revenue"), F.asc("c_name"))
            .limit(10)
        )

    def anti_join_no_orders(spark, sf):  # R19
        cust = _read(spark, sf, "customer")
        orders = _read(spark, sf, "orders")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_anti")
            .select("c_custkey", "c_name")
        )

    def semi_join_segments(spark, sf):  # R20
        cust = _read(spark, sf, "customer")
        orders = _read(spark, sf, "orders")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"))
        )

    def topk_orders(spark, sf):  # R15 + R18
        return (
            _read(spark, sf, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey", "o_totalprice")
        )

    def window_pagination(spark, sf):  # R17
        orders = _read(spark, sf, "orders")
        w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        return (
            orders.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter((F.col("rn") > 10) & (F.col("rn") <= 20))
            .select("o_orderkey", "o_totalprice", "rn")
        )

    def grouped_statistics(spark, sf):  # R22
        cust = _read(spark, sf, "customer")
        supp = _read(spark, sf, "supplier")
        nation = _read(spark, sf, "nation")
        c = cust.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n_customers"))
        s = supp.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n_suppliers"))
        return (
            nation.join(c, nation.n_nationkey == c.c_nationkey, "left")
            .join(s, nation.n_nationkey == s.s_nationkey, "left")
            .select(
                "n_name",
                F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            )
        )

    def union_distinct(spark, sf):  # R21
        cust = _read(spark, sf, "customer").select(
            F.col("c_nationkey").alias("nationkey"))
        supp = _read(spark, sf, "supplier").select(
            F.col("s_nationkey").alias("nationkey"))
        return cust.union(supp).distinct()

    def distinct_values(spark, sf):  # R6
        return _read(spark, sf, "events").select("event_type").distinct()

    def avg_scalar(spark, sf):  # R7
        docs = _read(spark, sf, "documents")
        return docs.agg(
            (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
            .alias("avg_chars")
        )

    def event_hourly_window(spark, sf):  # windowed agg over events
        ev = _read(spark, sf, "events")
        return (
            ev.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double").alias("sum_value"),
            )
        )

    def phrase_match_q(spark, sf):  # positional postings + exact phrase
        from search_engine_spark.operators.phrases import phrase_match

        return phrase_match(
            _docs_enriched(spark, sf), PHRASE_TERMS, id_col="doc_id"
        ).select("doc_id", F.col("phrase_tf").cast("long"))

    def phrase_search_q(spark, sf):  # phrase-BM25 top-k
        from search_engine_spark.operators.phrases import phrase_search

        return phrase_search(
            _docs_enriched(spark, sf), PHRASE_TERMS, id_col="doc_id",
            k1=K1, b=B, limit=10,
        ).select(
            "doc_id", F.col("phrase_tf").cast("long"), "score"
        )

    def doclen_quantiles(spark, sf):  # exact interpolated percentiles
        qs = [0.25, 0.5, 0.75, 0.9, 0.99]
        lens = _docs_enriched(spark, sf).select(
            F.col("doc_len").cast("long").alias("doc_len")
        )
        vals = lens.agg(
            F.percentile("doc_len", F.array(*[F.lit(q) for q in qs]))
            .alias("v")
        )
        return vals.select(
            F.posexplode("v").alias("idx", "doc_len_q")
        ).select(
            F.element_at(
                F.array(*[F.lit(q) for q in qs]), F.col("idx") + 1
            ).alias("q"),
            F.round("doc_len_q", 6).alias("doc_len_q"),
        )

    def ngram_repetition_q(spark, sf):  # Gopher repetition signals
        from search_engine_spark.operators.curation import (
            ngram_repetition,
        )

        return ngram_repetition(_docs_enriched(spark, sf), n=2)

    def gopher_gate_q(spark, sf):  # composite quality gate
        from search_engine_spark.operators.curation import gopher_gate

        return gopher_gate(_docs_enriched(spark, sf))

    def unigram_logprob_q(spark, sf):  # unigram-LM perplexity proxy
        from search_engine_spark.operators.curation import (
            unigram_logprob,
        )

        return unigram_logprob(_docs_enriched(spark, sf))

    def assign_split_q(spark, sf):  # deterministic train/val/test
        from search_engine_spark.operators.curation import assign_split

        return assign_split(
            _read(spark, sf, "documents"), train=0.8, val=0.1
        ).select("doc_id", "split")

    def site_lang_rollup(spark, sf):  # one-pass multi-level totals
        from search_engine_spark.plans.statistics import corpus_rollup

        return corpus_rollup(_read(spark, sf, "documents"))

    def novel_documents_q(spark, sf):  # cross-corpus exact novelty
        from search_engine_spark.operators.dedup import novel_documents

        docs = _read(spark, sf, "documents").withColumn(
            "text",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\bdup\b", " "),
                    r"\s+", " ",
                )
            ),
        )
        base = docs.filter(F.col("doc_id") < 250)
        new = docs.filter(F.col("doc_id") >= 250)
        return novel_documents(new, base).select("doc_id")

    def bm25_batch(spark, sf):  # whole query set in ONE job
        from search_engine_spark.plans.search import search_many

        idx = _docs_index(spark, sf)
        res = search_many(
            idx,
            [FLAGSHIP_QUERY, "window spark", "sort query big", "hash table"],
            limit=10,
            analyzer="tokens",
        )
        return res.select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def ltr_features_q(spark, sf):  # LTR feature vectors, batched
        from search_engine_spark.plans.ltr import ltr_features

        idx = _docs_index(spark, sf)
        res = ltr_features(
            idx,
            [FLAGSHIP_QUERY, "window spark", "sort query big",
             "hash table"],
            limit=10,
            analyzer="tokens",
        )
        return res.select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.round("bm25", 6).alias("bm25"),
            "matched_terms",
            "n_query_terms",
            "coverage",
            "sum_tf",
            "max_tf",
            F.round("idf_sum", 6).alias("idf_sum"),
            F.round("idf_max", 6).alias("idf_max"),
            "doc_len",
        )

    def facet_counts_q(spark, sf):
        from search_engine_spark.plans.search import facet_counts

        idx = _docs_index(spark, sf)
        return facet_counts(
            idx, FLAGSHIP_QUERY, facet_col="site", analyzer="tokens"
        ).select(F.col("site"), "hits")

    def bm25_batch_compact(spark, sf):  # batch over the PERSISTED index
        from search_engine_spark.plans.wand import search_many_compact

        cidx = _docs_compact(spark, sf)
        res = search_many_compact(
            cidx,
            [FLAGSHIP_QUERY, "window spark", "sort query big", "hash table"],
            limit=10,
            analyzer="tokens",
        )
        return res.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col(cidx.id_col).alias("doc_id"),
            F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def cms_term_counts(spark, sf):  # rows-only (hash-bucketed sketch)
        from search_engine_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        toks = _docs_enriched(spark, sf).select(
            F.explode("tokens").alias("term")
        )
        sk = cms_build(toks, "term")
        return cms_estimate(sk, FLAGSHIP_TERMS + ["zzz_absent"])

    def cms_counts_md5(spark, sf):
        """Count-Min sketch with the SQL-reproducible md5 bucket
        hash: build cells AND min-probe estimates hash-checked by the
        DuckDB oracle (the xxhash64 twin above stays the fast
        default, rows-only)."""
        from search_engine_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        toks = _docs_enriched(spark, sf).select(
            F.explode("tokens").alias("term")
        )
        sk = cms_build(toks, "term", hash_method="md5")
        return cms_estimate(
            sk, FLAGSHIP_TERMS + ["zzz_absent"], hash_method="md5"
        )

    def bm25f_topk_q(spark, sf):  # field-weighted (title+body) BM25F
        from search_engine_spark.functions.textproc import tokens_col
        from search_engine_spark.plans.search import bm25f_topk

        docs = _read(spark, sf, "documents").select(
            "doc_id", "text", "lang",
            F.substring("text", 1, 50).alias("title"),
        )
        enriched = docs.select(
            "doc_id",
            tokens_col(F.col("text"), F.col("lang")).alias("tokens"),
            tokens_col(F.col("title"), F.col("lang")).alias(
                "title_tokens"
            ),
        )
        return bm25f_topk(
            enriched, FLAGSHIP_TERMS, title_weight=2.0,
            k1=K1, b=B, limit=10,
        )

    def dismax_topk_q(spark, sf):
        """Disjunction-max best-fields ranking (plans/search.
        dismax_topk — ES multi_match best_fields parity): per-field
        BM25 with each field's own stats, combined max +
        tie_breaker·rest."""
        from search_engine_spark.functions.textproc import tokens_col
        from search_engine_spark.plans.search import dismax_topk

        docs = _read(spark, sf, "documents").select(
            "doc_id", "text", "lang",
            F.substring("text", 1, 50).alias("title"),
        )
        enriched = docs.select(
            "doc_id",
            tokens_col(F.col("text"), F.col("lang")).alias("tokens"),
            tokens_col(F.col("title"), F.col("lang")).alias(
                "title_tokens"
            ),
        )
        return dismax_topk(
            enriched, FLAGSHIP_TERMS, tie_breaker=0.3,
            k1=K1, b=B, limit=10,
        )

    def topk_per_site(spark, sf):  # grouped top-k via window
        from pyspark.sql import Window

        docs = _read(spark, sf, "documents")
        w = Window.partitionBy("source").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
        return (
            docs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("source", "doc_id",
                    F.col("n_chars").cast("long").alias("n_chars"),
                    F.col("rnk").cast("int").alias("rnk"))
        )

    def intersect_customers(spark, sf):  # INTERSECT (distinct)
        cust = _read(spark, sf, "customer").select(
            F.col("c_custkey").alias("custkey")
        )
        orders = _read(spark, sf, "orders").select(
            F.col("o_custkey").alias("custkey")
        )
        return cust.intersect(orders)

    def except_customers(spark, sf):  # EXCEPT (distinct)
        # customers minus those with a completed ('F') order — a
        # non-empty difference at every SF
        cust = _read(spark, sf, "customer").select(
            F.col("c_custkey").alias("custkey")
        )
        done = (
            _read(spark, sf, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select(F.col("o_custkey").alias("custkey"))
        )
        return cust.exceptAll(done.distinct()).distinct()

    def site_doclen_quantiles(spark, sf):  # per-group percentiles
        lens = _docs_enriched(spark, sf).select(
            "site", F.col("doc_len").cast("long").alias("doc_len")
        )
        return lens.groupBy("site").agg(
            F.round(F.percentile("doc_len", F.lit(0.5)), 6)
            .alias("p50"),
            F.round(F.percentile("doc_len", F.lit(0.9)), 6)
            .alias("p90"),
        )

    def extract_links(spark, sf):
        # S2 link extraction over deterministically synthesized HTML:
        # per doc — a root-relative link and an absolute same-site
        # link (kept), plus an off-site link, a forbidden-extension
        # link, a self link and a duplicate (all dropped)
        from search_engine_spark.functions.textproc import (
            extract_links_col,
        )

        d = F.col("doc_id").cast("string")
        root = F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example"))
        url = F.concat(root, F.lit("/p"), d)
        html = F.concat(
            F.lit('<html><body><a href="/sec/'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">r</a><a href="'),
            root, F.lit("/page"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('">a</a><a href="https://other.example/q">o</a>'
                  '<a href="/img/'),
            d,
            F.lit('.png">i</a><a href="/sec/'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">dup</a><a href="'),
            url,
            F.lit('">self</a></body></html>'),
        )
        pages = _read(spark, sf, "documents").select(
            "doc_id",
            url.alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return pages.select(
            "doc_id",
            F.explode(
                extract_links_col(F.col("html"), F.col("url"))
            ).alias("link"),
        )

    def _t1t2_html(spark, sf):
        # T1/T2 fixture: html synthesized deterministically from the
        # documents table (same construction as the DuckDB oracle) —
        # a head with an entity-bearing <title> and a <script>, a
        # comment, a tagged body paragraph built from the sanitized
        # text, and an entity-bearing tail div.  The SPARK side runs
        # the production extractors over it (functions/textproc
        # extract_text_py/extract_title_py — the normative spec of
        # the reference's Jsoup.parse().text()/title(), LemmaService
        # Impl.java:36, SearchServiceImpl.java:305-307); the oracle
        # states the EXPECTED extraction in SQL.
        d = F.col("doc_id").cast("string")
        body = F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")),
            "[^A-Za-z0-9 .,]", " ",
        )
        html = F.concat(
            F.lit("<html><head><title>Doc "), d,
            F.lit(" &amp; "), F.col("source"),
            F.lit("</title><script>var x = 1 < 2 && true;</script>"
                  "</head><body><!-- hidden "), d,
            F.lit(' --><p class="lead">intro '), body,
            F.lit("</p><div>tail &lt;"), d,
            F.lit("&gt;</div></body></html>"),
        )
        return _read(spark, sf, "documents").select(
            "doc_id", F.encode(html, "UTF-8").alias("html")
        )

    def extract_text_roundtrip(spark, sf):
        from search_engine_spark.functions.textproc import (
            extract_text_udf,
        )

        return _t1t2_html(spark, sf).select(
            "doc_id", extract_text_udf(F.col("html")).alias("text")
        )

    def extract_title(spark, sf):
        from search_engine_spark.functions.textproc import (
            extract_title_udf,
        )

        return _t1t2_html(spark, sf).select(
            "doc_id", extract_title_udf(F.col("html")).alias("title")
        )

    def _anchor_pages(spark, sf):
        # deterministically synthesized single-site HTML with anchor
        # text (same construction in the DuckDB _ANCHOR_HTML_SQL):
        # two same-site links with text (kept; one has a nested tag),
        # an off-site link, a forbidden-extension link and a self
        # link (all dropped)
        d = F.col("doc_id").cast("string")
        root = F.lit("https://corpus.example")
        url = F.concat(root, F.lit("/p"), d)
        html = F.concat(
            F.lit('<html><body><a href="/p'),
            ((F.col("doc_id") * 3 + 1) % 100).cast("string"),
            F.lit('">fast dup</a><a href="/p'),
            ((F.col("doc_id") * 7 + 2) % 100).cast("string"),
            F.lit('">key <b>dup</b></a>'
                  '<a href="https://other.example/x">fast</a>'
                  '<a href="/img/'),
            d,
            F.lit('.png">key</a><a href="/p'),
            d,
            F.lit('">dup</a></body></html>'),
        )
        return _read(spark, sf, "documents").select(
            url.alias("url"), F.encode(html, "UTF-8").alias("html")
        )

    def anchor_postings_q(spark, sf):
        from search_engine_spark.operators.anchors import (
            anchor_postings,
        )

        return anchor_postings(_anchor_pages(spark, sf)).select(
            "target", "term", "tf"
        )

    def bm25f_anchor_topk(spark, sf):
        from search_engine_spark.operators.anchors import (
            anchor_postings,
            search_anchored,
        )

        idx = _docs_index(spark, sf)
        anchors = anchor_postings(_anchor_pages(spark, sf)).select(
            F.regexp_extract("target", r"p(\d+)$", 1)
            .cast("long").alias("target"),
            "term", "tf",
        )
        res = search_anchored(
            idx, anchors, FLAGSHIP_QUERY, anchor_weight=2.0,
            limit=10, analyzer="tokens",
        )
        return res.select(
            "doc_id", F.round("score", 6).alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )

    def pii_scan(spark, sf):
        # documents.text carries no digits, so deterministic PII-shaped
        # suffixes derived from doc_id are injected (identically in the
        # DuckDB oracle) to exercise detection + redaction for real.
        from search_engine_spark.functions.pii import annotate_pii

        did = F.col("doc_id")
        seg_email = F.when(
            did % 2 == 0,
            F.concat(F.lit(" mail user"), did.cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit(""))
        seg_ip = F.when(
            did % 3 == 0,
            F.concat(F.lit(" ip 10."), (did % 256).cast("string"),
                     F.lit("."), ((did * 3) % 256).cast("string"),
                     F.lit("."), (did % 100).cast("string")),
        ).otherwise(F.lit(""))
        seg_ssn = F.when(
            did % 5 == 0,
            F.concat(F.lit(" ssn "), (100 + did % 900).cast("string"),
                     F.lit("-"), (10 + did % 90).cast("string"),
                     F.lit("-"), (1000 + did % 9000).cast("string")),
        ).otherwise(F.lit(""))
        seg_phone = F.when(
            did % 7 == 0,
            F.concat(F.lit(" call +1 555 "),
                     (1000 + (did * 13) % 9000).cast("string")),
        ).otherwise(F.lit(""))
        seg_cc = F.when(
            did % 11 == 0,
            F.concat(F.lit(" card 4111 1111 1111 "),
                     (1000 + (did * 17) % 9000).cast("string")),
        ).otherwise(F.lit(""))
        docs = _read(spark, sf, "documents").select(
            "doc_id",
            F.concat(F.col("text"), seg_email, seg_ip, seg_ssn,
                     seg_phone, seg_cc).alias("itext"),
        )
        return annotate_pii(docs, "itext").select(
            "doc_id", "n_email", "n_ipv4", "n_ssn", "n_credit_card",
            "n_phone", "n_pii", "redacted",
        )

    def decontaminate_q(spark, sf):
        from search_engine_spark.operators.dedup import contaminated_ids

        docs = _docs_enriched(spark, sf)
        bench = docs.filter(F.col("doc_id") % 50 == 0)
        corpus = docs.filter(F.col("doc_id") % 50 != 0)
        return contaminated_ids(corpus, bench, "doc_id", "tokens", n=8)

    def semantic_decontaminate_q(spark, sf):
        """Semantic (embedding-cosine) test-set decontamination
        (operators/dedup.semantic_contaminated_ids): corpus vectors
        within cosine 0.4 of any benchmark vector (vec_id%10 split)."""
        from search_engine_spark.operators.dedup import (
            semantic_contaminated_ids,
        )

        emb = _read(spark, sf, "embeddings")
        bench = emb.filter(F.col("vec_id") % 10 == 0)
        corpus = emb.filter(F.col("vec_id") % 10 != 0)
        return semantic_contaminated_ids(
            corpus, bench, threshold=0.4, id_col="vec_id"
        )

    def sample_per_group_q(spark, sf):
        from search_engine_spark.operators.curation import (
            sample_n_per_group,
        )

        return sample_n_per_group(
            _read(spark, sf, "documents"), 5, "source", "doc_id",
            salt="v1",
        ).select("doc_id", "source")

    def filter_urls_q(spark, sf):
        # synthesized deterministic urls (same expression in the
        # oracle), host blocklist + pattern blocklist
        from search_engine_spark.operators.curation import filter_urls

        url = F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
        )
        docs = _read(spark, sf, "documents").select(
            "doc_id", url.alias("url")
        )
        return filter_urls(
            docs,
            deny_hosts=["site3.example", "site7.example"],
            deny_patterns=[".*0$"],
        )

    def robots_filter_q(spark, sf):
        """RFC 9309 robots.txt policy (operators/robots.py): the
        group-stateful parser AND the longest-match/allow-ties
        matcher both replayed by the DuckDB oracle (window-function
        parse on the same literal body)."""
        from search_engine_spark.operators.robots import (
            robots_allowed,
        )

        url = F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
        )
        docs = _read(spark, sf, "documents").select(
            "doc_id", url.alias("url")
        )
        robots = (
            docs.select(
                F.regexp_extract(
                    "url", r"^https?://([^/]+)", 1
                ).alias("site")
            )
            .distinct()
            .withColumn("robots_txt", F.lit(ROBOTS_BODY))
        )
        res = robots_allowed(docs, robots, agent="crawler")
        return res.select("doc_id", "crawl_allowed")

    def sitemap_entries_q(spark, sf):
        """XML sitemap parse (sources/sitemap.py): site-varying
        synthesized urlset bodies, the regex parse replayed by the
        DuckDB oracle."""
        from search_engine_spark.sources.sitemap import parse_sitemap

        site = F.concat(
            F.lit("site"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example"),
        )
        sites = (
            _read(spark, sf, "documents")
            .select(site.alias("site"))
            .distinct()
        )
        xml = F.concat(
            F.lit("<urlset><url><loc>https://"), F.col("site"),
            F.lit("/p1</loc><lastmod>2024-03-05</lastmod>"
                  "<priority>0.8</priority></url>"
                  "<url><loc> https://"), F.col("site"),
            F.lit("/p2 </loc><changefreq>daily</changefreq></url>"
                  "<url><lastmod>2024-01-01</lastmod></url>"
                  "</urlset>"),
        )
        return parse_sitemap(sites.withColumn("sitemap_xml", xml))

    def chunk_documents_q(spark, sf):
        from search_engine_spark.operators.packing import (
            chunk_documents,
        )

        ch = chunk_documents(
            _docs_enriched(spark, sf), "doc_id", "tokens",
            chunk_len=64, overlap=16,
        )
        return ch.select(
            "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_fp"),
            "n_tokens",
        )

    def pack_sequences_q(spark, sf):
        from search_engine_spark.operators.packing import pack_sequences

        packs = pack_sequences(
            _docs_enriched(spark, sf), seq_len=512,
            id_col="doc_id", tokens_col_name="tokens",
        )
        return packs.select(
            "pack_id", "n_tokens",
            F.md5(F.array_join("tokens", " ")).alias("fp"),
        )

    def suggest_terms_q(spark, sf):
        from search_engine_spark.operators.fuzzy import suggest_terms

        ts = _docs_index(spark, sf).term_stats.select("term", "df")
        return suggest_terms(ts, "s", k=5).select(
            "term", F.col("df").cast("long").alias("df")
        )

    def stratified_sample_q(spark, sf):
        from search_engine_spark.operators.curation import (
            stratified_sample,
        )

        docs = _read(spark, sf, "documents")
        return stratified_sample(
            docs,
            {"en": 0.5, "de": 0.2},
            stratum_col="lang",
            default_fraction=0.1,
            salt="v1",
        ).select("doc_id", "lang")

    def weighted_sample_q(spark, sf):
        from search_engine_spark.operators.curation import (
            weighted_sample,
        )

        docs = _read(spark, sf, "documents").withColumn(
            "w", (F.lit(0.5) + F.col("doc_id") % 7).cast("double")
        )
        return weighted_sample(docs, 50, "w", salt="v1").select(
            "doc_id", "lang", "w"
        )

    def pagerank_q(spark, sf):
        # deterministic synthetic link graph over the first 200 docs
        # (docs ending in 9 are dangling sinks; two affine out-edges
        # each, duplicates = parallel-edge weighting) — identical
        # construction in the chained-CTE oracle.
        from search_engine_spark.operators.graph import pagerank

        docs = (
            _read(spark, sf, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") < 200)
        )
        nodes = docs.select(F.col("doc_id").alias("node_id"))
        src = docs.filter(F.col("doc_id") % 10 != 9)
        edges = src.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 1) % 200).alias("dst"),
        ).unionByName(
            src.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 13 + 3) % 200).alias("dst"),
            )
        )
        pr = pagerank(nodes, edges, n_iter=6)
        return pr.select("node_id", F.round("rank", 6).alias("rank"))

    def hits_q(spark, sf):
        # HITS hubs/authorities (Kleinberg 1999) over the same
        # synthetic link graph as pagerank_q; 3 iterations of
        # L2-normalized mutual reinforcement, oracle = the generated
        # 3-iteration CTE chain (_hits_sql).
        from search_engine_spark.operators.graph import hits

        docs = (
            _read(spark, sf, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") < 200)
        )
        nodes = docs.select(F.col("doc_id").alias("node_id"))
        src = docs.filter(F.col("doc_id") % 10 != 9)
        edges = src.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 1) % 200).alias("dst"),
        ).unionByName(
            src.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 13 + 3) % 200).alias("dst"),
            )
        )
        hs = hits(nodes, edges, n_iter=3)
        return hs.select(
            "node_id",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )

    def _impressions(spark, sf):
        # deterministic synthetic search-impression log derived from
        # the events stream table (identical projection in the
        # oracles): query, result doc, SERP position, click flag
        ev = _read(spark, sf, "events")
        return ev.select(
            (F.col("event_id") % 20).alias("query_id"),
            ((F.col("event_id") * 7) % 500).alias("doc_id"),
            (F.col("event_id") % 10 + 1).alias("position"),
            (F.col("event_type") == "click").alias("clicked"),
        )

    def click_coec_q(spark, sf):
        from search_engine_spark.operators.clicks import coec_scores

        return coec_scores(_impressions(spark, sf)).select(
            "query_id",
            "doc_id",
            "n_impressions",
            "n_clicks",
            F.round("expected_clicks", 6).alias("expected_clicks"),
            F.round("coec", 6).alias("coec"),
        )

    def click_pbm_q(spark, sf):
        from search_engine_spark.operators.clicks import pbm_em_step

        return pbm_em_step(
            _impressions(spark, sf), alpha0=0.5
        ).select(
            "query_id",
            "doc_id",
            "n_impressions",
            F.round("alpha", 6).alias("alpha"),
        )

    def bm25_tuning_q(spark, sf):
        # (k1, b) grid sweep in one job (plans/tuning.tune_bm25) over
        # the rank_eval query set and its deterministic graded qrels
        from search_engine_spark.plans.tuning import tune_bm25

        idx = _docs_index(spark, sf)
        qt = spark.createDataFrame(
            [
                (qid, t)
                for qid, q in EVAL_QUERIES
                for t in sorted(set(q.split()))
            ],
            "query_id int, term string",
        )
        j = idx.postings.join(F.broadcast(qt), "term")
        qrels = j.groupBy("query_id", "doc_id").agg(
            (F.countDistinct("term") - F.lit(1))
            .cast("int")
            .alias("rel")
        )
        res = tune_bm25(
            idx,
            [q for _, q in EVAL_QUERIES],
            qrels,
            TUNING_GRID,
            k=10,
            analyzer="tokens",
        )
        return res.select(
            "combo", "k1", "b", "mrr", "ndcg", "recall"
        )

    def ltr_linear_rerank_q(spark, sf):
        # closed-form linear LTR: train on (bm25, coverage) with a
        # deterministic synthetic relevance label, rerank the pools.
        # bm25 is quantized to 6 dp BEFORE training so engine and
        # oracle fit on identical values; the oracle replays the
        # Gram sums + 3x3 adjugate solve (same operation order as
        # plans/ltr._solve3) in SQL
        from search_engine_spark.plans.ltr import (
            ltr_features,
            score_linear_ltr,
            train_linear_ltr,
        )

        idx = _docs_index(spark, sf)
        feats = ltr_features(
            idx,
            [FLAGSHIP_QUERY, "window spark", "sort query big",
             "hash table"],
            limit=10,
            analyzer="tokens",
        ).select(
            "query_id",
            "doc_id",
            F.round("bm25", 6).alias("bm25"),
            "coverage",
        )
        labeled = feats.withColumn(
            "label", (F.col("doc_id") % 3).cast("double")
        )
        w = train_linear_ltr(labeled, ["bm25", "coverage"])
        scored = score_linear_ltr(
            feats, w, ["bm25", "coverage"]
        ).withColumn("ltr_score", F.round("ltr_score", 6))
        win = Window.partitionBy("query_id").orderBy(
            F.desc("ltr_score"), F.asc("doc_id")
        )
        return scored.select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            "ltr_score",
            F.row_number().over(win).cast("int").alias("rn"),
        )

    def related_coclick_q(spark, sf):
        # co-click related queries over a synthetic impression log
        # (hot-doc guard active at its default).  doc modulus 499 is
        # coprime to the query modulus 20, so distinct queries DO
        # co-click docs (with modulus 500 every doc collision implied
        # the same query — a degenerate always-empty result)
        from search_engine_spark.operators.querylog import (
            related_queries_coclick,
        )

        ev = _read(spark, sf, "events")
        imp = ev.select(
            (F.col("event_id") % 20).alias("query_id"),
            ((F.col("event_id") * 7) % 499).alias("doc_id"),
            (F.col("event_type") == "click").alias("clicked"),
        )
        return related_queries_coclick(imp, k=5)

    def query_transitions_q(spark, sf):
        # session reformulation mining over a deterministic synthetic
        # query log derived from events (same projection in the
        # oracle)
        from search_engine_spark.operators.querylog import (
            query_transitions,
        )

        # 10 synthetic users keep same-user consecutive events ~20
        # minutes apart at sf0.01 — inside the 30-minute session gap
        ev = _read(spark, sf, "events")
        log = ev.select(
            (F.col("event_id") % 10).alias("user_id"),
            F.col("ts"),
            ((F.col("event_id") * 13) % 30).alias("query_id"),
        )
        return query_transitions(log, k=5)

    def _synth_rankings(spark, sf):
        # two deterministic overlapping top-10 rankings per query
        # (10 queries), derived from the documents table; identical
        # arithmetic in the oracles
        base = (
            _read(spark, sf, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") < 10)
        )
        qi = base.select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"),
        )
        a = qi.select(
            "query_id",
            ((F.col("query_id") * 31 + F.col("i") * 7) % 200)
            .alias("doc_id"),
            (F.col("i") + 1).cast("long").alias("rn"),
        )
        b = qi.select(
            "query_id",
            ((F.col("query_id") * 31 + F.col("i") * 11 + 3) % 200)
            .alias("doc_id"),
            (F.col("i") + 1).cast("long").alias("rn"),
        )
        return a, b

    def interleave_balanced_q(spark, sf):
        # balanced interleaving (Joachims 2003) of two rankers'
        # top-10 lists; md5 leader coin so the DuckDB oracle replays
        # the merge bit-exactly
        from search_engine_spark.operators.interleave import (
            balanced_interleave,
        )

        a, b = _synth_rankings(spark, sf)
        return balanced_interleave(
            a, b, k=10, seed=42, hash_method="md5"
        ).select(
            "query_id", "pos", "doc_id",
            F.col("rank_a").cast("long").alias("rank_a"),
            F.col("rank_b").cast("long").alias("rank_b"),
        )

    def interleave_outcome_q(spark, sf):
        # balanced-interleaving credit rule over deterministic
        # synthetic clicks (docs divisible by 3)
        from search_engine_spark.operators.interleave import (
            balanced_outcome,
        )

        a, b = _synth_rankings(spark, sf)
        clicks = (
            a.select("query_id", "doc_id")
            .unionByName(b.select("query_id", "doc_id"))
            .filter(F.col("doc_id") % 3 == 0)
        )
        return balanced_outcome(a, b, clicks).select(
            "query_id",
            F.col("k").cast("long").alias("k"),
            F.col("clicks_a").cast("long").alias("clicks_a"),
            F.col("clicks_b").cast("long").alias("clicks_b"),
            "winner",
        )

    def interleave_team_draft_q(spark, sf):
        # team-draft interleaving (Radlinski et al. 2008) — the
        # per-round captain pick is sequential per query (Arrow
        # applyInPandas), not SQL-expressible; pytest validates the
        # algorithm against a verbatim sequential reference
        from search_engine_spark.operators.interleave import (
            team_draft_interleave,
        )

        a, b = _synth_rankings(spark, sf)
        return team_draft_interleave(a, b, k=10, seed=42)

    def interleave_team_draft_md5_q(spark, sf):
        """Team-draft with the md5-parity tie coin: a DuckDB
        RECURSIVE CTE replays the sequential draft itself — per-step
        next-unpicked selection from each team's list, fewer-picks-
        first turn order, md5 coin on ties, exhausted-side fallback —
        hash-checking the stateful interleaving end-to-end (the
        xxhash production coin above stays rows-only)."""
        from search_engine_spark.operators.interleave import (
            team_draft_interleave,
        )

        a, b = _synth_rankings(spark, sf)
        return team_draft_interleave(
            a, b, k=10, seed=42, coin_method="md5"
        )

    def rank_rbo_q(spark, sf):
        # truncated rank-biased overlap between the two synthetic
        # rankers (plans/eval.rank_compare) — the offline ranking
        # regression diff
        from search_engine_spark.plans.eval import rank_compare

        a, b = _synth_rankings(spark, sf)
        return rank_compare(a, b, k=10, p=0.9)

    def fuzzy_terms_q(spark, sf):
        # SymSpell deletion-neighborhood candidates + JVM levenshtein
        # verify == brute-force scan (the oracle) for d=1, by the
        # deletion-collision argument (operators/fuzzy.py docstring).
        from search_engine_spark.operators.fuzzy import fuzzy_terms

        ts = _docs_index(spark, sf).term_stats.select("term", "df")
        return fuzzy_terms(ts, "quer", max_dist=1).select(
            "term", F.col("df").cast("long").alias("df"), "dist"
        )

    def c4_span_dups(spark, sf):
        # documents.text is one long unpunctuated line; synthesize
        # sentence breaks deterministically (' the ' -> '. ', same
        # regexp_replace in the oracle) so the span machinery is
        # exercised on real multi-sentence input.
        from search_engine_spark.operators.curation import (
            duplicate_spans,
        )

        docs = _read(spark, sf, "documents").select(
            "doc_id",
            F.regexp_replace(F.col("text"), " the ", ". ").alias(
                "stext"
            ),
        )
        return duplicate_spans(docs, "doc_id", "stext").select(
            "span_fp",
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )

    def exact_substr_dedup_q(spark, sf):
        """ExactSubstr dedup (Lee 2021): cut every non-first occurrence
        of a 20-token run; fingerprint the surviving token stream."""
        from search_engine_spark.operators.curation import (
            remove_duplicate_token_spans,
        )

        docs = _docs_enriched(spark, sf).select("doc_id", "tokens")
        out = remove_duplicate_token_spans(docs, k=20)
        return out.select(
            "doc_id",
            F.size("tokens").cast("int").alias("orig_len"),
            F.size("clean_tokens").cast("int").alias("clean_len"),
            F.md5(F.concat_ws(" ", "clean_tokens")).alias("clean_fp"),
        )

    def tfidf_keywords_q(spark, sf):
        from search_engine_spark.operators.curation import tfidf_keywords

        return tfidf_keywords(
            _docs_enriched(spark, sf), "doc_id", "tokens", k=3
        ).select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf"),
            "score", "rank",
        )

    def upsample_mixture_q(spark, sf):
        """Mixture epochs: en 2.5x, de 0.25x, everything else 1x —
        replication counts are a pure function of the split bucket, so
        DuckDB replays them exactly (incl. which rows get the
        fractional extra copy)."""
        from search_engine_spark.operators.mixing import upsample_mixture

        docs = _read(spark, sf, "documents")
        return upsample_mixture(
            docs,
            {"en": 2.5, "de": 0.25},
            domain_col="lang",
            default=1.0,
            salt="v1",
        ).select(
            "doc_id", "lang", F.col("copy").cast("int").alias("copy")
        )

    def bpe_merges_q(spark, sf):
        """Distributed BPE learning (exact sequential algorithm, one
        merge per round).  Oracle: a DuckDB RECURSIVE CTE replays the
        training loop itself — freq-weighted adjacent-pair counts,
        (count desc, a, b) argmax with the min-pair-count stop, and
        the greedy leftmost-first merge application including the
        overlapping-run semantics ('aaaa' + (a,a) → [aa, aa]) —
        hash-checking the learned merge sequence end-to-end; also
        pinned against a pure-Python reference in tests/test_bpe.py."""
        from search_engine_spark.operators.bpe import (
            learn_bpe,
            merges_table,
        )

        docs = _docs_enriched(spark, sf).select("tokens")
        merges = learn_bpe(docs, 16)
        return merges_table(spark, merges).select(
            F.col("rank").cast("int").alias("rank"), "a", "b"
        )

    def unigram_vocab_q(spark, sf):
        """Distributed unigram-LM tokenizer learning (SentencePiece
        Viterbi-EM) — no SQL oracle (iterative EM + Arrow Viterbi);
        pinned against a pure-Python sequential reference in
        tests/test_unigram_tok.py."""
        from search_engine_spark.operators.unigram_tok import (
            learn_unigram,
            unigram_vocab_table,
        )

        docs = _docs_enriched(spark, sf).select("tokens")
        vocab = learn_unigram(
            docs, vocab_size=48, seed_size=200, max_piece_len=6,
            em_rounds=1,
        )
        return unigram_vocab_table(spark, vocab).select(
            "piece", F.round("logprob", 6).alias("logprob")
        )

    def hll_distinct_per_lang(spark, sf):
        """Mergeable HLL distinct-doc sketches per lang — estimates
        are sketch-dependent (no SQL oracle); accuracy and merge
        semantics pinned in tests/test_mixing.py."""
        from search_engine_spark.operators.sketches import (
            hll_build,
            hll_estimate,
        )

        docs = _read(spark, sf, "documents")
        return hll_estimate(hll_build(docs, "doc_id", ["lang"])).select(
            "lang", F.col("est").cast("long").alias("est")
        )

    def hll_registers_md5_q(spark, sf):
        """SQL-reproducible HLL twin (Flajolet 2007 register table
        over the CMS md5-substring hash idiom) — every register is
        DuckDB-recomputed; the production DataSketches path above
        keeps the same one-groupBy merge-by-MAX shape."""
        from search_engine_spark.operators.sketches import (
            hll_registers_md5,
        )

        docs = _read(spark, sf, "documents")
        return hll_registers_md5(docs, "doc_id", ["lang"], lg_k=8)

    def hll_estimate_md5_q(spark, sf):
        """Distinct-count estimates from the md5 register table (raw
        harmonic-mean estimator + linear-counting small-range
        correction), hash-checked against DuckDB to 1e-6."""
        from search_engine_spark.operators.sketches import (
            hll_estimate_md5,
            hll_registers_md5,
        )

        docs = _read(spark, sf, "documents")
        reg = hll_registers_md5(docs, "doc_id", ["lang"], lg_k=8)
        return hll_estimate_md5(reg, ["lang"], lg_k=8).select(
            "lang", F.round("est", 6).alias("est")
        )

    def quantile_cells_md5_q(spark, sf):
        """Dyadic-CMS quantile sketch with the SQL-reproducible md5
        bucket hash: the (lvl,row,col,cnt) cell table over
        documents.n_chars, every bucket DuckDB-recomputed (the
        xxhash64 twin above stays the fast default, rows-only)."""
        from search_engine_spark.operators.sketches import (
            quantile_build,
        )

        docs = _read(spark, sf, "documents")
        return quantile_build(
            docs, "n_chars", bits=QSK_BITS, depth=QSK_DEPTH,
            width=QSK_WIDTH, hash_method="md5",
        )

    def quantile_ranks_md5_q(spark, sf):
        """Rank estimates (count of docs with n_chars < v) from the
        md5 sketch for fixed probe values — dyadic cover + CMS-min +
        sum, hash-checked against the full DuckDB replay."""
        from search_engine_spark.operators.sketches import (
            quantile_build,
            quantile_ranks,
        )

        docs = _read(spark, sf, "documents")
        sk = quantile_build(
            docs, "n_chars", bits=QSK_BITS, depth=QSK_DEPTH,
            width=QSK_WIDTH, hash_method="md5",
        )
        ranks = quantile_ranks(
            sk, QSK_PROBES, bits=QSK_BITS, depth=QSK_DEPTH,
            width=QSK_WIDTH, hash_method="md5",
        )
        return spark.createDataFrame(
            sorted(ranks.items()), "value long, rank_est long"
        )

    def bloom_bits_md5_q(spark, sf):
        """Bloom filter (operators/bloom.bloom_build, md5 twin) over
        the doc_id%3==0 member set: the distinct set-bit table IS the
        filter artifact, every bit DuckDB-recomputed."""
        from search_engine_spark.operators.bloom import bloom_build

        members = _read(spark, sf, "documents").filter(
            F.col("doc_id") % 3 == 0
        )
        return bloom_build(
            members, "doc_id", m_bits=BLOOM_M, k=BLOOM_K,
            hash_method="md5",
        )

    def bloom_contains_md5_q(spark, sf):
        """Membership probes of ALL doc_ids against the doc_id%3==0
        Bloom filter: members must read true (no false negatives),
        non-members read true only on hash collisions — the exact
        collision set is hash-checked against the DuckDB replay."""
        from search_engine_spark.operators.bloom import (
            bloom_build,
            bloom_contains,
        )

        docs = _read(spark, sf, "documents")
        bloom = bloom_build(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id",
            m_bits=BLOOM_M, k=BLOOM_K, hash_method="md5",
        )
        return bloom_contains(
            bloom, docs, "doc_id", m_bits=BLOOM_M, k=BLOOM_K,
            hash_method="md5",
        )

    def boilerplate_lines(spark, sf):
        # synthesized multi-line docs: per-site recurring footer
        # (dropped), a corpus-wide banner recurring in every doc of
        # doc_id%4==0 (dropped at site scope only when the site has
        # >max_df of them), and a unique body line (kept)
        from search_engine_spark.operators.curation import (
            remove_boilerplate_lines,
        )

        d = F.col("doc_id").cast("string")
        text = F.concat(
            F.lit("body "), d, F.lit(" "),
            F.substring(F.col("text"), 1, 40),
            F.lit("\ncopyright "), F.col("source"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit("\nSubscribe To Our Newsletter"))
            .otherwise(F.lit("")),
        )
        # explicit-count repartition: the sf parquet is one input
        # split, and AQE would coalesce a count-less repartition right
        # back — the line explode needs map-side parallelism (a real
        # corpus gets this from input splits for free)
        docs = _read(spark, sf, "documents").select(
            "doc_id", F.col("source").alias("site"),
            text.alias("text"),
        ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
        return remove_boilerplate_lines(docs, max_df=3).select(
            "doc_id", "clean_text"
        )

    def dsir_resample_q(spark, sf):
        # DSIR: raw pool = all documents, target = the deterministic
        # en-lang doc_id%7==0 slice; keep the 50 docs whose Gumbel-
        # noised importance key is largest (selection.py)
        from search_engine_spark.operators.selection import (
            dsir_resample,
        )

        # explicit-count repartition: one input split + AQE coalescing
        # would run the gram explode/md5 single-task otherwise
        docs = _read(spark, sf, "documents").select(
            "doc_id", "text", "lang", "source"
        ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
        target = docs.filter(
            (F.col("lang") == "en") & (F.col("doc_id") % 7 == 0)
        )
        return dsir_resample(
            docs, target, k=50, n_buckets=4096, salt="sel-v1"
        ).select("doc_id", "lang", "source")

    def quality_classifier_scores(spark, sf):
        """GPT-3-style LR quality classifier trained distributed on
        label = (lang == 'en'), scored corpus-wide.  Iterative GD —
        no SQL oracle by nature (rows-only); exact-vs-numpy parity is
        pinned by tests/test_selection.py."""
        from search_engine_spark.operators.selection import (
            score_quality,
            train_quality_classifier,
        )

        docs = _read(spark, sf, "documents").select(
            "doc_id", "text", "lang"
        )
        labeled = docs.withColumn(
            "label", (F.col("lang") == "en").cast("int")
        )
        model = train_quality_classifier(
            labeled, n_buckets=512, iters=8, lr=5.0, salt="sel-v1"
        )
        return score_quality(docs, model).select(
            "doc_id", F.round("quality_score", 6).alias("quality_score")
        )

    def doclen_quantile_sketch(spark, sf):
        """Dyadic-CMS quantile estimates of documents.n_chars —
        estimates are sketch-dependent (xxhash64 buckets, no SQL
        oracle); accuracy/merge pinned in tests/test_sketches.py."""
        from search_engine_spark.operators.sketches import (
            quantile_build,
            quantile_query,
        )

        docs = _read(spark, sf, "documents")
        sk = quantile_build(docs, "n_chars")
        est = quantile_query(sk, [0.1, 0.5, 0.9, 0.99])
        return spark.createDataFrame(
            [(q, int(v)) for q, v in sorted(est.items())],
            "q double, value long",
        )

    return {
        "tokenize_doclen": tokenize_doclen,
        "postings": postings_q,
        "term_stats": term_stats_q,
        "doc_stats": doc_stats_q,
        "stoplist": stoplist_q,
        "query_idf": idf_q,
        "bm25_topk": bm25_topk,
        "more_like_this_topk": more_like_this_q,
        "impact_topk": impact_topk_q,
        "bm25_topk_pruned": bm25_topk_pruned_q,
        "bm25_rescore_topk": bm25_rescore_topk_q,
        "bm25_prf_topk": bm25_prf_topk,
        "bm25_champion_topk": bm25_champion_topk,
        "vsm_topk": vsm_topk_q,
        "bm25_federated_topk": bm25_federated_topk,
        "cori_shard_scores": cori_shard_scores_q,
        "redde_shard_scores": redde_shard_scores_q,
        "taily_shard_scores": taily_shard_scores_q,
        "taily_shard_scores_erlang": taily_shard_scores_erlang_q,
        "taily_erlang_multiterm": taily_erlang_multiterm_q,
        "snippets_topk": snippets_topk_q,
        "snippets_multisentence": snippets_multisentence_q,
        "snippets_assembly_cut": snippets_assembly_cut_q,
        "snippets_fixed_idf": snippets_fixed_idf_q,
        "tiered_merge_postings": tiered_merge_postings_q,
        "incremental_postings": incremental_postings_q,
        "incremental_positions": incremental_positions_q,
        "time_travel_postings": time_travel_postings_q,
        "incremental_vacuum_postings": incremental_vacuum_postings_q,
        "incremental_term_stats": incremental_term_stats_q,
        "bm25_not_topk": bm25_not_topk,
        "bm25_collapsed_topk": bm25_collapsed_topk,
        "bm25_priors_topk": bm25_priors_topk,
        "bm25_fresh_topk": bm25_fresh_topk,
        "bm25_and_topk": bm25_and_topk,
        "bool_search": bool_search,
        "bm25_synonyms_topk": bm25_synonyms_topk,
        "pl2_topk": pl2_topk,
        "sdm_topk": sdm_topk,
        "bm25_passage_topk": bm25_passage_topk,
        "bm25plus_topk": bm25plus_topk,
        "bm25l_topk": bm25l_topk,
        "qpp_predictors": qpp_predictors_q,
        "query_clarity": query_clarity_q,
        "lm_dirichlet_topk": lm_dirichlet_topk,
        "lm_jm_topk": lm_jm_topk,
        "min_span_docs": min_span_docs,
        "proximity_topk": proximity_topk,
        "prefix_search": prefix_search_q,
        "explain_score": explain_score_q,
        "bm25_search_after": bm25_search_after_q,
        "did_you_mean": did_you_mean_q,
        "wildcard_search": wildcard_search_q,
        "wildcard_terms": wildcard_terms_q,
        "collocations": collocations_q,
        "near_topk": near_topk,
        "next_token_suggestions": next_token_q,
        "corpus_diff": corpus_diff_q,
        "bigram_logprob": bigram_logprob_q,
        "kneser_ney_logprob": kneser_ney_q,
        "ppl_buckets": ppl_buckets_q,
        "latest_snapshot": latest_snapshot_q,
        "site_quality_stats": site_quality_q,
        "rank_eval": rank_eval_q,
        "bm25_site_restricted": bm25_site_restricted,
        "bm25_pagination": bm25_pagination,
        "postings_lemma": postings_lemma,
        "bm25_topk_lemma": bm25_topk_lemma,
        "bm25_wand_topk": bm25_wand_topk,
        "bm25_topk_local": bm25_topk_local,
        "bm25_maxscore_topk": bm25_maxscore_topk,
        "bm25_wand_pagination": bm25_wand_pagination,
        "percolate_rarest": percolate_rarest,
        "percolate_all": percolate_all,
        "canonical_urls": canonical_urls,
        "site_statistics": site_statistics_q,
        "embedding_near_dup": embedding_near_dup,
        "embedding_near_dup_lsh": embedding_near_dup_lsh,
        "embedding_near_dup_lsh_md5": embedding_near_dup_lsh_md5,
        "dedup_exact": dedup_exact,
        "dedup_exact_normalized": dedup_exact_normalized,
        "ngram_jaccard_pairs": ngram_jaccard,
        "ngram_containment_pairs": ngram_containment,
        "winnow_fingerprints": winnow_fps,
        "winnow_reuse_pairs": winnow_pairs,
        "minhash_lsh_pairs": minhash_pairs,
        "minhash_pairs_md5": minhash_pairs_md5,
        "simhash_md5": simhash_md5,
        "simhash_pairs_md5": simhash_pairs_md5,
        "simhash": simhash,
        "simhash_near_dup_pairs": simhash_pairs,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_cosine_lsh": ann_cosine_lsh,
        "ann_cosine_lsh_md5": ann_cosine_lsh_md5,
        "ann_cosine_ivfpq_md5": ann_cosine_ivfpq_md5,
        "ann_cosine_ivfpq": ann_cosine_ivfpq,
        "hybrid_rrf": hybrid_rrf,
        "mmr_diversify": mmr_diversify,
        "kmeans_clusters": kmeans_clusters,
        "semantic_dedup": semantic_dedup_q,
        "cluster_top_terms": cluster_top_terms_q,
        "text_quality": text_quality,
        "lang_id": lang_id_q,
        "fingerprint": fingerprint_q,
        "dedup_clusters": dedup_clusters,
        "dedup_keep_longest": dedup_keep_longest,
        "training_pipeline": training_pipeline,
        "training_pipeline_curated": training_pipeline_curated,
        "pii_scan": pii_scan,
        "decontaminate": decontaminate_q,
        "semantic_decontaminate": semantic_decontaminate_q,
        "c4_span_dedup": c4_span_dups,
        "exact_substr_dedup": exact_substr_dedup_q,
        "fuzzy_terms": fuzzy_terms_q,
        "pagerank": pagerank_q,
        "hits_scores": hits_q,
        "click_coec": click_coec_q,
        "click_pbm_alpha": click_pbm_q,
        "interleave_balanced": interleave_balanced_q,
        "interleave_outcome": interleave_outcome_q,
        "interleave_team_draft": interleave_team_draft_q,
        "interleave_team_draft_md5": interleave_team_draft_md5_q,
        "rank_rbo": rank_rbo_q,
        "related_coclick": related_coclick_q,
        "query_transitions": query_transitions_q,
        "ltr_linear_rerank": ltr_linear_rerank_q,
        "bm25_tuning": bm25_tuning_q,
        "sample_per_group": sample_per_group_q,
        "filter_urls": filter_urls_q,
        "robots_filter": robots_filter_q,
        "sitemap_entries": sitemap_entries_q,
        "chunk_documents": chunk_documents_q,
        "pack_sequences": pack_sequences_q,
        "suggest_terms": suggest_terms_q,
        "stratified_sample": stratified_sample_q,
        "weighted_sample": weighted_sample_q,
        "tfidf_keywords": tfidf_keywords_q,
        "event_sessions": event_sessions,
        "asof_join_events": asof_join_events,
        "range_join_events": range_join_events,
        "user_activity_sketch": user_activity_sketch,
        "agg_sum_by_key": agg_sum_by_key,
        "join_revenue_topk": join_revenue_topk,
        "anti_join_no_orders": anti_join_no_orders,
        "semi_join_segments": semi_join_segments,
        "topk_orders": topk_orders,
        "window_pagination": window_pagination,
        "grouped_statistics": grouped_statistics,
        "union_distinct": union_distinct,
        "distinct_values": distinct_values,
        "avg_scalar": avg_scalar,
        "event_hourly_window": event_hourly_window,
        "phrase_match": phrase_match_q,
        "phrase_search": phrase_search_q,
        "doclen_quantiles": doclen_quantiles,
        "ngram_repetition": ngram_repetition_q,
        "gopher_gate": gopher_gate_q,
        "unigram_logprob": unigram_logprob_q,
        "assign_split": assign_split_q,
        "site_lang_rollup": site_lang_rollup,
        "extract_links": extract_links,
        "extract_text_roundtrip": extract_text_roundtrip,
        "extract_title": extract_title,
        "anchor_postings": anchor_postings_q,
        "bm25f_anchor_topk": bm25f_anchor_topk,
        "bm25f_topk": bm25f_topk_q,
        "dismax_topk": dismax_topk_q,
        "bm25_batch": bm25_batch,
        "ltr_features": ltr_features_q,
        "bm25_batch_compact": bm25_batch_compact,
        "facet_counts": facet_counts_q,
        "novel_documents": novel_documents_q,
        "cms_term_counts": cms_term_counts,
        "cms_counts_md5": cms_counts_md5,
        "doclen_quantile_sketch": doclen_quantile_sketch,
        "boilerplate_lines": boilerplate_lines,
        "dsir_resample": dsir_resample_q,
        "quality_classifier_scores": quality_classifier_scores,
        "topk_per_site": topk_per_site,
        "intersect_customers": intersect_customers,
        "except_customers": except_customers,
        "site_doclen_quantiles": site_doclen_quantiles,
        "upsample_mixture": upsample_mixture_q,
        "bpe_merges": bpe_merges_q,
        "unigram_vocab": unigram_vocab_q,
        "hll_distinct_per_lang": hll_distinct_per_lang,
        "hll_registers_md5": hll_registers_md5_q,
        "hll_estimate_md5": hll_estimate_md5_q,
        "quantile_cells_md5": quantile_cells_md5_q,
        "quantile_ranks_md5": quantile_ranks_md5_q,
        "bloom_bits_md5": bloom_bits_md5_q,
        "bloom_contains_md5": bloom_contains_md5_q,
    }


def _mmr_sql(k: int = 10, lam: float = 0.7, pool: int = 50) -> str:
    """DuckDB oracle for :func:`mmr_diversify` — the greedy MMR loop
    unrolled as one argmax CTE per rank.

    ``sel{i}`` picks the candidate maximizing
    ``round(λ·rel − (1−λ)·max_sim_to_selected, 6)`` (ties → smaller
    id), exactly mirroring ``plans/diversify.mmr_select``.  Pool
    relevance is the round-6 cosine to query vec 0 (same as the Spark
    side's ``cosine_topk_bruteforce`` input); pairwise sims stay full
    precision until the final round, as in numpy.  ``1 − λ`` is
    emitted via ``repr`` so both engines multiply by the identical
    double (0.7 → 0.30000000000000004)."""
    one_minus = repr(1.0 - lam)
    parts = [
        f"""
        WITH q0 AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS qvec
                    FROM embeddings WHERE vec_id = 0),
        pool AS MATERIALIZED (
          SELECT e.vec_id AS id,
                 round(list_cosine_similarity(
                   q0.qvec, CAST(e.embedding AS DOUBLE[])), 6) AS rel,
                 CAST(e.embedding AS DOUBLE[]) AS vec
          FROM embeddings e CROSS JOIN q0
          WHERE e.vec_id <> 0
          QUALIFY row_number() OVER (
            ORDER BY rel DESC, id ASC) <= {pool}
        ),
        sims AS MATERIALIZED (
          SELECT a.id AS ia, b.id AS ib,
                 list_cosine_similarity(a.vec, b.vec) AS s
          FROM pool a JOIN pool b ON a.id <> b.id
        ),
        sel1 AS MATERIALIZED (
          SELECT id, rel AS score, 1 AS rank FROM pool
          ORDER BY score DESC, id ASC LIMIT 1
        )"""
    ]
    for i in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT id FROM sel{j}" for j in range(1, i)
        )
        parts.append(
            f""",
        sel{i} AS MATERIALIZED (
          SELECT p.id,
                 round({lam} * p.rel - {one_minus} * max(s.s), 6)
                   AS score,
                 {i} AS rank
          FROM pool p JOIN sims s
            ON s.ia = p.id AND s.ib IN ({prev})
          WHERE p.id NOT IN ({prev})
          GROUP BY p.id, p.rel
          ORDER BY score DESC, p.id ASC LIMIT 1
        )"""
        )
    final = " UNION ALL ".join(
        f"SELECT * FROM sel{j}" for j in range(1, k + 1)
    )
    parts.append(
        f"""
        SELECT id AS doc_id, score AS mmr_score,
               CAST(rank AS INTEGER) AS mmr_rank
        FROM ({final}) ORDER BY mmr_rank"""
    )
    return "".join(parts)


def _kmeans_ctes(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Shared DuckDB CTE chain replaying the distributed Lloyd
    recursion of ``operators/embcluster.kmeans_lloyd`` exactly:

    ``uv`` unit-normalizes (zero vectors stay zero — sims computed
    as ``list_dot_product`` over unit vectors, never a 0/0 cosine);
    ``c0`` is the deterministic init (unit vectors of the k smallest
    ids); each iteration is assign (round-6 dot, first-max-index
    argmax, matching numpy) → per-cluster element-wise mean over
    ``range(1, dim+1)`` positions → renormalize, empty clusters
    keeping the previous centroid via LEFT JOIN + COALESCE.  Ends
    with ``af(id, u, cluster)`` — the assignment under the FINAL
    centroids (one more assign than mean steps, mirroring
    ``assign_centroids`` after training)."""
    unit = (
        "CASE WHEN sqrt(list_sum(list_transform({v}, x -> x*x))) > 0"
        " THEN list_transform({v}, x -> x / sqrt(list_sum("
        "list_transform({v}, y -> y*y))))"
        " ELSE list_transform({v}, x -> 0.0) END"
    )
    parts = [
        f"""
        uv AS MATERIALIZED (
          SELECT vec_id AS id,
                 {unit.format(v="CAST(embedding AS DOUBLE[])")} AS u
          FROM embeddings
        ),
        c0 AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY id) - 1 AS cid, u AS cent
          FROM (SELECT id, u FROM uv ORDER BY id LIMIT {k})
        )"""
    ]

    def assign_cte(name: str, cents: str) -> str:
        sims = ", ".join(
            f"round(list_dot_product(u, (SELECT cent FROM {cents} "
            f"WHERE cid = {c})), 6)"
            for c in range(k)
        )
        return f""",
        {name} AS MATERIALIZED (
          SELECT id, u,
                 CAST(list_indexof(s, list_aggregate(s, 'max')) - 1
                      AS INTEGER) AS cluster
          FROM (SELECT id, u, [{sims}] AS s FROM uv)
        )"""

    for i in range(1, iters + 1):
        parts.append(assign_cte(f"a{i - 1}", f"c{i - 1}"))
        parts.append(
            f""",
        m{i} AS MATERIALIZED (
          SELECT cluster AS cid, t.pos, avg(u[t.pos]) AS v
          FROM a{i - 1}, range(1, {dim} + 1) t(pos)
          GROUP BY cid, t.pos
        ),
        n{i} AS MATERIALIZED (
          SELECT cid, list(v ORDER BY pos) AS m
          FROM m{i} GROUP BY cid
        ),
        c{i} AS MATERIALIZED (
          SELECT c{i - 1}.cid,
                 COALESCE({unit.format(v=f"n{i}.m")}, c{i - 1}.cent)
                   AS cent
          FROM c{i - 1} LEFT JOIN n{i} USING (cid)
        )"""
        )
    parts.append(assign_cte("af", f"c{iters}"))
    return "".join(parts)


def _lemma_map_cte() -> str:
    """``lemma_map(word, lemma)`` VALUES CTE for the DuckDB oracle.

    The production lemmatizer is deterministic pure-Python rules
    (functions/lemmatizer.py); SQL can't run them directly, so the
    testdata corpus's (small, synthetic) vocabulary is enumerated with
    the SAME tokenizer regex the oracle uses and mapped through the
    real :func:`lemmatize` — giving DuckDB a bit-exact word→lemma
    relation.  Words that lemmatize to '' (particles, un-analyzable)
    are omitted: the inner join drops them, mirroring T6.
    """
    import glob

    import duckdb

    from search_engine_spark.functions.lemmatizer import lemmatize

    words: set[str] = set()
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        rows = duckdb.sql(
            r"""
            SELECT DISTINCT unnest(list_filter(
              string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g')),
                '\s+'),
              t -> t <> '')) AS w
            FROM '"""
            + path
            + "'"
        ).fetchall()
        words.update(r[0] for r in rows)
    pairs = sorted(
        (w, lemmatize(w, "english"))
        for w in words
        if lemmatize(w, "english")
    )
    values = ", ".join(f"('{w}', '{l}')" for w, l in pairs)
    return (
        "lemma_map AS (SELECT * FROM (VALUES "
        + values
        + ") AS lm(word, lemma))"
    )


_LPOSTINGS = (
    "postings AS (SELECT lm.lemma AS term, toks.doc_id, count(*) AS tf "
    "FROM toks JOIN lemma_map lm ON toks.term = lm.word GROUP BY 1, 2)"
)


# DuckDB replay of the closed-form linear-LTR pipeline: the batched
# feature oracle (rounded bm25 + exact coverage), synthetic label
# doc_id % 3, the 9 Gram/moment sums, and the 3x3 adjugate solve in
# EXACTLY plans/ltr._solve3's operation order (A is symmetric:
# a10=a01, a20=a02, a21=a12), then w0 + w1*bm25 + w2*coverage.
def _ltr_linear_sql() -> str:
    union = " UNION ALL ".join(
        f"SELECT {i} AS query_id, doc_id, bm25, coverage"
        f" FROM ({_ltr_sql(terms, 10)})"
        for i, terms in enumerate(
            [FLAGSHIP_TERMS, ["window", "spark"],
             ["sort", "query", "big"], ["hash", "table"]]
        )
    )
    return f"""
            WITH f AS ({union}),
            lab AS (
              SELECT bm25, coverage,
                     CAST(doc_id % 3 AS DOUBLE) AS y
              FROM f),
            g AS (
              SELECT sum(1.0) AS a00, sum(bm25) AS a01,
                     sum(coverage) AS a02,
                     sum(bm25 * bm25) AS a11,
                     sum(bm25 * coverage) AS a12,
                     sum(coverage * coverage) AS a22,
                     sum(y) AS b0, sum(bm25 * y) AS b1,
                     sum(coverage * y) AS b2
              FROM lab),
            w AS (
              SELECT
                (a00 * (a11 * a22 - a12 * a12)
                 - a01 * (a01 * a22 - a12 * a02)
                 + a02 * (a01 * a12 - a11 * a02)) AS det,
                (b0 * (a11 * a22 - a12 * a12)
                 - a01 * (b1 * a22 - a12 * b2)
                 + a02 * (b1 * a12 - a11 * b2)) AS d0,
                (a00 * (b1 * a22 - a12 * b2)
                 - b0 * (a01 * a22 - a12 * a02)
                 + a02 * (a01 * b2 - b1 * a02)) AS d1,
                (a00 * (a11 * b2 - b1 * a12)
                 - a01 * (a01 * b2 - b1 * a02)
                 + b0 * (a01 * a12 - a11 * a02)) AS d2
              FROM g),
            s AS (
              SELECT f.query_id, f.doc_id,
                     round((w.d0 / w.det)
                           + (w.d1 / w.det) * f.bm25
                           + (w.d2 / w.det) * f.coverage,
                           6) AS ltr_score
              FROM f CROSS JOIN w)
            SELECT query_id, doc_id, ltr_score,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY ltr_score DESC, doc_id)
                   AS INTEGER) AS rn
            FROM s
    """


_LTR_LINEAR_SQL = _ltr_linear_sql()


def _rbo_sql(k: int = 10, p: float = 0.9) -> str:
    """DuckDB replay of plans/eval.rank_compare over the interleave
    oracles' synthetic rankings: full-outer (query, doc) join, the
    SAME per-doc weight table (w[m] = Σ_{d=m..k} p^(d-1)/d, python-
    repr'd so both engines parse the identical double), one per-query
    aggregation."""
    from search_engine_spark.plans.eval import _rbo_weights

    weights = _rbo_weights(k, p)
    case_w = " ".join(
        f"WHEN {m} THEN {weights[m - 1]!r}"
        for m in range(1, k + 1)
    )
    return f"""
            WITH q AS (
              SELECT doc_id AS query_id FROM documents
              WHERE doc_id < 10),
            iidx AS (
              SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS i),
            qa AS (
              SELECT query_id,
                     (query_id * 31 + i * 7) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            qb AS (
              SELECT query_id,
                     (query_id * 31 + i * 11 + 3) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            j AS (
              SELECT COALESCE(a.query_id, b.query_id) AS query_id,
                     a.rn AS ra, b.rn AS rb
              FROM (SELECT * FROM qa WHERE rn <= {k}) a
              FULL OUTER JOIN (SELECT * FROM qb WHERE rn <= {k}) b
                ON a.query_id = b.query_id
               AND a.doc_id = b.doc_id)
            SELECT query_id,
                   round({1.0 - p!r} * sum(
                     CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                          THEN CASE greatest(ra, rb) {case_w}
                               ELSE 0.0 END
                          ELSE 0.0 END), 6) AS rbo,
                   round(CAST(sum(CASE WHEN ra IS NOT NULL
                                        AND rb IS NOT NULL
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / {float(k)!r}, 6) AS overlap,
                   CAST(sum(CASE WHEN ra IS NOT NULL
                                  AND rb IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_common,
                   count(*) AS n_total
            FROM j GROUP BY 1
    """


# shared CTE chain for the interleave oracles: the two synthetic
# rankings, their full-outer (query, doc) join with absent-rank
# sentinel 2^40, the md5 leader coin, and the closed-form balanced
# merge order (sort by min-rank, leader's doc first on ties) that the
# pytest suite proves equivalent to the sequential pointer algorithm
# team-draft recursive-CTE oracle building blocks (the repeated
# expressions are composed here so the SQL stays consistent):
# next unpicked doc per team, base turn (fewer-picks-first, md5 coin
# parity on ties), exhausted-side fallback, and the picked doc.
_TD_NXA = "list_filter(la.l, y -> NOT list_contains(s.picked, y))[1]"
_TD_NXB = "list_filter(lb.l, y -> NOT list_contains(s.picked, y))[1]"
_TD_T0 = (
    "CASE WHEN s.na < s.nb THEN 'A' WHEN s.nb < s.na THEN 'B' "
    "WHEN (('0x' || substr(md5(s.query_id::VARCHAR || '#' || "
    "s.rnd::VARCHAR || '#42'), 18, 15))::BIGINT % 2) = 0 "
    "THEN 'A' ELSE 'B' END"
)
_TD_TURN = (
    f"CASE WHEN ({_TD_T0}) = 'A' AND ({_TD_NXA}) IS NULL THEN 'B' "
    f"WHEN ({_TD_T0}) = 'B' AND ({_TD_NXB}) IS NULL THEN 'A' "
    f"ELSE ({_TD_T0}) END"
)
_TD_DOC = (
    f"CASE WHEN ({_TD_TURN}) = 'A' THEN ({_TD_NXA}) "
    f"ELSE ({_TD_NXB}) END"
)

_INTERLEAVE_BASE = """q AS (
              SELECT doc_id AS query_id FROM documents
              WHERE doc_id < 10),
            iidx AS (
              SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS i),
            qa AS (
              SELECT query_id,
                     (query_id * 31 + i * 7) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            qb AS (
              SELECT query_id,
                     (query_id * 31 + i * 11 + 3) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            j AS (
              SELECT COALESCE(a.query_id, b.query_id) AS query_id,
                     COALESCE(a.doc_id, b.doc_id) AS doc_id,
                     COALESCE(a.rn, 1099511627776) AS rank_a,
                     COALESCE(b.rn, 1099511627776) AS rank_b
              FROM qa a FULL OUTER JOIN qb b
                ON a.query_id = b.query_id
               AND a.doc_id = b.doc_id),
            coin AS (
              SELECT query_id,
                     ('0x' || substr(md5(CAST(query_id AS VARCHAR)
                                         || '#' || '42'), 18, 15)
                     )::BIGINT % 2 AS leads_b
              FROM q),
            ordd AS (
              SELECT j.query_id, j.doc_id, j.rank_a, j.rank_b,
                     least(j.rank_a, j.rank_b) AS m,
                     CASE WHEN (c.leads_b = 0 AND
                                j.rank_a = least(j.rank_a, j.rank_b))
                            OR (c.leads_b = 1 AND
                                j.rank_b = least(j.rank_a, j.rank_b))
                          THEN 0 ELSE 1 END AS pref
              FROM j JOIN coin c ON c.query_id = j.query_id),
            ranked AS (
              SELECT query_id, doc_id, rank_a, rank_b,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY m, pref, doc_id) AS INTEGER) AS pos
              FROM ordd)"""


def _hits_sql(n_iter: int) -> str:
    """Generated ``n_iter``-iteration HITS CTE chain over the
    pagerank oracle's synthetic link graph (whole block is
    regenerated on any edit — never spliced)."""
    ctes = [
        "nodes AS (SELECT doc_id AS node_id FROM documents"
        " WHERE doc_id < 200)",
        "srcd AS (SELECT doc_id FROM documents"
        " WHERE doc_id < 200 AND doc_id % 10 <> 9)",
        "edges AS ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % 200 AS dst FROM srcd"
        " UNION ALL "
        "SELECT doc_id AS src, (doc_id * 13 + 3) % 200 AS dst"
        " FROM srcd)",
        "h0 AS (SELECT node_id, CAST(1.0 AS DOUBLE) AS hub"
        " FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"a{i}r AS (SELECT e.dst AS node_id, sum(h.hub) AS v"
            f" FROM edges e JOIN h{i - 1} h ON h.node_id = e.src"
            " GROUP BY 1)"
        )
        ctes.append(
            f"a{i}n AS (SELECT sqrt(sum(v * v)) AS s FROM a{i}r)"
        )
        ctes.append(
            f"a{i} AS (SELECT n.node_id, CASE WHEN an.s > 0 THEN"
            " COALESCE(r.v, CAST(0 AS DOUBLE)) / an.s"
            " ELSE CAST(0 AS DOUBLE) END AS authority"
            f" FROM nodes n LEFT JOIN a{i}r r"
            " ON r.node_id = n.node_id"
            f" CROSS JOIN a{i}n an)"
        )
        ctes.append(
            f"h{i}r AS (SELECT e.src AS node_id,"
            " sum(a.authority) AS v"
            f" FROM edges e JOIN a{i} a ON a.node_id = e.dst"
            " GROUP BY 1)"
        )
        ctes.append(
            f"h{i}n AS (SELECT sqrt(sum(v * v)) AS s FROM h{i}r)"
        )
        ctes.append(
            f"h{i} AS (SELECT n.node_id, CASE WHEN hn.s > 0 THEN"
            " COALESCE(r.v, CAST(0 AS DOUBLE)) / hn.s"
            " ELSE CAST(0 AS DOUBLE) END AS hub"
            f" FROM nodes n LEFT JOIN h{i}r r"
            " ON r.node_id = n.node_id"
            f" CROSS JOIN h{i}n hn)"
        )
    return (
        "WITH "
        + ",\n            ".join(ctes)
        + "\n            SELECT a.node_id,"
        " round(a.authority, 6) AS authority,"
        " round(h.hub, 6) AS hub"
        + f" FROM a{n_iter} a JOIN h{n_iter} h"
        " ON h.node_id = a.node_id"
    )


def oracle_sql() -> dict[str, str]:
    from search_engine_spark.functions.analysis import (
        BPE_PATTERN,
        QUALITY_STOPWORDS,
    )
    from search_engine_spark.functions.lemmatizer import lemmatize

    lemma_cte = _lemma_map_cte()
    lemma_terms = [
        lemmatize(t, "english")
        for t in FLAGSHIP_LEMMA_QUERY.split()
        if lemmatize(t, "english")
    ]

    stopword_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    toks_list = (
        "list_filter(string_split_regex(trim(regexp_replace(lower(text), "
        r"'[^a-z\s]', ' ', 'g')), '\s+'), t -> t <> '')"
    )

    # --- PII oracle fragments, generated from the engine's own pattern
    # table so the two sides cannot drift ---
    from search_engine_spark.functions.pii import PII_PATTERNS

    pii_counts_sql = ",\n                   ".join(
        f"CAST(len(regexp_extract_all(itext, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    pii_total_sql = " + ".join(f"n_{name}" for name, _ in PII_PATTERNS)
    pii_redacted_sql = "itext"
    for name, pat in PII_PATTERNS:
        pii_redacted_sql = (
            f"regexp_replace({pii_redacted_sql}, '{pat}', "
            f"'<{name.upper()}>', 'g')"
        )

    return {
        "tokenize_doclen": f"""
            SELECT doc_id, len({toks_list}) AS doc_len FROM documents
        """,
        "postings": f"WITH {_TOKS} SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2",
        "term_stats": f"WITH {_TOKS}, {_POSTINGS} SELECT term, count(*) AS df FROM postings GROUP BY 1",
        "doc_stats": f"""
            WITH {_TOKS}, {_LENS}
            SELECT count(*) AS n_docs,
                   CAST(sum(doc_len) AS DOUBLE) / count(*) AS avg_len
            FROM lens
        """,
        "stoplist": f"WITH {_TOKS}, {_POSTINGS}, {_TSTATS} SELECT term FROM tstats ORDER BY df DESC, term ASC LIMIT {STOPLIST_SIZE}",
        "query_idf": f"""
            WITH {_TOKS}, {_POSTINGS}, {_TSTATS},
            nn AS (SELECT count(*) AS n FROM documents)
            SELECT term,
                   round(ln((nn.n - df + 0.5) / (df + 0.5)), 6) AS idf
            FROM tstats CROSS JOIN nn
            WHERE term IN ({", ".join(f"'{t}'" for t in FLAGSHIP_TERMS)})
        """,
        "bm25_topk": _bm25_sql(FLAGSHIP_TERMS, limit=10),
        "more_like_this_topk": _mlt_sql(MLT_SRC_DOC, n_terms=8, k=10),
        "impact_topk": _impact_topk_sql(FLAGSHIP_TERMS, bits=8,
                                        limit=10),
        "bm25_topk_pruned": _bm25_pruned_sql(FLAGSHIP_TERMS, keep=20,
                                             limit=10),
        "bm25_rescore_topk": _rescore_sql(FLAGSHIP_TERMS, bits=8,
                                          first_k=25, limit=10),
        "bm25_prf_topk": _prf_sql(
            FLAGSHIP_TERMS, fb_docs=10, fb_terms=3, beta=0.4,
            limit=10,
        ),
        "bm25_champion_topk": _champions_sql(
            FLAGSHIP_TERMS, m=5, limit=10
        ),
        "vsm_topk": f"""
            WITH {_TOKS},
            {_POSTINGS},
            dfs AS (SELECT term, count(*) AS df FROM postings
                    GROUP BY term),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n
                   FROM documents),
            q AS (SELECT * FROM (VALUES {", ".join(
                f"('{t}', 1)" for t in FLAGSHIP_TERMS
            )}) v(term, tfq)),
            wq AS (
              SELECT q.term,
                     (1 + ln(q.tfq))
                       * ln((SELECT n FROM nn) / dfs.df) AS w
              FROM q JOIN dfs USING (term) WHERE dfs.df > 0
            ),
            qn AS (SELECT sqrt(sum(w * w)) AS qn FROM wq),
            norms AS (
              SELECT doc_id, sqrt(sum(pow(1 + ln(tf), 2))) AS vn
              FROM postings GROUP BY doc_id
            ),
            sc AS (
              SELECT p.doc_id,
                     round(sum((1 + ln(p.tf)) * wq.w)
                           / (max(nm.vn) * (SELECT qn FROM qn)),
                           6) AS score
              FROM postings p
              JOIN wq USING (term)
              JOIN norms nm USING (doc_id)
              GROUP BY p.doc_id
            )
            SELECT doc_id, score, CAST(rn AS INTEGER) AS rn FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS rn
              FROM sc
            ) WHERE rn <= 10 ORDER BY rn
        """,
        # federation is EXACT: merged df/n_docs/avg_len equal the
        # monolithic build's, so the oracle is the same SQL
        "bm25_federated_topk": _bm25_sql(FLAGSHIP_TERMS, limit=10),
        "cori_shard_scores": _cori_sql(FLAGSHIP_TERMS),
        "redde_shard_scores": _redde_sql(FLAGSHIP_TERMS, n_csi=20),
        "taily_shard_scores": _taily_gamma_sql(
            TAILY_MULTI_QUERY.split(), TAILY_NC
        ),
        "taily_shard_scores_erlang": _taily_erlang_sql(
            TAILY_QUERY.split(), TAILY_SC
        ),
        "taily_erlang_multiterm": _taily_erlang_sql(
            TAILY_MULTI_QUERY.split(), TAILY_SC
        ),
        "snippets_topk": _snippets_sql(lemma_terms, lemma_cte),
        "snippets_multisentence": _snippets_sql(
            lemma_terms, lemma_cte, _snip_text_sql(SNIP3_SLICES),
            SNIP_FIXED_IDF,
        ),
        "snippets_assembly_cut": _snippets_sql(
            lemma_terms, lemma_cte, _snip_text_sql(SNIP5_SLICES),
            SNIP_FIXED_IDF,
        ),
        "snippets_fixed_idf": _snippets_sql(
            lemma_terms, lemma_cte, "d.text", SNIP_FIXED_IDF
        ),
        "tiered_merge_postings": f"""
            WITH {_TOKS}, {_POSTINGS}
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf
            FROM postings""",
        "incremental_postings": _INCR_POSTINGS_SQL,
        "incremental_positions": _INCR_POSITIONS_SQL,
        "time_travel_postings": _TIME_TRAVEL_POSTINGS_SQL,
        "incremental_vacuum_postings": _INCR_POSTINGS_SQL,
        "incremental_term_stats": _INCR_TSTATS_SQL,
        "bm25_not_topk": _bm25_sql(FLAGSHIP_TERMS, limit=10, exclude=["window"]),
        "bm25_collapsed_topk": _bm25_sql(
            FLAGSHIP_TERMS, limit=10, collapse_per_site=2
        ),
        "bm25_priors_topk": _bm25_sql(
            FLAGSHIP_TERMS, limit=10, prior_weight=0.3
        ),
        "bm25_fresh_topk": _bm25_sql(
            FLAGSHIP_TERMS, limit=10, prior_weight=0.3,
            prior_expr=(
                "pow(2.0, -CAST(doc_id % 400 AS DOUBLE) / 90.0)"
            ),
        ),
        "bm25_and_topk": _bm25_sql(FLAGSHIP_TERMS, limit=10, mode="all"),
        "bool_search": f"""
WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
nn AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(sum(doc_len) AS DOUBLE) / count(*) FROM lens) AS avg_len),
qt AS (
  SELECT ts.term, ts.df,
         ln((nn.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf
  FROM tstats ts CROSS JOIN nn
  WHERE ts.term IN ('dup', 'key')
    AND ts.term NOT IN (SELECT term FROM stop)
    AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0
),
mt AS (SELECT term FROM qt WHERE term IN ('key')),
cand AS (
  SELECT p.doc_id FROM postings p
  JOIN mt ON p.term = mt.term
  WHERE p.doc_id NOT IN
        (SELECT doc_id FROM postings WHERE term IN ('window'))
  GROUP BY p.doc_id
  HAVING count(*) = (SELECT count(*) FROM mt)
),
scored AS (
  SELECT c.doc_id,
         sum(qt.idf * (p.tf::DOUBLE / l.doc_len) * ({K1} + 1)
             / ((p.tf::DOUBLE / l.doc_len)
                + {K1} * (1 - {B} + {B} * l.doc_len / nn.avg_len))) AS score
  FROM cand c
  JOIN postings p ON p.doc_id = c.doc_id
  JOIN qt ON qt.term = p.term
  JOIN lens l ON l.doc_id = c.doc_id
  CROSS JOIN nn
  GROUP BY c.doc_id
),
ranked AS (
  SELECT doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rn
  FROM scored
)
SELECT doc_id, score, rn FROM ranked WHERE rn <= 10
""",
        "near_topk": _near_sql(slop=3, limit=10),
        "next_token_suggestions": _next_token_sql("key", k=10),
        "corpus_diff": _CORPUS_DIFF_SQL,
        "prefix_search": _prefix_sql(limit=10, max_expansions=50),
        "wildcard_search": _wildcard_sql(limit=10, max_expansions=50),
        "did_you_mean": _did_you_mean_sql("valu", "kay"),
        "explain_score": _explain_sql(FLAGSHIP_TERMS),
        "bm25_search_after": (
            "SELECT doc_id, score, CAST(rn - 5 AS INTEGER) AS rn "
            "FROM (" + _bm25_sql(FLAGSHIP_TERMS, offset=5, limit=5)
            + ") page2"
        ),
        "wildcard_terms": _wildcard_terms_sql(max_expansions=3),
        "collocations": _collocations_sql(min_count=5, limit=20),
        "bigram_logprob": _bigram_sql(alpha=0.1),
        "kneser_ney_logprob": _kneser_ney_sql(d=0.75),
        "ppl_buckets": _ppl_buckets_sql(d=0.75),
        "latest_snapshot": _LATEST_SNAPSHOT_SQL,
        "site_quality_stats": _site_quality_sql(
            toks_list, stopword_list
        ),
        "rank_eval": _rank_eval_sql(k=10),
        "bm25_tuning": _tune_sql(k=10),
        "bm25_synonyms_topk": _synonyms_sql(limit=10),
        "pl2_topk": _pl2_sql(FLAGSHIP_TERMS, c=1.0, limit=10),
        "sdm_topk": _sdm_sql(FLAGSHIP_TERMS, limit=10),
        "bm25_passage_topk": _passage_sql(FLAGSHIP_TERMS, window=50,
                                          limit=10),
        "bm25plus_topk": _bm25var_sql(FLAGSHIP_TERMS, "plus", 1.0,
                                      limit=10),
        "bm25l_topk": _bm25var_sql(FLAGSHIP_TERMS, "l", 0.5,
                                   limit=10),
        "qpp_predictors": _qpp_pre_sql(FLAGSHIP_TERMS),
        "query_clarity": _clarity_sql(FLAGSHIP_TERMS, k=10),
        "lm_dirichlet_topk": _lm_sql(FLAGSHIP_TERMS, mu=500.0, limit=10),
        "lm_jm_topk": _lm_jm_sql(FLAGSHIP_TERMS, lam=0.3, limit=10),
        "min_span_docs": _min_span_sql(*PROX_TERMS),
        "proximity_topk": _proximity_sql(
            sorted(SYNONYM_QUERY.split()), prox_weight=1.0,
            depth=50, limit=10,
        ),
        "bm25_site_restricted": _bm25_sql(
            FLAGSHIP_TERMS, sites=SITES_RESTRICTED, limit=10
        ),
        "bm25_pagination": _bm25_sql(FLAGSHIP_TERMS, offset=3, limit=5),
        "postings_lemma": f"""
            WITH {_TOKS}, {lemma_cte}, {_LPOSTINGS}
            SELECT term, doc_id, tf FROM postings
        """,
        "bm25_topk_lemma": _bm25_sql(
            lemma_terms, limit=10,
            postings_cte=_LPOSTINGS,
            extra_cte=lemma_cte + ", ",
        ),
        "percolate_rarest": _percolate_sql(PERCOLATE_QUERIES, "rarest"),
        "percolate_all": _percolate_sql(PERCOLATE_QUERIES, "all"),
        "canonical_urls": _canonical_urls_sql(),
        # WAND/compact path must equal the exact path — same oracles
        "boilerplate_lines": """
            WITH docs AS (
              SELECT doc_id, source AS site,
                     'body ' || doc_id || ' ' || substr(text, 1, 40)
                     || chr(10) || 'copyright ' || source
                     || CASE WHEN doc_id % 4 = 0
                             THEN chr(10) || 'Subscribe To Our Newsletter'
                             ELSE '' END AS text
              FROM documents),
            lines AS (
              SELECT doc_id, site,
                     unnest(string_split(text, chr(10))) AS line,
                     unnest(range(len(string_split(text, chr(10)))))
                       AS idx
              FROM docs),
            norm AS (
              SELECT *, lower(trim(line)) AS nline FROM lines),
            bad AS (
              SELECT site, nline
              FROM norm WHERE nline <> ''
              GROUP BY 1, 2
              HAVING count(DISTINCT doc_id) > 3),
            kept AS (
              SELECT n.doc_id, n.idx, n.line
              FROM norm n
              ANTI JOIN bad b
                ON n.site = b.site AND n.nline = b.nline),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY idx)
                       AS clean_text
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(r.clean_text, '') AS clean_text
            FROM docs d LEFT JOIN rebuilt r USING (doc_id)
        """,
        "dsir_resample": r"""
            WITH toks_arr AS (
              SELECT doc_id, lang, source,
                     list_filter(string_split_regex(
                       trim(regexp_replace(lower(text),
                                           '[^a-z\s]', ' ', 'g')),
                       '\s+'), t -> t <> '') AS toks
              FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(toks || list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM toks_arr),
            feats AS (
              SELECT doc_id,
                     ('0x' || substr(md5(g || 'sel-v1'), 18, 15))
                       ::BIGINT % 4096 AS bucket,
                     count(*) AS cnt
              FROM grams GROUP BY 1, 2),
            tgt AS (
              SELECT doc_id FROM documents
              WHERE lang = 'en' AND doc_id % 7 = 0),
            qc AS (SELECT bucket, sum(cnt) AS cq FROM feats
                   GROUP BY 1),
            pc AS (SELECT bucket, sum(cnt) AS cp FROM feats
                   JOIN tgt USING (doc_id) GROUP BY 1),
            tot AS (SELECT (SELECT sum(cq) FROM qc) AS tq,
                           (SELECT coalesce(sum(cp), 0) FROM pc)
                             AS tp),
            ratio AS (
              SELECT q.bucket,
                     ln((coalesce(p.cp, 0) + 1.0)
                        / (t.tp + 1.0 * 4096))
                     - ln((q.cq + 1.0) / (t.tq + 1.0 * 4096)) AS lr
              FROM qc q LEFT JOIN pc p USING (bucket)
              CROSS JOIN tot t),
            lw AS (
              SELECT f.doc_id, sum(f.cnt * r.lr) AS logw
              FROM feats f JOIN ratio r USING (bucket) GROUP BY 1),
            keyed AS (
              SELECT d.doc_id, d.lang, d.source,
                     l.logw - ln(-ln(
                       (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                            || 'sel-v1-gumbel'),
                                        18, 15))::BIGINT + 0.5)
                       / 1152921504606846976.0)) AS key
              FROM documents d JOIN lw l USING (doc_id))
            SELECT doc_id, lang, source FROM keyed
            ORDER BY key DESC, doc_id ASC LIMIT 50
        """,
        "novel_documents": r"""
            WITH nrm AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       regexp_replace(text, '\bdup\b', ' ', 'g'),
                       '\s+', ' ', 'g')) AS t
              FROM documents)
            SELECT doc_id FROM nrm n
            WHERE n.doc_id >= 250
              AND md5(n.t) NOT IN
                  (SELECT md5(t) FROM nrm WHERE doc_id < 250)
        """,
        "facet_counts": f"""
            WITH {_TOKS}, {_POSTINGS}, {_LENS}, {_TSTATS}, {_STOP},
            nn AS (SELECT (SELECT count(*) FROM documents) AS n),
            qt AS (
              SELECT ts.term, ts.df
              FROM tstats ts CROSS JOIN nn
              WHERE ts.term IN ({{term_list}})
                AND ts.term NOT IN (SELECT term FROM stop)
                AND (nn.n - ts.df + 0.5) / (ts.df + 0.5) > 0),
            rarest AS (SELECT term FROM qt ORDER BY df ASC, term ASC
                       LIMIT 1)
            SELECT l.site, count(*) AS hits
            FROM postings p
            JOIN rarest r ON p.term = r.term
            JOIN lens l ON l.doc_id = p.doc_id
            GROUP BY 1
        """.replace("{term_list}", ", ".join(f"'{t}'" for t in FLAGSHIP_TERMS)),
        "bm25_batch_compact": " UNION ALL ".join(
            f"SELECT {i} AS query_id, * FROM ({_bm25_sql(terms)})"
            for i, terms in enumerate(
                [FLAGSHIP_TERMS, ["window", "spark"],
                 ["sort", "query", "big"], ["hash", "table"]]
            )
        ),
        "bm25_batch": " UNION ALL ".join(
            f"SELECT {i} AS query_id, * FROM ({_bm25_sql(terms)})"
            for i, terms in enumerate(
                [FLAGSHIP_TERMS, ["window", "spark"],
                 ["sort", "query", "big"], ["hash", "table"]]
            )
        ),
        "ltr_features": " UNION ALL ".join(
            f"SELECT {i} AS query_id, * FROM ({_ltr_sql(terms, 10)})"
            for i, terms in enumerate(
                [FLAGSHIP_TERMS, ["window", "spark"],
                 ["sort", "query", "big"], ["hash", "table"]]
            )
        ),
        "ltr_linear_rerank": _LTR_LINEAR_SQL,
        "bm25_wand_topk": _bm25_sql(FLAGSHIP_TERMS, limit=10),
        # the no-Spark serving fast path under the same oracle — the
        # driver-local pyarrow+numpy scorer must reproduce the SQL
        # BM25 exactly (plans/local_serve.py)
        "bm25_topk_local": _bm25_sql(FLAGSHIP_TERMS, limit=10),
        "bm25_maxscore_topk": _bm25_sql(
            FLAGSHIP_TERMS, limit=10, mode="union"
        ),
        "bm25_wand_pagination": _bm25_sql(
            FLAGSHIP_TERMS, offset=3, limit=5
        ),
        "site_statistics": f"""
            WITH {_TOKS}, {_POSTINGS},
            ps AS (
              SELECT d.source AS site, p.term
              FROM postings p JOIN documents d USING (doc_id)
            ),
            pages AS (
              SELECT source AS site, count(*) AS pages
              FROM documents GROUP BY 1
            ),
            lemmas AS (
              SELECT site, count(DISTINCT term) AS lemmas
              FROM ps GROUP BY 1
            )
            SELECT p.site, p.pages, coalesce(l.lemmas, 0) AS lemmas
            FROM pages p LEFT JOIN lemmas l USING (site)
            ORDER BY p.pages DESC, p.site ASC
        """,
        "embedding_near_dup": """
            WITH e AS (SELECT vec_id,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        """,
        "embedding_near_dup_lsh_md5": """
            WITH planes AS (
              SELECT t.range AS t, i.range AS i, d.range AS d,
                     ((('0x' || substr(md5(
                         t.range::VARCHAR || '#' || i.range::VARCHAR
                         || '#' || d.range::VARCHAR), 18, 15))::BIGINT
                       % 2001) - 1000) / 1000.0 AS val
              FROM range(6) t, range(8) i, range(64) d
            ),
            vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
            dots AS (
              SELECT vecs.vec_id, p.t, p.i,
                     sum(vecs.v[p.d + 1] * p.val) AS dot
              FROM vecs, planes p
              GROUP BY vecs.vec_id, p.t, p.i
            ),
            buckets AS (
              SELECT vec_id, t,
                     sum(CASE WHEN dot > 0 THEN 1 << i ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id, t
            ),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM buckets a JOIN buckets b
                ON b.t = a.t AND b.bucket = a.bucket
              WHERE a.vec_id < b.vec_id
            ),
            scored AS (
              SELECT c.id_a, c.id_b,
                     round(list_cosine_similarity(va.v, vb.v), 6)
                       AS sim
              FROM cand c
              JOIN vecs va ON va.vec_id = c.id_a
              JOIN vecs vb ON vb.vec_id = c.id_b
            )
            SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.4
        """,
        "dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "dedup_exact_normalized": r"""
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       regexp_replace(text, '\bdup\b', ' ', 'g'),
                       '\s+', ' ', 'g')) AS ntext
              FROM documents)
            SELECT md5(ntext) AS fp, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM norm GROUP BY 1 HAVING count(*) > 1
        """,
        "ngram_jaccard_pairs": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS shingle
              FROM lt, unnest(range(1, len(tokens) - 1)) AS r(i)
              WHERE len(tokens) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
                               AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(i::DOUBLE / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.5
        """,
        "ngram_containment_pairs": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS shingle
              FROM lt, unnest(range(1, len(tokens) - 1)) AS r(i)
              WHERE len(tokens) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
                               AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            dirs AS (
              SELECT id_a AS id_src, id_b AS id_dst,
                     i::DOUBLE / sa.n_sh AS c
              FROM inter JOIN sizes sa ON sa.doc_id = id_a
              UNION ALL
              SELECT id_b AS id_src, id_a AS id_dst,
                     i::DOUBLE / sb.n_sh AS c
              FROM inter JOIN sizes sb ON sb.doc_id = id_b
            )
            SELECT id_src, id_dst, round(c, 6) AS containment
            FROM dirs WHERE c >= 0.5
        """,
        "minhash_pairs_md5": _minhash_md5_sql(
            toks_list, k=16, bands=4, threshold=0.5
        ),
        "simhash_md5": f"""
            WITH {_simhash_md5_ctes(toks_list)}
            SELECT doc_id, simhash FROM sig
        """,
        "cms_counts_md5": _cms_md5_sql(
            toks_list, FLAGSHIP_TERMS + ["zzz_absent"]
        ),
        "hll_registers_md5": f"""
            WITH {_hll_md5_ctes(lg_k=8)}
            SELECT lang, bucket, rho FROM reg
        """,
        "hll_estimate_md5": _hll_md5_estimate_sql(lg_k=8),
        "quantile_cells_md5": f"""
            WITH {_qsk_cells_cte()}
            SELECT lvl, row, col, cnt FROM qcells""",
        "quantile_ranks_md5": _qsk_ranks_sql(QSK_PROBES),
        "bloom_bits_md5": f"""
            WITH {_bloom_md5_ctes()}
            SELECT bit FROM bits""",
        "bloom_contains_md5": _bloom_contains_sql(),
        "simhash_pairs_md5": _simhash_md5_pairs_sql(
            toks_list, bands=4, max_hamming=3
        ),
        "winnow_fingerprints": f"""
            WITH {_winnow_fp_ctes(toks_list, k=5, w=4)}
            SELECT doc_id, pos, h FROM fp
        """,
        "winnow_reuse_pairs": f"""
            WITH {_winnow_fp_ctes(toks_list, k=5, w=4)},
            fph AS (SELECT DISTINCT doc_id, h FROM fp)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*) AS shared
            FROM fph a JOIN fph b ON a.h = b.h
                              AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "ann_cosine_lsh_md5": """
            WITH planes AS (
              SELECT t.range AS t, i.range AS i, d.range AS d,
                     ((('0x' || substr(md5(
                         t.range::VARCHAR || '#' || i.range::VARCHAR
                         || '#' || d.range::VARCHAR), 18, 15))::BIGINT
                       % 2001) - 1000) / 1000.0 AS val
              FROM range(4) t, range(6) i, range(64) d
            ),
            vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
            dots AS (
              SELECT vecs.vec_id, p.t, p.i,
                     sum(vecs.v[p.d + 1] * p.val) AS dot
              FROM vecs, planes p
              GROUP BY vecs.vec_id, p.t, p.i
            ),
            buckets AS (
              SELECT vec_id, t,
                     sum(CASE WHEN dot > 0 THEN 1 << i ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id, t
            ),
            qb AS (SELECT * FROM buckets WHERE vec_id < 3),
            cand AS (
              SELECT DISTINCT qb.vec_id AS query_id,
                              cb.vec_id AS neighbor_id
              FROM qb JOIN buckets cb
                ON cb.t = qb.t AND cb.bucket = qb.bucket
              WHERE cb.vec_id <> qb.vec_id
            ),
            scored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(list_cosine_similarity(q.v, n.v), 6) AS sim
              FROM cand c
              JOIN vecs q ON q.vec_id = c.query_id
              JOIN vecs n ON n.vec_id = c.neighbor_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS INTEGER)
                       AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_cosine_ivfpq_md5": """
            WITH cents0 AS (
              SELECT l.range AS l, d.range AS d,
                     ((('0x' || substr(md5(
                         'ivf#' || l.range::VARCHAR || '#'
                         || d.range::VARCHAR), 18, 15))::BIGINT
                       % 2001) - 1000) / 1000.0 AS g
              FROM range(16) l, range(64) d
            ),
            cnorm AS (
              SELECT l, sqrt(sum(g * g)) AS nm FROM cents0 GROUP BY l
            ),
            cents AS (
              SELECT c.l, c.d, c.g / n.nm AS val
              FROM cents0 c JOIN cnorm n USING (l)
            ),
            vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
            vnorm AS (
              SELECT vec_id,
                     sqrt(list_sum(list_transform(v, x -> x * x)))
                       AS nm
              FROM vecs
            ),
            assign_dots AS (
              SELECT vecs.vec_id, c.l,
                     sum(vecs.v[c.d + 1] * c.val) AS dot
              FROM vecs, cents c GROUP BY vecs.vec_id, c.l
            ),
            assign AS (
              SELECT vec_id, l AS ivf_list FROM (
                SELECT vec_id, l, row_number() OVER (
                  PARTITION BY vec_id ORDER BY dot DESC, l ASC) AS rn
                FROM assign_dots) WHERE rn = 1
            ),
            books AS (
              SELECT j.range AS j, c.range AS c, d.range AS d,
                     ((('0x' || substr(md5(
                         'pq#' || j.range::VARCHAR || '#'
                         || c.range::VARCHAR || '#'
                         || d.range::VARCHAR), 18, 15))::BIGINT
                       % 2001) - 1000) / 4000.0 AS val
              FROM range(8) j, range(64) c, range(8) d
            ),
            bnorm2 AS (
              SELECT j, c, sum(val * val) AS c2
              FROM books GROUP BY j, c
            ),
            enc_dots AS (
              SELECT v.vec_id, b.j, b.c,
                     sum((v.v[b.j * 8 + b.d + 1] / vn.nm) * b.val)
                       AS dot
              FROM vecs v
              JOIN vnorm vn ON vn.vec_id = v.vec_id
              CROSS JOIN books b
              GROUP BY v.vec_id, b.j, b.c
            ),
            enc_d2 AS (
              SELECT e.vec_id, e.j, e.c,
                     -2.0 * e.dot + n2.c2 AS d2
              FROM enc_dots e
              JOIN bnorm2 n2 ON n2.j = e.j AND n2.c = e.c
            ),
            codes AS (
              SELECT vec_id, j, c AS code FROM (
                SELECT vec_id, j, c, row_number() OVER (
                  PARTITION BY vec_id, j
                  ORDER BY d2 ASC, c ASC) AS rn
                FROM enc_d2) WHERE rn = 1
            ),
            qs AS (SELECT vec_id AS query_id, v AS qv
                   FROM vecs WHERE vec_id < 3),
            probe_dots AS (
              SELECT q.query_id, c.l,
                     sum(q.qv[c.d + 1] * c.val) AS dot
              FROM qs q, cents c GROUP BY q.query_id, c.l
            ),
            probes AS (
              SELECT query_id, l AS ivf_list FROM (
                SELECT query_id, l, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY dot DESC, l ASC) AS rn
                FROM probe_dots) WHERE rn <= 8
            ),
            cand AS (
              SELECT p.query_id, a.vec_id AS neighbor_id
              FROM probes p JOIN assign a ON a.ivf_list = p.ivf_list
              WHERE a.vec_id <> p.query_id
            ),
            adc AS (
              SELECT cd.query_id, cd.neighbor_id,
                     sum(b.val
                         * (q.qv[b.j * 8 + b.d + 1] / qn.nm)) AS adc
              FROM cand cd
              JOIN codes co ON co.vec_id = cd.neighbor_id
              JOIN books b ON b.j = co.j AND b.c = co.code
              JOIN qs q ON q.query_id = cd.query_id
              JOIN vnorm qn ON qn.vec_id = cd.query_id
              GROUP BY cd.query_id, cd.neighbor_id
            ),
            shortlist AS (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY adc DESC, neighbor_id ASC) AS rn
                FROM adc) WHERE rn <= 20
            ),
            exact AS (
              SELECT s.query_id, s.neighbor_id,
                     round(list_cosine_similarity(q.qv, n.v), 6)
                       AS sim
              FROM shortlist s
              JOIN qs q ON q.query_id = s.query_id
              JOIN vecs n ON n.vec_id = s.neighbor_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS INTEGER)
                       AS rank
              FROM exact
            )
            SELECT query_id, neighbor_id, sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_cosine_topk": """
            WITH qs AS (SELECT vec_id AS query_id,
                               CAST(embedding AS DOUBLE[]) AS qvec
                        FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(
                       q.qvec, CAST(e.embedding AS DOUBLE[])), 6)
                       AS sim
              FROM embeddings e CROSS JOIN qs q
              WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS INTEGER)
                       AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "hybrid_rrf": f"""
            WITH lex AS ({_bm25_sql(FLAGSHIP_TERMS, limit=50)}),
            vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec
                   FROM embeddings WHERE vec_id = 0),
            vscored AS (
              SELECT e.vec_id AS doc_id,
                     round(list_cosine_similarity(
                       vq.qvec, CAST(e.embedding AS DOUBLE[])), 6)
                       AS sim
              FROM embeddings e CROSS JOIN vq
              WHERE e.vec_id <> 0
            ),
            vec AS (
              SELECT doc_id,
                     CAST(row_number() OVER (
                       ORDER BY sim DESC, doc_id ASC) AS INTEGER) AS rn
              FROM vscored
              QUALIFY rn <= 50
            ),
            contrib AS (
              SELECT doc_id,
                     CAST(1.0 AS DOUBLE) / (60.0 + rn) AS c FROM lex
              UNION ALL
              SELECT doc_id,
                     CAST(1.0 AS DOUBLE) / (60.0 + rn) AS c FROM vec
            ),
            fused AS (
              SELECT doc_id, round(sum(c), 6) AS rrf_score
              FROM contrib GROUP BY 1
            )
            SELECT doc_id, rrf_score,
                   CAST(row_number() OVER (
                     ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER)
                     AS rank
            FROM fused
            QUALIFY rank <= 10
        """,
        "mmr_diversify": _mmr_sql(k=10, lam=0.7, pool=50),
        "kmeans_clusters": f"""
            WITH {_kmeans_ctes(k=4, iters=2, dim=64)}
            SELECT id AS vec_id, cluster FROM af ORDER BY vec_id
        """,
        "semantic_dedup": f"""
            WITH {_kmeans_ctes(k=4, iters=2, dim=64)},
            dups AS MATERIALIZED (
              SELECT DISTINCT b.id
              FROM af a JOIN af b
                ON a.cluster = b.cluster AND a.id < b.id
              WHERE round(list_dot_product(a.u, b.u), 6) >= 0.4
            )
            SELECT af.id AS vec_id, af.cluster
            FROM af LEFT JOIN dups ON af.id = dups.id
            WHERE dups.id IS NULL
            ORDER BY vec_id
        """,
        "cluster_top_terms": f"""
            WITH {_kmeans_ctes(k=4, iters=2, dim=64)},
            {_TOKS},
            ctf AS MATERIALIZED (
              SELECT af.cluster, t.term, count(*) AS tf
              FROM toks t JOIN af ON af.id = t.doc_id
              GROUP BY af.cluster, t.term
            ),
            tot AS (
              SELECT CAST(sum(tf) AS DOUBLE)
                     / count(DISTINCT cluster) AS a
              FROM ctf
            ),
            ft AS (SELECT term, sum(tf) AS ft FROM ctf GROUP BY term),
            w AS (
              SELECT ctf.cluster, ctf.term,
                     round(ctf.tf * ln(1 + (SELECT a FROM tot)
                                           / ft.ft), 6) AS ctfidf
              FROM ctf JOIN ft USING (term)
            )
            SELECT cluster, term, ctfidf, CAST(rn AS INTEGER) AS rn
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY cluster
                ORDER BY ctfidf DESC, term ASC) AS rn
              FROM w
            ) WHERE rn <= 5
        """,
        "text_quality": f"""
            WITH lt AS (
              SELECT doc_id, text, {toks_list} AS tokens FROM documents
            )
            SELECT doc_id,
              len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t <> '')) AS n_ws_tokens,
              len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
                AS n_bpe_tokens,
              round(CASE WHEN length(lower(text)) > 0
                    THEN length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                         / length(lower(text))
                    ELSE 0.0 END, 6) AS alpha_ratio,
              round(CASE WHEN len(tokens) > 0
                    THEN len(list_filter(tokens,
                         t -> t IN ({stopword_list})))::DOUBLE / len(tokens)
                    ELSE 0.0 END, 6) AS stop_ratio,
              round(
                0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
                + 0.3 * (CASE WHEN length(lower(text)) > 0
                    THEN length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                         / length(lower(text)) ELSE 0.0 END)
                + 0.3 * (1.0 - abs((CASE WHEN len(tokens) > 0
                    THEN len(list_filter(tokens,
                         t -> t IN ({stopword_list})))::DOUBLE / len(tokens)
                    ELSE 0.0 END) - 0.15) / 0.85), 6) AS quality
            FROM lt
        """,
        "lang_id": """
            SELECT doc_id,
              CASE
                WHEN length(regexp_replace(lower(text), '[^a-z]', '', 'g')) = 0
                 AND length(regexp_replace(lower(text), '[^а-яё]', '', 'g')) = 0
                THEN 'unknown'
                WHEN length(regexp_replace(lower(text), '[^а-яё]', '', 'g'))
                   > length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                THEN 'ru' ELSE 'en' END AS lang_guess
            FROM documents
        """,
        "fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        # the chained-pair CC's fixpoint == per-fingerprint min
        "dedup_clusters": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text))
                     AS cluster_id
            FROM documents
        """,
        "dedup_keep_longest": r"""
            WITH norm AS (
              SELECT doc_id, source, n_chars,
                     trim(regexp_replace(
                       regexp_replace(text, '\bdup\b', ' ', 'g'),
                       '\s+', ' ', 'g')) AS ntext
              FROM documents),
            ranked AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY md5(ntext)
                       ORDER BY n_chars DESC, doc_id) AS rn
              FROM norm)
            SELECT doc_id, source FROM ranked WHERE rn = 1
        """,
        # composed curation plan: annotate → en/quality/length gates →
        # exact dedup keep-min-id (plans/pipeline.py defaults)
        "training_pipeline": f"""
            WITH nrm AS (
              SELECT doc_id, lang, source, n_chars,
                     trim(regexp_replace(
                       regexp_replace(text, '\\bdup\\b', ' ', 'g'),
                       '\\s+', ' ', 'g')) AS text
              FROM documents),
            lt AS (
              SELECT doc_id, text, lang, source, n_chars,
                     {{toks}} AS tokens
              FROM nrm),
            ann AS (
              SELECT doc_id, text, lang, source, n_chars,
                     len(tokens) AS n_tokens,
                     CASE
                       WHEN length(regexp_replace(lower(text),
                              '[^a-z]', '', 'g')) = 0
                        AND length(regexp_replace(lower(text),
                              '[^а-яё]', '', 'g')) = 0 THEN 'unknown'
                       WHEN length(regexp_replace(lower(text),
                              '[^а-яё]', '', 'g'))
                          > length(regexp_replace(lower(text),
                              '[^a-z]', '', 'g'))
                       THEN 'ru' ELSE 'en' END AS lang_guess,
                     round(
                       0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
                       + 0.3 * (CASE WHEN length(lower(text)) > 0
                           THEN length(regexp_replace(lower(text),
                                '[^a-z]', '', 'g'))::DOUBLE
                                / length(lower(text))
                           ELSE 0.0 END)
                       + 0.3 * (1.0 - abs((CASE WHEN len(tokens) > 0
                           THEN len(list_filter(tokens,
                                t -> t IN ({{stops}})))::DOUBLE
                                / len(tokens)
                           ELSE 0.0 END) - 0.15) / 0.85), 6)
                       AS quality,
                     md5(text) AS fp
              FROM lt),
            gated AS (
              SELECT * FROM ann
              WHERE lang_guess IN ('en') AND quality >= 0.6
                AND n_tokens >= 25),
            win AS (
              SELECT min(doc_id) AS doc_id FROM gated GROUP BY fp)
            SELECT doc_id, text, lang, source, n_chars,
                   n_tokens, lang_guess, quality
            FROM gated WHERE doc_id IN (SELECT doc_id FROM win)
        """.replace("{toks}", toks_list).replace(
            "{stops}", stopword_list
        ),
        # full composition: + Gopher repetition gate + split column
        "training_pipeline_curated": f"""
            WITH nrm AS (
              SELECT doc_id, lang, source, n_chars,
                     trim(regexp_replace(
                       regexp_replace(text, '\\bdup\\b', ' ', 'g'),
                       '\\s+', ' ', 'g')) AS text
              FROM documents),
            lt AS (
              SELECT doc_id, text, lang, source, n_chars,
                     {{toks}} AS tokens
              FROM nrm),
            ann AS (
              SELECT doc_id, text, lang, source, n_chars, tokens,
                     len(tokens) AS n_tokens,
                     CASE
                       WHEN length(regexp_replace(lower(text),
                              '[^a-z]', '', 'g')) = 0
                        AND length(regexp_replace(lower(text),
                              '[^а-яё]', '', 'g')) = 0 THEN 'unknown'
                       WHEN length(regexp_replace(lower(text),
                              '[^а-яё]', '', 'g'))
                          > length(regexp_replace(lower(text),
                              '[^a-z]', '', 'g'))
                       THEN 'ru' ELSE 'en' END AS lang_guess,
                     round(
                       0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
                       + 0.3 * (CASE WHEN length(lower(text)) > 0
                           THEN length(regexp_replace(lower(text),
                                '[^a-z]', '', 'g'))::DOUBLE
                                / length(lower(text))
                           ELSE 0.0 END)
                       + 0.3 * (1.0 - abs((CASE WHEN len(tokens) > 0
                           THEN len(list_filter(tokens,
                                t -> t IN ({{stops}})))::DOUBLE
                                / len(tokens)
                           ELSE 0.0 END) - 0.15) / 0.85), 6)
                       AS quality,
                     md5(text) AS fp
              FROM lt),
            gated AS (
              SELECT * FROM ann
              WHERE lang_guess IN ('en') AND quality >= 0.6
                AND n_tokens >= 25),
            base AS (
              SELECT doc_id, lower(text) AS low, tokens AS toklist
              FROM gated),
            {_gopher_core_sql(stopword_list)},
            gkeep AS (
              SELECT doc_id FROM m WHERE {_gopher_keep_cond()}),
            gated2 AS (
              SELECT * FROM gated
              WHERE doc_id IN (SELECT doc_id FROM gkeep)),
            win AS (
              SELECT min(doc_id) AS doc_id FROM gated2 GROUP BY fp)
            SELECT doc_id, text, lang, source, n_chars,
                   n_tokens, lang_guess, quality,
                   CASE WHEN b < 8000 THEN 'train'
                        WHEN b < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT *,
                     ('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR) || 'v1'),
                        18, 15))::BIGINT % 10000 AS b
              FROM gated2
              WHERE doc_id IN (SELECT doc_id FROM win))
        """.replace("{toks}", toks_list).replace(
            "{stops}", stopword_list
        ),
        "pii_scan": f"""
            WITH inj AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 2 = 0 THEN ' mail user'
                          || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END
                     || CASE WHEN doc_id % 3 = 0 THEN ' ip 10.'
                          || CAST(doc_id % 256 AS VARCHAR) || '.'
                          || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'
                          || CAST(doc_id % 100 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN ' ssn '
                          || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                          || CAST(10 + doc_id % 90 AS VARCHAR) || '-'
                          || CAST(1000 + doc_id % 9000 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' call +1 555 '
                          || CAST(1000 + (doc_id * 13) % 9000 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                        THEN ' card 4111 1111 1111 '
                          || CAST(1000 + (doc_id * 17) % 9000 AS VARCHAR)
                        ELSE '' END AS itext
              FROM documents),
            counted AS (
              SELECT doc_id, itext,
                   {pii_counts_sql}
              FROM inj)
            SELECT doc_id, n_email, n_ipv4, n_ssn, n_credit_card,
                   n_phone,
                   CAST({pii_total_sql} AS BIGINT) AS n_pii,
                   {pii_redacted_sql} AS redacted
            FROM counted
        """,
        "sample_per_group": """
            WITH b AS (
              SELECT doc_id, source,
                     ('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR) || 'v1'),
                        18, 15))::BIGINT % 10000 AS bk
              FROM documents),
            r AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source ORDER BY bk, doc_id) AS rn
              FROM b)
            SELECT doc_id, source FROM r WHERE rn <= 5
        """,
        "robots_filter": f"""
            WITH docs AS (
              SELECT doc_id,
                     'site' || CAST(doc_id % 20 AS VARCHAR)
                       || '.example' AS site,
                     '/p' || CAST(doc_id AS VARCHAR) AS path
              FROM documents),
            body AS (
              SELECT DISTINCT site,
                     '{ROBOTS_BODY}' AS txt
              FROM docs),
            lines0 AS (
              SELECT site,
                     unnest(string_split(txt, chr(10))) AS raw,
                     unnest(range(len(string_split(txt, chr(10)))))
                       AS ln
              FROM body),
            lines1 AS (
              SELECT site, ln,
                     trim(regexp_replace(raw, '#.*', '')) AS line
              FROM lines0),
            lns AS (
              SELECT site, ln,
                     lower(regexp_extract(line,
                       '^([A-Za-z-]+)\\s*:', 1)) AS key,
                     trim(regexp_extract(line,
                       '^[A-Za-z-]+\\s*:\\s*(.*)$', 1)) AS value
              FROM lines1
              WHERE lower(regexp_extract(line,
                      '^([A-Za-z-]+)\\s*:', 1))
                    IN ('user-agent', 'allow', 'disallow')),
            g0 AS (
              SELECT site, ln, key, value,
                     CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END
                       AS ua,
                     coalesce(lag(CASE WHEN key = 'user-agent'
                                       THEN 1 ELSE 0 END)
                       OVER (PARTITION BY site ORDER BY ln), 0)
                       AS prev_ua
              FROM lns),
            g AS (
              SELECT site, ln, key, value, ua,
                     sum(CASE WHEN ua = 1 AND prev_ua = 0
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY site ORDER BY ln
                             ROWS UNBOUNDED PRECEDING) AS gid
              FROM g0),
            agents AS (
              SELECT DISTINCT site, gid, lower(value) AS agent
              FROM g WHERE key = 'user-agent'),
            matching AS (
              SELECT * FROM agents
              WHERE agent IN ('crawler', '*')),
            best AS (
              SELECT site,
                     max(CASE WHEN agent = 'crawler' THEN 1 ELSE 0
                         END) AS has_exact
              FROM matching GROUP BY 1),
            applicable AS (
              SELECT DISTINCT m.site, m.gid
              FROM matching m JOIN best b USING (site)
              WHERE m.agent = 'crawler'
                 OR (b.has_exact = 0 AND m.agent = '*')),
            rules AS (
              SELECT DISTINCT g.site, (key = 'allow') AS allow,
                              value AS path
              FROM g JOIN applicable a
                ON g.site = a.site AND g.gid = a.gid
              WHERE key IN ('allow', 'disallow') AND value <> ''),
            pat AS (
              SELECT site, allow, path, len(path) AS plen,
                     '^' || replace(
                       regexp_replace(
                         regexp_replace(path, '\\$$', ''),
                         '([.^$+?(){{}}\\[\\]|\\\\])', '\\\\\\1',
                         'g'),
                       '*', '.*')
                     || CASE WHEN path LIKE '%$' THEN '$' ELSE ''
                        END AS pattern
              FROM rules),
            hits AS (
              SELECT d.doc_id, p.allow,
                     row_number() OVER (
                       PARTITION BY d.doc_id
                       ORDER BY p.plen DESC,
                                CAST(p.allow AS INT) DESC) AS rr
              FROM docs d JOIN pat p ON p.site = d.site
              WHERE regexp_matches(d.path, p.pattern))
            SELECT d.doc_id,
                   coalesce(h.allow, TRUE) AS crawl_allowed
            FROM docs d
            LEFT JOIN (SELECT doc_id, allow FROM hits WHERE rr = 1) h
              USING (doc_id)
        """,
        "sitemap_entries": """
            WITH sites AS (
              SELECT DISTINCT
                     'site' || CAST(doc_id % 20 AS VARCHAR)
                       || '.example' AS site
              FROM documents),
            sm AS (
              SELECT site,
                     '<urlset><url><loc>https://' || site
                     || '/p1</loc><lastmod>2024-03-05</lastmod>'
                     || '<priority>0.8</priority></url>'
                     || '<url><loc> https://' || site
                     || '/p2 </loc><changefreq>daily</changefreq></url>'
                     || '<url><lastmod>2024-01-01</lastmod></url>'
                     || '</urlset>' AS xml
              FROM sites),
            blocks AS (
              SELECT site,
                     unnest(regexp_extract_all(
                       xml, '(?s)<url>(.*?)</url>', 1)) AS b
              FROM sm),
            f AS (
              SELECT site,
                     regexp_extract(b,
                       '(?s)<loc>\\s*([^<\\s][^<]*?)\\s*</loc>', 1)
                       AS url0,
                     regexp_extract(b,
                       '(?s)<lastmod>\\s*([^<\\s][^<]*?)\\s*</lastmod>',
                       1) AS lastmod0,
                     regexp_extract(b,
                       '(?s)<changefreq>\\s*([^<\\s][^<]*?)\\s*</changefreq>',
                       1) AS changefreq0,
                     regexp_extract(b,
                       '(?s)<priority>\\s*([^<\\s][^<]*?)\\s*</priority>',
                       1) AS priority0
              FROM blocks)
            SELECT site,
                   url0 AS url,
                   CASE WHEN lastmod0 <> '' THEN lastmod0 END
                     AS lastmod,
                   CASE WHEN changefreq0 <> '' THEN changefreq0 END
                     AS changefreq,
                   CASE WHEN priority0 <> ''
                        THEN CAST(priority0 AS DOUBLE) END AS priority
            FROM f WHERE url0 <> ''
        """,
        "filter_urls": """
            WITH u AS (
              SELECT doc_id,
                     'https://site' || CAST(doc_id % 20 AS VARCHAR)
                       || '.example/p' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            h AS (SELECT doc_id, url,
                         regexp_extract(url, '^https?://([^/]+)', 1)
                           AS host
                  FROM u)
            SELECT doc_id, url FROM h
            WHERE NOT (host = 'site3.example'
                       OR host LIKE '%.site3.example'
                       OR host = 'site7.example'
                       OR host LIKE '%.site7.example')
              AND NOT regexp_matches(url, '.*0$')
        """,
        "chunk_documents": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            d AS (SELECT doc_id, tokens, len(tokens) AS n FROM lt),
            nc AS (SELECT doc_id, tokens, n,
                          CASE WHEN n <= 0 THEN 0
                               ELSE (greatest(n - 64, 0) + 47) // 48 + 1
                          END AS n_chunks
                   FROM d),
            ch AS (
              SELECT doc_id,
                     CAST(i AS INTEGER) AS chunk_idx,
                     tokens[i * 48 + 1 : i * 48 + 64] AS chunk
              FROM nc, unnest(range(0, n_chunks)) AS r(i))
            SELECT doc_id, chunk_idx,
                   md5(array_to_string(chunk, ' ')) AS chunk_fp,
                   CAST(len(chunk) AS BIGINT) AS n_tokens
            FROM ch
        """,
        "bpe_merges": f"""
            WITH RECURSIVE lt AS (
              SELECT {toks_list} AS tokens FROM documents),
            wc AS (
              SELECT t.word, count(*) AS cnt
              FROM (SELECT unnest(tokens) AS word FROM lt) t
              WHERE length(t.word) > 0 GROUP BY t.word),
            base AS (
              SELECT word, cnt, CAST(i AS INTEGER) AS pos,
                     CASE WHEN i <= length(word) THEN word[i]
                          ELSE chr(9601) END AS sym
              FROM wc, unnest(range(1, length(word) + 2)) r(i)),
            step AS (
              SELECT 0 AS stp, word, cnt, pos, sym,
                     CAST(NULL AS VARCHAR) AS ma,
                     CAST(NULL AS VARCHAR) AS mb, 0 AS is_merge
              FROM base
              UNION ALL
              (
              WITH cur AS (SELECT * FROM step),
              best AS (
                SELECT a, b FROM (
                  SELECT s1.sym AS a, s2.sym AS b,
                         sum(s1.cnt) AS pc
                  FROM cur s1 JOIN cur s2
                    ON s2.word = s1.word AND s2.pos = s1.pos + 1
                   AND s1.is_merge = 0 AND s2.is_merge = 0
                  GROUP BY 1, 2)
                WHERE pc >= 2
                ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
              matches AS (
                SELECT s1.word, s1.pos
                FROM cur s1 JOIN cur s2
                  ON s2.word = s1.word AND s2.pos = s1.pos + 1
                JOIN best ON s1.sym = best.a AND s2.sym = best.b
                WHERE s1.is_merge = 0 AND s2.is_merge = 0),
              kept AS (
                SELECT word, pos FROM (
                  SELECT word, pos, row_number() OVER (
                    PARTITION BY word, pos - rn ORDER BY pos) AS k
                  FROM (SELECT word, pos, row_number() OVER (
                          PARTITION BY word ORDER BY pos) AS rn
                        FROM matches))
                WHERE k % 2 = 1),
              newrows AS (
                SELECT c.word, c.cnt, row_number() OVER (
                         PARTITION BY c.word ORDER BY c.pos) AS pos,
                       CASE WHEN kp.pos IS NOT NULL
                            THEN best.a || best.b
                            ELSE c.sym END AS sym
                FROM cur c
                CROSS JOIN best
                LEFT JOIN kept kp
                  ON kp.word = c.word AND kp.pos = c.pos
                LEFT JOIN kept kc
                  ON kc.word = c.word AND kc.pos = c.pos - 1
                WHERE c.is_merge = 0 AND kc.pos IS NULL)
              SELECT s.stp + 1, n.word, n.cnt,
                     CAST(n.pos AS INTEGER), n.sym,
                     best.a, best.b, 0
              FROM (SELECT DISTINCT stp FROM cur) s, newrows n, best
              WHERE s.stp < 15
              UNION ALL
              SELECT s.stp + 1, NULL, NULL, NULL, NULL,
                     best.a, best.b, 1
              FROM (SELECT DISTINCT stp FROM cur) s, best
              WHERE s.stp < 16
              )
            )
            SELECT CAST(stp - 1 AS INTEGER) AS rank, ma AS a, mb AS b
            FROM step WHERE is_merge = 1 ORDER BY stp
        """,
        "pack_sequences": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            d AS (SELECT doc_id, tokens, len(tokens) AS n
                  FROM lt WHERE len(tokens) > 0),
            offs AS (
              SELECT doc_id, tokens, n,
                     COALESCE(sum(n) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS strt
              FROM d),
            seg AS (
              SELECT p.pack_id,
                     greatest(strt, p.pack_id * 512)
                       - p.pack_id * 512 AS off,
                     tokens[greatest(strt, p.pack_id * 512) - strt + 1
                            : least(strt + n, (p.pack_id + 1) * 512)
                              - strt] AS sg
              FROM offs,
                   unnest(range(CAST(strt // 512 AS BIGINT), CAST((strt + n - 1) // 512 + 1 AS BIGINT)))
                     AS p(pack_id)),
            packs AS (
              SELECT pack_id,
                     flatten(list(sg ORDER BY off ASC)) AS tokens
              FROM seg GROUP BY 1)
            SELECT pack_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
                   md5(array_to_string(tokens, ' ')) AS fp
            FROM packs
        """,
        "suggest_terms": f"""
            WITH {_TOKS}, {_POSTINGS}, {_TSTATS}
            SELECT term, CAST(df AS BIGINT) AS df FROM tstats
            WHERE term LIKE 's%'
            ORDER BY df DESC, term ASC LIMIT 5
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(
                     md5(CAST(doc_id AS VARCHAR) || 'v1'),
                     18, 15))::BIGINT % 10000
                  < CASE lang WHEN 'en' THEN 5000
                              WHEN 'de' THEN 2000
                              ELSE 1000 END
        """,
        "weighted_sample": """
            SELECT doc_id, lang, w FROM (
              SELECT doc_id, lang,
                     CAST(0.5 + doc_id % 7 AS DOUBLE) AS w
              FROM documents)
            ORDER BY
              -ln((('0x' || substr(
                      md5(CAST(doc_id AS VARCHAR) || 'v1'),
                      18, 15))::BIGINT + 0.5)
                  / 1152921504606846976.0) / w ASC,
              doc_id ASC
            LIMIT 50
        """,
        "upsample_mixture": """
            WITH w AS (
              SELECT doc_id, lang,
                     CAST(CASE lang WHEN 'en' THEN 2
                                    WHEN 'de' THEN 0
                                    ELSE 1 END
                       + CASE WHEN ('0x' || substr(
                             md5(CAST(doc_id AS VARCHAR) || 'v1'),
                             18, 15))::BIGINT % 10000
                           < CASE lang WHEN 'en' THEN 5000
                                       WHEN 'de' THEN 2500
                                       ELSE 0 END
                         THEN 1 ELSE 0 END AS BIGINT) AS n
              FROM documents)
            SELECT doc_id, lang,
                   CAST(unnest(range(0, n)) AS INTEGER) AS copy
            FROM w
        """,
        "hits_scores": _hits_sql(3),
        "rank_rbo": _rbo_sql(k=10, p=0.9),
        "interleave_balanced": f"""
            WITH {_INTERLEAVE_BASE}
            SELECT query_id, pos, doc_id, rank_a, rank_b
            FROM ranked WHERE pos <= 10
        """,
        "interleave_team_draft_md5": f"""
            WITH RECURSIVE q AS (
              SELECT doc_id AS query_id FROM documents
              WHERE doc_id < 10),
            iidx AS (
              SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS i),
            qa AS (
              SELECT query_id,
                     (query_id * 31 + i * 7) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            qb AS (
              SELECT query_id,
                     (query_id * 31 + i * 11 + 3) % 200 AS doc_id,
                     i + 1 AS rn
              FROM q CROSS JOIN iidx),
            la AS (SELECT query_id, list(doc_id ORDER BY rn) AS l
                   FROM qa GROUP BY 1),
            lb AS (SELECT query_id, list(doc_id ORDER BY rn) AS l
                   FROM qb GROUP BY 1),
            step AS (
              SELECT q.query_id,
                     CAST([] AS BIGINT[]) AS picked,
                     CAST([] AS VARCHAR[]) AS teams,
                     0 AS na, 0 AS nb, 0 AS rnd
              FROM q
              UNION ALL
              SELECT s.query_id,
                     list_append(s.picked, {_TD_DOC}),
                     list_append(s.teams, {_TD_TURN}),
                     s.na + CASE WHEN ({_TD_TURN}) = 'A'
                                 THEN 1 ELSE 0 END,
                     s.nb + CASE WHEN ({_TD_TURN}) = 'B'
                                 THEN 1 ELSE 0 END,
                     s.rnd + 1
              FROM step s
              JOIN la ON la.query_id = s.query_id
              JOIN lb ON lb.query_id = s.query_id
              WHERE len(s.picked) < 10 AND ({_TD_DOC}) IS NOT NULL
            ),
            fl AS (
              SELECT query_id, picked, teams,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY len(picked) DESC) AS rnk
              FROM step),
            final AS (SELECT query_id, picked, teams
                      FROM fl WHERE rnk = 1)
            SELECT f.query_id,
                   CAST(u.i AS INTEGER) AS pos,
                   f.picked[CAST(u.i AS INTEGER)] AS doc_id,
                   f.teams[CAST(u.i AS INTEGER)] AS team
            FROM final f,
                 unnest(range(1, len(f.picked) + 1)) AS u(i)
        """,
        "interleave_outcome": f"""
            WITH {_INTERLEAVE_BASE},
            cl AS (
              SELECT DISTINCT query_id, doc_id FROM (
                SELECT query_id, doc_id FROM qa
                UNION ALL SELECT query_id, doc_id FROM qb)
              WHERE doc_id % 3 = 0),
            jc AS (
              SELECT j.query_id, j.rank_a, j.rank_b,
                     least(j.rank_a, j.rank_b) AS m
              FROM j JOIN cl ON cl.query_id = j.query_id
                            AND cl.doc_id = j.doc_id),
            agg AS (
              SELECT query_id, max(m) AS k FROM jc GROUP BY 1),
            cr AS (
              SELECT a.query_id, a.k,
                     CAST(sum(CASE WHEN jc.rank_a <= a.k
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS clicks_a,
                     CAST(sum(CASE WHEN jc.rank_b <= a.k
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS clicks_b
              FROM agg a JOIN jc ON jc.query_id = a.query_id
              GROUP BY 1, 2)
            SELECT query_id, k, clicks_a, clicks_b,
                   CASE WHEN clicks_a > clicks_b THEN 'A'
                        WHEN clicks_b > clicks_a THEN 'B'
                        ELSE 'tie' END AS winner
            FROM cr
        """,
        "click_coec": """
            WITH impr AS (
              SELECT event_id % 20 AS query_id,
                     (event_id * 7) % 500 AS doc_id,
                     event_id % 10 + 1 AS position,
                     (event_type = 'click') AS clicked
              FROM events),
            pctr AS (
              SELECT position,
                     CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) AS ctr
              FROM impr GROUP BY 1)
            SELECT i.query_id, i.doc_id,
                   count(*) AS n_impressions,
                   CAST(sum(CASE WHEN i.clicked THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clicks,
                   round(sum(p.ctr), 6) AS expected_clicks,
                   round(CASE WHEN sum(p.ctr) > 0 THEN
                     CAST(sum(CASE WHEN i.clicked THEN 1 ELSE 0 END)
                          AS DOUBLE) / sum(p.ctr) END, 6) AS coec
            FROM impr i JOIN pctr p USING(position)
            GROUP BY 1, 2
        """,
        "related_coclick": """
            WITH impr AS (
              SELECT event_id % 20 AS query_id,
                     (event_id * 7) % 499 AS doc_id,
                     (event_type = 'click') AS clicked
              FROM events),
            qd AS (
              SELECT DISTINCT query_id AS q, doc_id AS d
              FROM impr WHERE clicked),
            hotd AS (
              SELECT d FROM (
                SELECT d, count(*) AS nq FROM qd GROUP BY 1)
              WHERE nq > 1000),
            qd2 AS (
              SELECT * FROM qd
              WHERE d NOT IN (SELECT d FROM hotd)),
            nq AS (SELECT q, count(*) AS n FROM qd2 GROUP BY 1),
            pairs AS (
              SELECT l.q, r.q AS q2, count(*) AS coclicks
              FROM qd2 l JOIN qd2 r
                ON l.d = r.d AND l.q <> r.q
              GROUP BY 1, 2),
            scored AS (
              SELECT p.q AS query_id,
                     p.q2 AS related_query_id,
                     p.coclicks,
                     round(p.coclicks / sqrt(n1.n * n2.n), 6)
                       AS score
              FROM pairs p
              JOIN nq n1 ON n1.q = p.q
              JOIN nq n2 ON n2.q = p.q2),
            rr AS (
              SELECT query_id, related_query_id, coclicks, score,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, related_query_id)
                     AS INTEGER) AS rn
              FROM scored)
            SELECT query_id, related_query_id, coclicks, score, rn
            FROM rr WHERE rn <= 5
        """,
        "query_transitions": """
            WITH lg AS (
              SELECT event_id % 10 AS u, ts AS t,
                     (event_id * 13) % 30 AS q
              FROM events),
            nx AS (
              SELECT u, t, q,
                     lead(q) OVER (PARTITION BY u ORDER BY t, q)
                       AS q2,
                     lead(t) OVER (PARTITION BY u ORDER BY t, q)
                       AS t2
              FROM lg),
            fl AS (
              SELECT q, q2 FROM nx
              WHERE q2 IS NOT NULL AND q2 <> q
                AND epoch_us(t2) - epoch_us(t)
                    <= 1800 * 1000000),
            cnt AS (
              SELECT q AS query_id, q2 AS next_query_id,
                     count(*) AS n
              FROM fl GROUP BY 1, 2),
            rr AS (
              SELECT query_id, next_query_id, n,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY n DESC, next_query_id)
                     AS INTEGER) AS rn
              FROM cnt)
            SELECT query_id, next_query_id, n, rn
            FROM rr WHERE rn <= 5
        """,
        "click_pbm_alpha": """
            WITH impr AS (
              SELECT event_id % 20 AS query_id,
                     (event_id * 7) % 500 AS doc_id,
                     event_id % 10 + 1 AS position,
                     (event_type = 'click') AS clicked
              FROM events),
            pctr AS (
              SELECT position,
                     CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) AS ctr
              FROM impr GROUP BY 1),
            mx AS (SELECT max(ctr) AS m FROM pctr),
            gam AS (
              SELECT position,
                     CASE WHEN m > 0 THEN
                       least(CAST(0.999999 AS DOUBLE), ctr / m)
                     ELSE CAST(0 AS DOUBLE) END AS gamma
              FROM pctr CROSS JOIN mx)
            SELECT i.query_id, i.doc_id,
                   count(*) AS n_impressions,
                   round(avg(CASE WHEN i.clicked THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(0.5 AS DOUBLE) * (1 - g.gamma)
                          / (1 - CAST(0.5 AS DOUBLE) * g.gamma)
                     END), 6) AS alpha
            FROM impr i JOIN gam g USING(position)
            GROUP BY 1, 2
        """,
        "pagerank": """
            WITH nodes AS (
              SELECT doc_id AS node_id FROM documents WHERE doc_id < 200),
            srcd AS (
              SELECT doc_id FROM documents
              WHERE doc_id < 200 AND doc_id % 10 <> 9),
            edges AS (
              SELECT doc_id AS src, (doc_id * 7 + 1) % 200 AS dst
              FROM srcd
              UNION ALL
              SELECT doc_id AS src, (doc_id * 13 + 3) % 200 AS dst
              FROM srcd),
            degs AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM nodes),
            r0 AS (
              SELECT node_id, CAST(1.0 AS DOUBLE) / nn.n AS rank
              FROM nodes CROSS JOIN nn),
            r1 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r0 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r0 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            ),
            r2 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r1 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r1 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            ),
            r3 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r2 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r2 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            ),
            r4 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r3 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r3 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            ),
            r5 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r4 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r4 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            ),
            r6 AS (
              SELECT n.node_id,
                     (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE)
                       * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                          + d.dm / nn.n) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node_id,
                       sum(r.rank / dg.out_deg) AS in_rank
                FROM edges e
                JOIN r5 r ON r.node_id = e.src
                JOIN degs dg ON dg.src = e.src
                GROUP BY 1) c ON c.node_id = n.node_id
              CROSS JOIN (
                SELECT COALESCE(sum(r.rank), 0) AS dm
                FROM r5 r
                LEFT JOIN degs dg ON dg.src = r.node_id
                WHERE dg.src IS NULL) d
            )
            SELECT node_id, round(rank, 6) AS rank FROM r6
        """,
        "fuzzy_terms": f"""
            WITH {_TOKS}, {_POSTINGS}, {_TSTATS}
            SELECT term, CAST(df AS BIGINT) AS df,
                   CAST(levenshtein(term, 'quer') AS INTEGER) AS dist
            FROM tstats
            WHERE levenshtein(term, 'quer') <= 1
        """,
        "c4_span_dedup": r"""
            WITH sdoc AS (
              SELECT doc_id,
                     regexp_replace(text, ' the ', '. ', 'g') AS stext
              FROM documents),
            s AS (
              SELECT doc_id,
                     list_filter(
                       list_transform(
                         string_split_regex(stext, '[.!?]\s+'),
                         x -> trim(x)),
                       x -> x <> '') AS sents
              FROM sdoc),
            sp AS (
              SELECT doc_id,
                     md5(array_to_string(sents[i:i+2], ' ')) AS span_fp
              FROM s, unnest(range(1, len(sents) - 1)) AS r(i)
              WHERE len(sents) >= 3)
            SELECT span_fp, count(*) AS n_occ,
                   count(DISTINCT doc_id) AS n_docs
            FROM sp GROUP BY 1 HAVING count(*) > 1
        """,
        "exact_substr_dedup": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            w AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS win_idx,
                     md5(array_to_string(tokens[i:i+19], ' ')) AS win_fp
              FROM lt, unnest(range(1, len(tokens) - 18)) AS r(i)
              WHERE len(tokens) >= 20),
            occ AS (
              SELECT doc_id, win_idx, win_fp,
                     row_number() OVER (PARTITION BY win_fp
                                        ORDER BY doc_id, win_idx) AS rn,
                     count(*) OVER (PARTITION BY win_fp) AS n_occ
              FROM w),
            bad AS (SELECT doc_id, win_idx FROM occ
                    WHERE n_occ > 1 AND rn > 1),
            cov AS (
              SELECT DISTINCT bad.doc_id, CAST(t.t AS INT) AS t
              FROM bad, unnest(range(bad.win_idx, bad.win_idx + 20))
                         AS t(t)),
            toku AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS idx, tokens[i] AS tok
              FROM lt, unnest(range(1, len(tokens) + 1)) AS r(i)),
            keep AS (
              SELECT tk.doc_id, tk.idx, tk.tok
              FROM toku tk LEFT JOIN cov
                ON cov.doc_id = tk.doc_id AND cov.t = tk.idx
              WHERE cov.t IS NULL),
            agg AS (
              SELECT doc_id, count(*) AS clean_len,
                     md5(string_agg(tok, ' ' ORDER BY idx)) AS clean_fp
              FROM keep GROUP BY doc_id)
            SELECT lt.doc_id,
                   CAST(len(lt.tokens) AS INT) AS orig_len,
                   CAST(coalesce(agg.clean_len, 0) AS INT) AS clean_len,
                   coalesce(agg.clean_fp, md5('')) AS clean_fp
            FROM lt LEFT JOIN agg USING (doc_id)
        """,
        "decontaminate": f"""
            WITH lt AS (SELECT doc_id, {toks_list} AS tokens
                        FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(tokens[i:i+7], ' ') AS shingle
              FROM lt, unnest(range(1, len(tokens) - 6)) AS r(i)
              WHERE len(tokens) >= 8
            ),
            bench AS (SELECT DISTINCT shingle FROM sh
                      WHERE doc_id % 50 = 0),
            corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0)
            SELECT DISTINCT c.doc_id
            FROM corpus c JOIN bench b USING (shingle)
        """,
        "semantic_decontaminate": """
            WITH e AS (SELECT vec_id,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            bench AS (SELECT * FROM e WHERE vec_id % 10 = 0),
            corpus AS (SELECT * FROM e WHERE vec_id % 10 <> 0)
            SELECT DISTINCT c.vec_id
            FROM corpus c JOIN bench b
              ON round(list_cosine_similarity(c.v, b.v), 6) >= 0.4
        """,
        "tfidf_keywords": f"""
            WITH {_TOKS},
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
            nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     round(CAST(tf.tf AS DOUBLE)
                           * (ln(CAST(nn.n + 1 AS DOUBLE)
                                 / CAST(dft.df_t + 1 AS DOUBLE)) + 1.0),
                           6) AS score
              FROM tf JOIN dft USING (term) CROSS JOIN nn),
            ranked AS (
              SELECT doc_id, term, tf, score,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, term ASC) AS INTEGER) AS rank
              FROM scored)
            SELECT doc_id, term, tf, score, rank
            FROM ranked WHERE rank <= 3
        """,
        # Spark session_window semantics (measured, pinned by
        # tests/test_sessions.py): a gap of EXACTLY the window merges,
        # break only when gap > 30 min; session_end = last event + gap
        "event_sessions": """
            WITH o AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN ts - lag(ts) OVER
                            (PARTITION BY user_id
                             ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT *, sum(brk) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events,
                   CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6)
                        AS DOUBLE) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "asof_join_events": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.ts AS err_ts, r.value AS err_value
            FROM (SELECT * FROM events
                  WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events
                            WHERE event_type = 'error') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        # integer-microsecond bound mirrors the operator's exact
        # timestamp arithmetic (300 s = 300,000,000 us, inclusive)
        "range_join_events": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.ts AS err_ts, r.value AS err_value
            FROM (SELECT * FROM events
                  WHERE event_type = 'click') l
            JOIN (SELECT * FROM events
                  WHERE event_type = 'error') r
              ON l.user_id = r.user_id
             AND abs(epoch_us(l.ts) - epoch_us(r.ts))
                 <= 300000000
        """,
        "user_activity_sketch": """
            SELECT user_id, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types_exact,
                   true AS within_bound
            FROM events GROUP BY user_id
        """,
        "agg_sum_by_key": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                     AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                     AS sum_price,
                   count(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        """,
        "join_revenue_topk": """
            SELECT c_name,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                     AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY revenue DESC, c_name ASC LIMIT 10
        """,
        "anti_join_no_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "semi_join_segments": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            GROUP BY 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "window_pagination": """
            WITH ranked AS (
              SELECT o_orderkey, o_totalprice,
                     CAST(row_number() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey ASC)
                       AS INTEGER) AS rn
              FROM orders)
            SELECT o_orderkey, o_totalprice, rn FROM ranked
            WHERE rn > 10 AND rn <= 20
        """,
        "grouped_statistics": """
            SELECT n_name,
                   coalesce(c.n_customers, 0) AS n_customers,
                   coalesce(s.n_suppliers, 0) AS n_suppliers
            FROM nation
            LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers
                       FROM customer GROUP BY 1) c
              ON n_nationkey = c.c_nationkey
            LEFT JOIN (SELECT s_nationkey, count(*) AS n_suppliers
                       FROM supplier GROUP BY 1) s
              ON n_nationkey = s.s_nationkey
        """,
        "union_distinct": """
            SELECT DISTINCT nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL
              SELECT s_nationkey AS nationkey FROM supplier)
        """,
        "distinct_values": "SELECT DISTINCT event_type FROM events",
        "avg_scalar": """
            SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
            FROM documents
        """,
        "event_hourly_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "phrase_match": f"""
            WITH {_TOKS_POS}, {_phrase_ctes(PHRASE_TERMS)}
            SELECT doc_id, phrase_tf FROM tfd
        """,
        "phrase_search": f"""
            WITH {_TOKS_POS}, {_phrase_ctes(PHRASE_TERMS)},
            lens AS (
              SELECT doc_id, count(*) AS doc_len
              FROM toks_pos GROUP BY 1),
            nn AS (
              SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT CAST(count(*) AS DOUBLE) FROM toks_pos)
                       / (SELECT count(*) FROM documents) AS avg_len,
                     (SELECT count(*) FROM tfd) AS dfp)
            SELECT t.doc_id, t.phrase_tf,
                   round(
                     ln((nn.n - nn.dfp + 0.5) / (nn.dfp + 0.5))
                     * (t.phrase_tf::DOUBLE / l.doc_len) * ({K1} + 1)
                     / (t.phrase_tf::DOUBLE / l.doc_len
                        + {K1} * (1 - {B}
                                  + {B} * l.doc_len / nn.avg_len)),
                     6) AS score
            FROM tfd t JOIN lens l USING (doc_id) CROSS JOIN nn
            ORDER BY score DESC, t.doc_id ASC LIMIT 10
        """,
        "doclen_quantiles": f"""
            WITH {_TOKS}, {_LENS}
            SELECT CAST(q AS DOUBLE) AS q,
                   round(doc_len_q, 6) AS doc_len_q
            FROM (
              SELECT 0.25 AS q,
                     quantile_cont(CAST(doc_len AS DOUBLE), 0.25)
                       AS doc_len_q FROM lens
              UNION ALL SELECT 0.5,
                quantile_cont(CAST(doc_len AS DOUBLE), 0.5) FROM lens
              UNION ALL SELECT 0.75,
                quantile_cont(CAST(doc_len AS DOUBLE), 0.75) FROM lens
              UNION ALL SELECT 0.9,
                quantile_cont(CAST(doc_len AS DOUBLE), 0.9) FROM lens
              UNION ALL SELECT 0.99,
                quantile_cont(CAST(doc_len AS DOUBLE), 0.99) FROM lens
            )
        """,
        "ngram_repetition": f"""
            WITH base AS (
              SELECT doc_id, {toks_list} AS toklist FROM documents),
            {_gram_cte(2)},
            lens AS (
              SELECT doc_id, len(toklist) AS n_tokens FROM base)
            SELECT l.doc_id,
                   CAST(l.n_tokens AS BIGINT) AS n_tokens,
                   {_frac_sql('a.max_c', 2)} AS top_ngram_frac,
                   {_frac_sql('a.dup_c', 2)} AS dup_ngram_frac
            FROM lens l LEFT JOIN agg2 a USING (doc_id)
        """,
        "gopher_gate": _gopher_gate_sql(toks_list, stopword_list),
        "unigram_logprob": f"""
            WITH {_TOKS},
            tf AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
            per AS (
              SELECT doc_id, -ln(tf.c / tot.t) AS nlp
              FROM toks JOIN tf USING (term) CROSS JOIN tot)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(nlp), 6) AS nll,
                   round(exp(avg(nlp)), 6) AS ppl
            FROM per GROUP BY 1
        """,
        "assign_split": """
            SELECT doc_id,
                   CASE WHEN b < 8000 THEN 'train'
                        WHEN b < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR) || 'v1'),
                        18, 15))::BIGINT % 10000 AS b
              FROM documents)
        """,
        "site_lang_rollup": """
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY ROLLUP(source, lang)
        """,
        "extract_links": _extract_links_sql(),
        # T1/T2: the oracle states the expected extraction over the
        # same deterministic html the Spark side feeds the REAL
        # extractors — comments/script/head (incl. title) removed,
        # tags stripped, entities unescaped, whitespace collapsed
        "extract_text_roundtrip": """
            SELECT doc_id,
                   trim(regexp_replace(
                     'intro ' || regexp_replace(coalesce(text, ''),
                                  '[^A-Za-z0-9 .,]', ' ', 'g')
                       || ' tail <' || doc_id || '>',
                     '\\s+', ' ', 'g')) AS text
            FROM documents
        """,
        "extract_title": """
            SELECT doc_id,
                   'Doc ' || doc_id || ' & ' || source AS title
            FROM documents
        """,
        "anchor_postings": f"""
            WITH {_anchor_postings_sql()}
            SELECT target, term, tf FROM anchor_postings
        """,
        "bm25f_anchor_topk": _anchored_search_sql(
            FLAGSHIP_TERMS, w=2.0, limit=10
        ),
        "bm25f_topk": f"""
            WITH base AS (
              SELECT doc_id, text, substr(text, 1, 50) AS title
              FROM documents),
            lists AS (
              SELECT doc_id, {toks_list} AS bt,
                     {toks_list.replace("lower(text)",
                                        "lower(title)")} AS tt
              FROM base),
            stream AS (
              SELECT doc_id, unnest(bt) AS term, 1.0 AS wt FROM lists
              UNION ALL
              SELECT doc_id, unnest(tt) AS term, 2.0 AS wt FROM lists),
            wl AS (
              SELECT doc_id, len(bt) + 2.0 * len(tt) AS wlen
              FROM lists),
            nn AS (
              SELECT count(*) AS n, avg(wlen) AS avg_wlen FROM wl),
            qtf AS (
              SELECT doc_id, term, sum(wt) AS wtf FROM stream
              WHERE term IN (
                {", ".join(f"'{t}'" for t in FLAGSHIP_TERMS)})
              GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1)
            SELECT doc_id, round(sum(contrib), 6) AS score FROM (
              SELECT q.doc_id,
                     ln((nn.n - d.df + 0.5) / (d.df + 0.5))
                       * (q.wtf / w.wlen) * ({K1} + 1)
                       / (q.wtf / w.wlen
                          + {K1} * (1 - {B}
                                    + {B} * w.wlen / nn.avg_wlen))
                       AS contrib
              FROM qtf q JOIN dfq d USING (term)
              JOIN wl w USING (doc_id) CROSS JOIN nn)
            GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "dismax_topk": f"""
            WITH base AS (
              SELECT doc_id, text, substr(text, 1, 50) AS title
              FROM documents),
            lists AS (
              SELECT doc_id, {toks_list} AS bt,
                     {toks_list.replace("lower(text)",
                                        "lower(title)")} AS tt
              FROM base),
            qlist(term) AS (VALUES {", ".join(
                f"('{t}')" for t in FLAGSHIP_TERMS)}),
            body AS (
              SELECT doc_id, unnest(bt) AS term, len(bt) AS L
              FROM lists WHERE len(bt) > 0),
            title_s AS (
              SELECT doc_id, unnest(tt) AS term, len(tt) AS L
              FROM lists WHERE len(tt) > 0),
            bstat AS (SELECT count(DISTINCT doc_id) AS n,
                             avg(L) AS avg FROM (
                        SELECT doc_id, any_value(L) AS L FROM body
                        GROUP BY 1)),
            tstat AS (SELECT count(DISTINCT doc_id) AS n,
                             avg(L) AS avg FROM (
                        SELECT doc_id, any_value(L) AS L
                        FROM title_s GROUP BY 1)),
            btf AS (SELECT doc_id, term, count(*) AS tf,
                           any_value(L) AS L
                    FROM body WHERE term IN (SELECT term FROM qlist)
                    GROUP BY 1, 2),
            ttf AS (SELECT doc_id, term, count(*) AS tf,
                           any_value(L) AS L
                    FROM title_s
                    WHERE term IN (SELECT term FROM qlist)
                    GROUP BY 1, 2),
            bdf AS (SELECT term, count(*) AS df FROM btf GROUP BY 1),
            tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY 1),
            bscore AS (
              SELECT f.doc_id, sum(
                ln((s.n - d.df + 0.5) / (d.df + 0.5))
                * (f.tf::DOUBLE / f.L) * ({K1} + 1)
                / (f.tf::DOUBLE / f.L
                   + {K1} * (1 - {B} + {B} * f.L / s.avg))) AS sc
              FROM btf f JOIN bdf d USING (term) CROSS JOIN bstat s
              GROUP BY 1),
            tscore AS (
              SELECT f.doc_id, sum(
                ln((s.n - d.df + 0.5) / (d.df + 0.5))
                * (f.tf::DOUBLE / f.L) * ({K1} + 1)
                / (f.tf::DOUBLE / f.L
                   + {K1} * (1 - {B} + {B} * f.L / s.avg))) AS sc
              FROM ttf f JOIN tdf d USING (term) CROSS JOIN tstat s
              GROUP BY 1),
            merged AS (
              SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
                     b.sc AS bs, t.sc AS ts
              FROM bscore b FULL OUTER JOIN tscore t
                ON b.doc_id = t.doc_id),
            final AS (
              SELECT doc_id,
                     greatest(coalesce(bs, -1e300),
                              coalesce(ts, -1e300))
                     + 0.3 * (coalesce(bs, 0) + coalesce(ts, 0)
                              - greatest(coalesce(bs, -1e300),
                                         coalesce(ts, -1e300)))
                       AS score
              FROM merged)
            SELECT doc_id, round(score, 6) AS score FROM final
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "topk_per_site": """
            SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(rnk AS INT) AS rnk
            FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rnk
              FROM documents)
            WHERE rnk <= 3
        """,
        "intersect_customers": """
            SELECT c_custkey AS custkey FROM customer
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        """,
        "except_customers": """
            SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderstatus = 'F'
        """,
        "site_doclen_quantiles": f"""
            WITH {_TOKS}, {_LENS}
            SELECT site,
                   round(quantile_cont(CAST(doc_len AS DOUBLE), 0.5),
                         6) AS p50,
                   round(quantile_cont(CAST(doc_len AS DOUBLE), 0.9),
                         6) AS p90
            FROM lens GROUP BY site
        """,
    }
