"""Compacted posting-list segments (SURVEY §2.4 N1–N4).

The reference's ``index`` table is one relational row per
(lemma, page) posting (model/Index.java:7-23).  At 10^12-document
scale that layout — and the single unsalted shuffle that would build
it — are the bottleneck, so the rebuild adds three *physical*
operators with no reference counterpart:

  N1  salted repartition-by-term: head (Zipf) terms are split across
      ``salt`` reducers so no single task owns a stop-term's full
      posting list.  Salt factor is derived from the df stats, not
      guessed: ``ceil(df / postings_per_shard)`` capped at
      ``max_salt``.
  N2  block compaction: ``groupBy(term, salt).applyInPandas`` sorts
      each shard's postings by doc_id and emits delta+varint blocks
      with block-max metadata (functions/codec.py).
  N3  segment merge: shards/segments of one term are re-merged into a
      single sorted block sequence (also the incremental re-index
      path, reference R25).
  N4  stop-term sharding: terms with df above
      ``config.shard_df_threshold`` keep their salt shards at rest —
      they are unioned at query time instead of concentrating one
      reducer at merge time.

Doc ids are segment-composed — ``(url-hash segment) << 40 | rank
within segment`` — deterministic with NO global sort: the only
shuffle is a hash partition on the segment key, each segment is
ranked independently.  40 bits of rank per segment ⇒ 10^12 docs fit
comfortably at any segment count ≥ 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.functions.codec import (
    build_blocks,
    build_blocks_batch,
    read_block,
)
from search_engine_spark.operators.postings import InvertedIndex

SEGMENT_BITS = 40

# Auto-combine threshold (compact_postings_withlen combine=None):
# total postings at which the map-side combine's ~8× shuffle-byte
# saving starts beating its extra Python/Arrow pass.  Below it (every
# local bench/test scale) the direct single-pass build wins; above it
# the 100 TB lever engages.  Both paths are bit-identical.
COMBINE_MIN_POSTINGS = 50_000_000

# One term-shard's compressed blocks (the on-disk index row schema).
SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("max_u", T.DoubleType(), False),
        T.StructField("min_u", T.DoubleType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("doc_lens", T.BinaryType(), False),
    ]
)


def assign_doc_ids(
    doc_lens: DataFrame,
    id_col: str = "url",
    n_segments: int = 256,
    order: str = "hash",
) -> DataFrame:
    """``doc_map(doc_id, <id_col>, site, doc_len[, title])``.

    Deterministic dense-ish long ids without a global sort: hash the
    natural key into ``n_segments``, rank within each segment by the
    natural key (one hash shuffle + per-partition sort), compose
    ``doc_id = segment << 40 | rank``.

    ``order`` picks the docID-assignment locality (Silvestri 2007,
    "Sorting out the document identifier assignment problem"):

    - ``"hash"`` (default) — segment by url hash: uniform segment
      sizes, ids uncorrelated with content.
    - ``"site"`` — segment by SITE hash; within a segment the url
      sort then groups each site's pages contiguously, so a term
      concentrated in few sites gets small doc-id gaps → smaller
      delta+varint posting blocks (the classic sort-by-URL
      assignment; gains are corpus-dependent — nil on site-agnostic
      text, large when vocabulary correlates with site).  Skew note:
      a segment now holds whole sites, so size ``n_segments`` well
      above the big-site count (the per-segment rank window is the
      skew point at 100 TB).

    Either way the assignment is a pure function of the corpus keys
    — search results are id-permutation-invariant (pytest-pinned).
    """
    from pyspark.sql import Window

    if id_col == "doc_id":
        # withColumn("doc_id", ...) below would silently REPLACE the
        # natural key and the compaction join would match nothing
        raise ValueError(
            "natural id column must not be named 'doc_id' (the "
            "composed id uses that name) — rename it first"
        )

    if order == "site" and "site" in doc_lens.columns:
        seg_key = F.col("site")
    elif order == "site":
        raise ValueError("order='site' needs a site column")
    else:
        seg_key = F.col(id_col)
    seg = F.pmod(F.xxhash64(seg_key), F.lit(n_segments)).cast("int")
    w = Window.partitionBy("_seg").orderBy(F.col(id_col).asc())
    out = (
        doc_lens.withColumn("_seg", seg)
        .withColumn("_rank", F.row_number().over(w))
        .withColumn(
            "doc_id",
            (
                F.col("_seg").cast("long") * F.lit(1 << SEGMENT_BITS)
                + F.col("_rank").cast("long")
            ),
        )
        .drop("_seg", "_rank")
    )
    return out.select("doc_id", *doc_lens.columns)


def salt_factors(
    term_stats: DataFrame,
    postings_per_shard: int,
    max_salt: int,
) -> DataFrame:
    """``(term, n_salt)`` for head terms only (df-driven, SURVEY N1)."""
    return (
        term_stats.filter(F.col("df") > postings_per_shard)
        .select(
            "term",
            F.least(
                F.ceil(F.col("df") / F.lit(postings_per_shard)),
                F.lit(max_salt),
            )
            .cast("int")
            .alias("n_salt"),
        )
    )


def _block_builder(avg_len: float, k1: float, b: float, block_size: int,
                   id_codec: str = "varint"):
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key
        blocks = build_blocks(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            avg_len,
            k1,
            b,
            block_size,
            id_codec,
        )
        return _blocks_to_pdf(term, int(shard), blocks)

    return fn


def _blocks_to_pdf(term: str, shard: int, blocks: list[dict]) -> pd.DataFrame:
    rows = []
    for blk in blocks:
        rows.append(
            {
                "term": term,
                "shard": shard,
                "block_id": blk["block_id"],
                "count": blk["count"],
                "first_doc_id": blk["first_doc_id"],
                "last_doc_id": blk["last_doc_id"],
                "max_u": blk["max_u"],
                "min_u": blk["min_u"],
                "doc_ids": blk["doc_ids"],
                "tfs": blk["tfs"],
                "doc_lens": blk["doc_lens"],
            }
        )
    cols = [f.name for f in SEGMENT_SCHEMA.fields]
    return pd.DataFrame(rows, columns=cols)


def compact_postings(
    postings: DataFrame,
    doc_map: DataFrame,
    term_stats: DataFrame,
    avg_len: float,
    id_col: str = "url",
    config: EngineConfig = DEFAULT,
    postings_per_shard: int = 1 << 20,
    n_docs: int | None = None,
    combine: bool | None = None,
) -> DataFrame:
    """postings(term, id, tf) → compressed segment rows (N1 + N2).

    One shuffle: ``repartition(term, salt)`` then a grouped Arrow pass
    builds the blocks.  Salt is 0 for the long tail; head terms get
    df-proportional salt so their posting lists split across tasks.

    The doc_map lookup is broadcast when the doc count is known to be
    small enough (saves shuffling the far-larger postings side);
    beyond the threshold it's a plain shuffled hash join — at
    10^12-doc scale both sides partition.
    """
    lookup = doc_map.select("doc_id", F.col(id_col), "doc_len")
    if n_docs is not None and n_docs <= config.doc_map_broadcast_max:
        lookup = F.broadcast(lookup)
    with_len = postings.join(lookup, id_col).select(
        "term", "doc_id", "tf", "doc_len"
    )
    if combine is None and n_docs is not None:
        # decide the physical path WITHOUT a job: total postings ≤
        # n_docs·avg_len (distinct terms per doc ≤ tokens per doc),
        # so this upper bound only ever errs toward the combine —
        # safe at scale, and it keeps plan construction lazy (the
        # withlen fallback's tiny stats agg is for callers that know
        # nothing about their size)
        combine = n_docs * avg_len >= COMBINE_MIN_POSTINGS
    return compact_postings_withlen(
        with_len, term_stats, avg_len, config, postings_per_shard,
        combine,
    )


def compact_postings_withlen(
    with_len: DataFrame,
    term_stats: DataFrame,
    avg_len: float,
    config: EngineConfig = DEFAULT,
    postings_per_shard: int = 1 << 20,
    combine: bool | None = None,
) -> DataFrame:
    """Same as :func:`compact_postings` but over rows that already
    carry ``(term, doc_id, tf, doc_len)`` — the entry point for
    maintenance paths (vacuum) whose postings come from decoding the
    existing index rather than from a doc-map join.

    ``combine=None`` (default) auto-selects: the map-side combine
    cuts shuffle bytes ~8× (the 100 TB lever) but costs a second
    Python/Arrow pass, and below ``COMBINE_MIN_POSTINGS`` total
    postings the raw shuffle fits memory trivially, so the single
    direct pass is measurably faster (~1.5× at 1.75 M postings,
    local[32]).  Both paths emit bit-identical block rows
    (tests/test_compact_combine.py), so the choice is purely
    physical."""
    k1, b = config.bm25.k1, config.bm25.b
    if combine is None:
        try:
            total = term_stats.agg(
                F.sum("df").alias("s")
            ).collect()[0]["s"]
            combine = (
                total is not None
                and int(total) >= COMBINE_MIN_POSTINGS
            )
        except Exception:
            combine = True  # unknown size: assume big
    salts = salt_factors(term_stats, postings_per_shard, config.max_salt)
    salted = (
        with_len.join(F.broadcast(salts), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salt").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salt")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salt")
    )
    builder = _block_builder(avg_len, k1, b, config.block_size,
                             config.doc_id_codec)
    if not combine:
        return salted.groupBy("term", "salt").applyInPandas(
            builder, SEGMENT_SCHEMA
        )

    # Map-side combine (the 100 TB lever): each input partition first
    # compresses ITS postings per (term, salt) into partial runs —
    # sorted, delta+varint — so the term shuffle moves ~5 B/posting
    # instead of ~40 B/posting of raw (term, doc_id, tf, doc_len)
    # rows.  The reducer decodes the few partial runs per shard,
    # re-sorts, and emits the canonical block sequence — bit-identical
    # to the direct path (asserted by tests).
    partial_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("salt", T.IntegerType(), False),
            T.StructField("count", T.IntegerType(), False),
            T.StructField("doc_ids", T.BinaryType(), False),
            T.StructField("tfs", T.BinaryType(), False),
            T.StructField("doc_lens", T.BinaryType(), False),
        ]
    )

    seg_cols = [f.name for f in SEGMENT_SCHEMA.fields]

    def partial_builder(batches):
        import numpy as np

        from search_engine_spark.functions.codec import (
            varint_encode_all,
        )

        # one combine per PARTITION, not per ~10k-row Arrow batch —
        # per-batch runs would multiply the partial count ~20x and
        # drown the reducer in tiny runs.  All (term, salt) runs of
        # the partition are encoded in ONE vectorized pass (lexsort +
        # global varint, sliced per run) — no per-group Python.
        parts = list(batches)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
        if not len(pdf):
            return
        codes, uniq = pd.factorize(pdf["term"], sort=False)
        uniq = np.asarray(uniq, dtype=object)
        salts_np = pdf["salt"].to_numpy(dtype=np.int64)
        key = codes.astype(np.int64) * (
            np.int64(salts_np.max()) + 1
        ) + salts_np
        ids = pdf["doc_id"].to_numpy(dtype=np.uint64)
        order = np.lexsort((ids, key))
        key_s = key[order]
        ids_s = ids[order]
        tfs_s = pdf["tf"].to_numpy(dtype=np.uint64)[order]
        dls_s = pdf["doc_len"].to_numpy(dtype=np.uint64)[order]
        run_starts = np.concatenate(
            ([0], np.flatnonzero(key_s[1:] != key_s[:-1]) + 1)
        )
        run_ends = np.append(run_starts[1:], key_s.size) - 1
        # delta-gaps restart absolute at each run start — each run's
        # slice is bit-identical to encode_doc_ids(run_ids) (tag 0x00)
        gaps = ids_s.copy()
        gaps[1:] -= ids_s[:-1]
        gaps[run_starts] = ids_s[run_starts]
        buf_i, off_i = varint_encode_all(gaps)
        buf_t, off_t = varint_encode_all(tfs_s)
        buf_d, off_d = varint_encode_all(dls_s)
        codes_s = codes[order]
        yield pd.DataFrame(
            {
                "term": uniq[codes_s[run_starts]],
                "salt": salts_np[order][run_starts],
                "count": run_ends - run_starts + 1,
                "doc_ids": [
                    b"\x00" + buf_i[off_i[s]:off_i[e + 1]].tobytes()
                    for s, e in zip(run_starts, run_ends)
                ],
                "tfs": [
                    buf_t[off_t[s]:off_t[e + 1]].tobytes()
                    for s, e in zip(run_starts, run_ends)
                ],
                "doc_lens": [
                    buf_d[off_d[s]:off_d[e + 1]].tobytes()
                    for s, e in zip(run_starts, run_ends)
                ],
            },
            columns=[f.name for f in partial_schema.fields],
        )

    def reduce_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        """Complete (term, salt) groups of partial runs → final block
        rows, all groups in one vectorized pass."""
        import numpy as np

        from search_engine_spark.functions.codec import decode_varint

        codes, uniq = pd.factorize(pdf["term"], sort=False)
        uniq = np.asarray(uniq, dtype=object)
        salts_np = pdf["salt"].to_numpy(dtype=np.int64)
        counts = pdf["count"].to_numpy(dtype=np.int64)
        change = np.empty(codes.size, dtype=bool)
        change[0] = True
        change[1:] = (codes[1:] != codes[:-1]) | (
            salts_np[1:] != salts_np[:-1]
        )
        run_group = np.cumsum(change) - 1
        # partial payloads are always tag-0x00 varint; varints are
        # self-delimiting, so ALL runs decode in one pass per stream
        total = int(counts.sum())
        gaps = decode_varint(
            b"".join(buf[1:] for buf in pdf["doc_ids"]), total
        )
        tfs = decode_varint(b"".join(pdf["tfs"]), total)
        dls = decode_varint(b"".join(pdf["doc_lens"]), total)
        row_run_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        cs = np.cumsum(gaps, dtype=np.uint64)
        base = cs[row_run_starts] - gaps[row_run_starts]
        ids = cs - np.repeat(base, counts)
        grp_rows = np.repeat(run_group, counts)
        order = np.lexsort((ids, grp_rows))
        ids = ids[order]
        tfs = tfs[order]
        dls = dls[order]
        grp_rows = grp_rows[order]
        gstarts = np.concatenate(
            ([0], np.flatnonzero(grp_rows[1:] != grp_rows[:-1]) + 1)
        )
        blocks = build_blocks_batch(
            ids, tfs, dls, gstarts, avg_len, k1, b,
            config.block_size, config.doc_id_codec,
        )
        g_first_run = np.flatnonzero(change)
        terms_g = uniq[codes[g_first_run]]
        salts_g = salts_np[g_first_run]
        bg = blocks["group"]
        return pd.DataFrame(
            {
                "term": terms_g[bg],
                "shard": salts_g[bg],
                "block_id": blocks["block_id"],
                "count": blocks["count"],
                "first_doc_id": blocks["first_doc_id"],
                "last_doc_id": blocks["last_doc_id"],
                "max_u": blocks["max_u"],
                "min_u": blocks["min_u"],
                "doc_ids": blocks["doc_ids"],
                "tfs": blocks["tfs"],
                "doc_lens": blocks["doc_lens"],
            },
            columns=seg_cols,
        )

    def batch_reducer(batches):
        # rows arrive hash-partitioned and sorted by (term, salt) —
        # every group is contiguous; an Arrow batch may split the
        # LAST group, so hold it back and prepend to the next batch
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            lt = pdf["term"].iat[-1]
            ls = pdf["salt"].iat[-1]
            n_tail = int(
                (
                    (pdf["term"].to_numpy(dtype=object) == lt)
                    & (pdf["salt"].to_numpy() == ls)
                ).sum()
            )
            cut = len(pdf) - n_tail
            carry = pdf.iloc[cut:]
            if cut:
                yield reduce_pdf(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield reduce_pdf(carry)

    partial = salted.mapInPandas(partial_builder, partial_schema)
    return (
        partial.repartition("term", "salt")
        .sortWithinPartitions("term", "salt")
        .mapInPandas(batch_reducer, SEGMENT_SCHEMA)
    )


def _segment_merger(
    avg_len: float, k1: float, b: float, block_size: int,
    df_threshold: int, id_codec: str = "varint",
):
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        term = key[0]
        total = int(pdf["count"].sum())
        n_shards = pdf["shard"].nunique()
        if n_shards <= 1 or total > df_threshold:
            # N4: stop-term stays sharded at rest — pass through
            # (re-numbering block ids per shard for determinism).
            out = pdf.sort_values(["shard", "block_id"]).reset_index(
                drop=True
            )
            return out[[f.name for f in SEGMENT_SCHEMA.fields]]
        ids_l, tf_l, dl_l = [], [], []
        for _, row in pdf.iterrows():
            ids, tfs, dls = read_block(row)
            ids_l.append(ids)
            tf_l.append(tfs)
            dl_l.append(dls)
        blocks = build_blocks(
            np.concatenate(ids_l),
            np.concatenate(tf_l),
            np.concatenate(dl_l),
            avg_len,
            k1,
            b,
            block_size,
            id_codec,
        )
        return _blocks_to_pdf(term, 0, blocks)

    return fn


def merge_segments(
    segments: DataFrame,
    avg_len: float,
    config: EngineConfig = DEFAULT,
    term_stats: DataFrame | None = None,
    postings_per_shard: int | None = None,
) -> DataFrame:
    """N3/N4: merge each term's shards/segments into one sorted block
    sequence, unless the term is above the stop-term df threshold (in
    which case its salt shards are kept at rest and unioned at query
    time).  Also the incremental-merge path: union old + delta
    segments, then call this.

    When ``term_stats`` + ``postings_per_shard`` are provided (fresh
    build), terms that cannot need merging bypass the shuffle+Python
    cycle entirely: unsalted terms (df ≤ postings_per_shard) already
    have one sorted block run, and stop-terms
    (df > shard_df_threshold) stay sharded at rest by design.  Only
    the middle band — salted but under the stop threshold — is
    re-merged; the bypass predicates are broadcast anti/semi joins,
    no extra shuffle.
    """
    merger = _segment_merger(
        avg_len,
        config.bm25.k1,
        config.bm25.b,
        config.block_size,
        config.shard_df_threshold,
        config.doc_id_codec,
    )
    if term_stats is None or postings_per_shard is None:
        return segments.groupBy("term").applyInPandas(
            merger, SEGMENT_SCHEMA
        )
    needs_merge = term_stats.filter(
        (F.col("df") > postings_per_shard)
        & (F.col("df") <= config.shard_df_threshold)
    ).select("term")
    to_merge = segments.join(F.broadcast(needs_merge), "term",
                             "left_semi")
    passthrough = segments.join(F.broadcast(needs_merge), "term",
                                "left_anti")
    merged = to_merge.groupBy("term").applyInPandas(
        merger, SEGMENT_SCHEMA
    )
    return merged.unionByName(
        passthrough.select(*[f.name for f in SEGMENT_SCHEMA.fields])
    )


def decode_segments(segments: DataFrame) -> DataFrame:
    """Inverse of compaction: segment rows → (term, doc_id, tf,
    doc_len) exploded postings.  Arrow-batched ``mapInPandas`` —
    used by tests (round-trip property) and by query-time scoring of
    non-candidate query terms."""

    out_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("doc_len", T.IntegerType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ids, tfs, dls = read_block(row)
                frames.append(
                    pd.DataFrame(
                        {
                            "term": row["term"],
                            "doc_id": ids.astype("int64"),
                            "tf": tfs.astype("int32"),
                            "doc_len": dls.astype("int32"),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return segments.mapInPandas(gen, out_schema)


def bucket_col(term: F.Column, n_buckets: int) -> F.Column:
    """Stable term→bucket partitioning key for the on-disk index (a
    query term touches exactly one bucket directory).  CRC32 so the
    driver can compute the same bucket in pure Python
    (:func:`bucket_of`) and prune partitions before the scan."""
    return F.pmod(
        F.crc32(F.encode(term, "UTF-8")), F.lit(n_buckets)
    ).cast("int")


def bucket_of(term: str, n_buckets: int) -> int:
    """Python twin of :func:`bucket_col` — MUST stay identical."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


@dataclass
class CompactIndex:
    """Query-side view of a compacted index.  Duck-types the stats
    surface of :class:`InvertedIndex` (term_stats / site_stats /
    n_docs / avg_len / stoplist) so the IDF helper is shared."""

    segments: DataFrame          # SEGMENT_SCHEMA rows
    doc_map: DataFrame           # (doc_id, id_col, site, doc_len[, title])
    term_stats: DataFrame        # (term, df)
    site_stats: DataFrame        # (site, pages)
    n_docs: int
    avg_len: float
    stoplist: tuple[str, ...]
    id_col: str = "url"
    config: EngineConfig = field(default_factory=lambda: DEFAULT)
    # set when loaded from a bucket-partitioned on-disk index: query
    # plans add a bucket predicate so Catalyst partition-prunes the scan
    n_buckets: int | None = None
    # avg_len the stored block-max metadata was computed with.  WAND
    # pruning is sound only while this equals the live avg_len; after
    # appends/deletes drift it, search falls back to exact scoring
    # until vacuum() rebuilds the metadata (plans/incremental.py).
    blocks_avg_len: float | None = None
    # small (doc_id) frame of logically-deleted docs; anti-joined
    # broadcast-side before scoring so dead docs never inflate the
    # pruning threshold or surface in results
    tombstones: DataFrame | None = None


def compact_index(
    index: InvertedIndex,
    n_segments: int = 256,
    postings_per_shard: int = 1 << 20,
    merge: bool = True,
    id_order: str = "hash",
) -> CompactIndex:
    """Logical :class:`InvertedIndex` → :class:`CompactIndex`.

    ``id_order="site"`` turns on locality-aware docID assignment
    (see :func:`assign_doc_ids`) for smaller posting blocks on
    site-correlated corpora; query results are identical either way.
    """
    doc_map = assign_doc_ids(
        index.doc_lens, index.id_col, n_segments, order=id_order
    )
    segs = compact_postings(
        index.postings,
        doc_map,
        index.term_stats,
        index.avg_len,
        index.id_col,
        index.config,
        postings_per_shard,
        n_docs=index.n_docs,
    )
    if merge:
        segs = merge_segments(
            segs, index.avg_len, index.config,
            term_stats=index.term_stats,
            postings_per_shard=postings_per_shard,
        )
    return CompactIndex(
        segments=segs,
        doc_map=doc_map,
        term_stats=index.term_stats,
        site_stats=index.site_stats,
        n_docs=index.n_docs,
        avg_len=index.avg_len,
        stoplist=index.stoplist,
        id_col=index.id_col,
        config=index.config,
        blocks_avg_len=index.avg_len,
    )
