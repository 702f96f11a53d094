"""Engine configuration.

Defaults mirror the reference's ``application.properties``
(/root/reference/src/main/resources/application.properties:7,19-20):
BM25 k1=1.5 b=0.75, query stop-list of the 20 most-common lemmas.
``BASELINE.json`` north_star quotes k1=1.2 — both are reachable via
config; rank-identity tests run at the reference values.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.5
    b: float = 0.75


@dataclass(frozen=True)
class EngineConfig:
    bm25: BM25Config = field(default_factory=BM25Config)
    # Reference: search.most-popular-lemmas=20 (application.properties:7)
    stoplist_size: int = 20
    # Posting-block size for the compacted index (docs per block).
    block_size: int = 128
    # Terms with df above this threshold keep their build-time salt
    # shards at rest (stop-term sharding, SURVEY N4).
    shard_df_threshold: int = 1_000_000
    # Number of term buckets the compacted index is partitioned by.
    index_buckets: int = 64
    # Default salt factor cap for head terms (SURVEY N1).
    max_salt: int = 32
    # Broadcast the doc_map side of the compaction join when the
    # corpus has at most this many docs (≈ rows × ~60B ≤ a few 100 MB).
    doc_map_broadcast_max: int = 3_000_000
    # At-rest layout of the persisted indexes: rows are term-sorted
    # inside each bucket file (disjoint per-row-group term min/max →
    # parquet row-group pruning for term = / IN scans) and a parquet
    # bloom filter is written on `term` (prunes row groups bucket- and
    # stats-pruning can't — a rare term's query reads ~one row group
    # instead of the whole bucket).  ndv sizes the filter per row
    # group; ~1.2 bytes/term at the 1% default false-positive rate.
    # parquet-mr only materializes the bloom when a chunk falls back
    # from dictionary to plain encoding — exactly the at-scale case
    # (fully-dict chunks are already pruned via dictionary filtering),
    # so small indexes pay zero bytes for this option.
    write_term_bloom: bool = True
    term_bloom_ndv: int = 100_000
    # doc_ids payload codec inside posting blocks: "adaptive"
    # (default: per-block smaller-of-both — Elias–Fano on dense
    # head-term / locality-sorted blocks, varint elsewhere; measured
    # 0.82 vs 1.08 B/posting on the fixture corpus), "varint"
    # (delta-gap LEB128 always), or "ef" (Elias–Fano always — poor
    # on blocks spanning monotonically_increasing_id partition jumps,
    # where the universe u explodes; adaptive sidesteps this).
    # Payloads are tag-byte self-describing, so mixed-codec indexes
    # decode fine and the flag only affects NEW blocks.
    doc_id_codec: str = "adaptive"
    # URL-membership Bloom filter over the live corpus (the visited-
    # set scale path: the reference keeps an exact Redis set,
    # RecursiveWebParser.java:164-169).  append_pages probes its delta
    # against the filter: bloom-negative urls are DEFINITELY new (no
    # false negatives) and skip the exact anti-join against the docs
    # table — without the guard every append scans the corpus-sized
    # url column.  Sizing is recorded in the index descriptor at
    # creation, so later config changes never corrupt an existing
    # filter; at real scale pick m via operators/bloom.bloom_optimal
    # (≈1.2 GB of bits per 10^9 urls at 1% fpp).
    url_bloom_enabled: bool = True
    url_bloom_m_bits: int = 1 << 23
    url_bloom_k: int = 5
    # bloom-positive urls at or below this count probe the docs table
    # through an IN-list predicate (parquet row-group pruning) instead
    # of a full anti-join; above it, fall back to the exact join
    url_bloom_maybe_cap: int = 100_000


DEFAULT = EngineConfig()
