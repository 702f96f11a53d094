"""Incremental index maintenance (SURVEY §2.3 R23–R25, §3.3).

Reference semantics being re-expressed:

- R23 delete postings of a page (repositories/IndexRepository.java:23-36)
- R24 decrement-or-delete each lemma's df when a page is removed
  (services/impl/LemmaServiceImpl.java:103-115) — here df/stoplist/
  avg_len are *derived* tables recomputed from deltas, never mutated
  in place
- R25 single-page upsert: delete old postings, re-lemmatize, reinsert
  (services/utils/RecursiveWebParser.java:94-117)

Physical design over the persisted layout (plans/build.py): the index
is **LSM-style append + tombstone**.  New docs get doc_ids in fresh
id-segments (``next_id_segment`` cursor in stats.json) and their term
blocks land in a per-append delta-epoch directory
(``index_deltas/epoch=N``, bucket-partitioned like the base) — the
base ``index/`` files are never touched by an append; removed/
re-indexed docs are recorded in a ``tombstones/`` table that the
query path anti-joins (broadcast — tombstones are small between
vacuums).  Two consolidation tiers: ``merge_delta_epochs`` rebuilds
ALL delta epochs into one (cost ∝ delta size — the LSM property),
and ``vacuum`` rewrites everything, dropping tombstoned ids and
re-merging each term's segments (N3) — after it the index is
bit-equivalent to a fresh build of the surviving corpus.

Scale posture: append writes only the delta (one new epoch dir);
tombstone touches only the stats + tombstone table (O(deleted docs)
work: the terms of a dead doc are recovered by range-filtered block
decode on ``first_doc_id/last_doc_id``, not a full index scan);
delta consolidation costs O(deltas); vacuum is the only full rewrite
and is resumable the same way a build is.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import fsutil
from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.compact import (
    assign_doc_ids,
    bucket_col,
    compact_postings,
    compact_postings_withlen,
    decode_segments,
    merge_segments,
)
from search_engine_spark.operators.postings import (
    build_postings,
    compute_stoplist,
    term_stats,
)
from search_engine_spark.plans.build import (
    MANIFEST_SCHEMA,
    delta_epoch_dirs,
    ensure_segments_readable,
    load_compact_index,
    read_segments,
    table_path,
)
from search_engine_spark.sources.pages import enrich_pages

TOMBSTONE_SCHEMA = "doc_id long, url string, removed_at double"

# Latency-sized-op driver fast paths (same rationale as the append's
# driver bloom probe): below these sizes the data fits comfortably in
# driver memory and the Spark job's fixed orchestration dominates the
# actual work, so the op runs via pyarrow/numpy on the driver with the
# distributed path as the exact fallback.  Both venues compute the
# same answer by construction (shared codec / layout).
DRIVER_DELTA_WRITE_CAP = 50_000  # delta docs
DRIVER_TOMB_DECODE_CAP = 20_000  # newly-dead doc ids


def _with_maintenance_conf(fn):
    """Run a maintenance op under AQE partition coalescing (the same
    scoped conf the build uses for its small-table writes): every
    shuffle inside these ops is delta- or stats-sized, so the static
    ``shuffle.partitions`` fan-out turns each of the op's many small
    jobs into a tiny-task + small-files storm — latency at fixture
    scale, a commit/file-listing tax at real scale.  AQE's 64 MB
    advisory only coalesces below-target partitions, so a genuinely
    large delta (bulk append) keeps its width."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, *args, **kwargs):
        from search_engine_spark.util import scoped_conf

        with scoped_conf(
            spark,
            **{
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.coalescePartitions.enabled":
                    "true",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                    "64m",
            },
        ):
            return fn(spark, *args, **kwargs)

    return wrapper


def _stats(out_dir: str) -> dict:
    # fsutil (Hadoop FileSystem API) so maintenance works on
    # hdfs://- and s3a://-resident indexes, not only local paths
    return json.loads(
        fsutil.read_text(os.path.join(out_dir, "stats.json"))
    )


def _write_stats(out_dir: str, meta: dict) -> None:
    """ATOMIC descriptor replacement: write to a temp file, then
    rename over stats.json (FileContext OVERWRITE — the same
    primitive Iceberg's HadoopCatalog commit uses).  A concurrent
    reader sees the complete old or the complete new descriptor,
    never a torn write."""
    path = os.path.join(out_dir, "stats.json")
    tmp = path + "." + uuid.uuid4().hex[:8] + ".tmp"
    fsutil.write_text(tmp, json.dumps(meta))
    fsutil.rename_overwrite(tmp, path)


def _gen_rel(table: str, gen: int) -> str:
    """Generation-suffixed relative dir for a table rewrite."""
    return f"{table}_g{gen}"


def _expire_retired(out_dir: str, meta: dict) -> None:
    """Delete data dirs retired by PREVIOUS commits (default snapshot
    retention = one maintenance interval: a reader that loaded the
    pre-previous descriptor has had a full op's lifetime to finish).
    Runs at the START of every maintenance op, before any new write —
    the Iceberg expire_snapshots analog.

    With ``snapshot_retention = N > 0`` (see
    :func:`set_snapshot_retention`), dirs referenced by the last N
    archived generation descriptors survive expiry, keeping those
    generations readable via :func:`open_index_at`; they stay on the
    ``retired`` list and are deleted once they age out of the
    window."""
    retired = list(meta.get("retired") or [])
    if not retired:
        meta["retired"] = []
        return
    keep = int(meta.get("snapshot_retention", 0))
    referenced: set[str] = set()
    if keep > 0:
        cur_gen = int(meta.get("gen", 0))
        for g in range(max(0, cur_gen - keep), cur_gen):
            try:
                m = json.loads(
                    fsutil.read_text(
                        os.path.join(
                            out_dir, SNAPSHOT_DIR, f"gen-{g}.json"
                        )
                    )
                )
            except Exception:
                continue
            paths = m.get("paths") or {}
            for t in (
                "index", "docs", "term_stats", "site_stats",
                "index_deltas", "tombstones", "url_bloom",
            ):
                referenced.add(paths.get(t, t))
            # epoch-level references: tiered merges retire individual
            # epoch SUBDIRS of a still-live deltas root — a retained
            # generation whose delta_epochs names such an epoch must
            # keep it readable
            deltas_rel = paths.get("index_deltas", "index_deltas")
            for e in m.get("delta_epochs") or []:
                referenced.add(f"{deltas_rel}/{e}")
        # the positional index lives at a FIXED path (no descriptor
        # names its generations), so vacuum's retired pre-rewrite dir
        # is protected by its generation NUMBER: positions_retired_gG
        # was the live positional data of every generation < G, and
        # stays readable while any such generation is retained
        cutoff = max(0, cur_gen - keep)
        for rel in retired:
            mnum = re.match(r"positions_retired_g(\d+)$", rel)
            if mnum and int(mnum.group(1)) > cutoff:
                referenced.add(rel)
    still = []
    for rel in retired:
        if rel in referenced:
            still.append(rel)
        else:
            fsutil.delete(os.path.join(out_dir, rel))
    meta["retired"] = still


def expire_now(out_dir: str) -> list[str]:
    """Run snapshot expiry immediately (the maintain CLI's ``expire``
    op) instead of waiting for the next maintenance op.  Honors
    ``snapshot_retention``.  Returns the dirs actually deleted."""
    meta = _stats(out_dir)
    before = list(meta.get("retired") or [])
    _expire_retired(out_dir, meta)
    gone = [r for r in before if r not in (meta.get("retired") or [])]
    if gone:
        _commit(out_dir, meta)
    return gone


def set_snapshot_retention(out_dir: str, keep: int) -> dict:
    """Keep the last ``keep`` PAST generations readable for
    :func:`open_index_at` (0 = only the current generation is
    guaranteed — the default).  Commits a new generation so the
    setting itself is snapshot-recorded."""
    meta = _stats(out_dir)
    meta["snapshot_retention"] = int(keep)
    _commit(out_dir, meta)
    return {"snapshot_retention": int(keep), "gen": meta["gen"]}


def _commit(
    out_dir: str,
    meta: dict,
    new_paths: dict | None = None,
    retire: tuple | list = (),
) -> None:
    """Flip the snapshot: point ``paths`` at the new generation dirs
    and atomically replace stats.json.  Old dirs go on the ``retired``
    list (deleted by the NEXT op's :func:`_expire_retired`), so every
    already-loaded CompactIndex keeps reading its own consistent
    generation.  A crash BEFORE this call leaves only orphaned
    ``*_gN`` dirs — the committed snapshot is untouched and a retried
    op overwrites them (all generation writes use mode=overwrite)."""
    paths = dict(meta.get("paths") or {})
    if new_paths:
        paths.update(new_paths)
    meta["paths"] = paths
    meta["gen"] = int(meta.get("gen", 0)) + 1
    meta["retired"] = sorted(
        set(meta.get("retired") or []) | {r for r in retire if r}
    )
    _write_stats(out_dir, meta)
    archive_snapshot(out_dir, meta)


SNAPSHOT_DIR = "snapshots"


def archive_snapshot(out_dir: str, meta: dict) -> None:
    """Keep a per-generation copy of the committed descriptor
    (``snapshots/gen-N.json``) — the Iceberg metadata-file analog.
    Descriptors are tiny and kept forever; a generation stays READABLE
    only until a later op's :func:`_expire_retired` deletes a data dir
    it references (validated at :func:`snapshot_descriptor` time)."""
    fsutil.write_text(
        os.path.join(out_dir, SNAPSHOT_DIR, f"gen-{int(meta.get('gen', 0))}.json"),
        json.dumps(meta),
    )


def snapshot_descriptor(out_dir: str, gen: int | None = None) -> dict:
    """The committed descriptor of generation ``gen`` (current when
    None), validated: every data dir the snapshot references must
    still exist, else ``SnapshotExpiredError`` names what's gone."""
    cur = _stats(out_dir)
    if gen is None or int(gen) == int(cur.get("gen", 0)):
        return cur
    path = os.path.join(out_dir, SNAPSHOT_DIR, f"gen-{int(gen)}.json")
    try:
        meta = json.loads(fsutil.read_text(path))
    except Exception:
        raise SnapshotExpiredError(
            f"no archived descriptor for generation {gen} "
            f"(snapshots are archived from the first maintenance "
            f"commit on; current gen is {cur.get('gen', 0)})"
        ) from None
    missing = []
    for table in ("index", "docs", "term_stats", "site_stats"):
        rel = (meta.get("paths") or {}).get(table, table)
        if not fsutil.exists(os.path.join(out_dir, rel)):
            missing.append(rel)
    deltas_rel = (meta.get("paths") or {}).get(
        "index_deltas", "index_deltas"
    )
    for ep in meta.get("delta_epochs") or []:
        if not fsutil.exists(os.path.join(out_dir, deltas_rel, ep)):
            missing.append(f"{deltas_rel}/{ep}")
    if missing:
        raise SnapshotExpiredError(
            f"generation {gen} is expired: data dirs "
            f"{sorted(missing)} were retired by a later maintenance "
            f"op (retention = one maintenance interval)"
        )
    return meta


class SnapshotExpiredError(RuntimeError):
    """A time-travel read referenced a generation whose data dirs
    have been expired (or never archived)."""


def list_snapshots(spark: SparkSession, out_dir: str) -> list[int]:
    """Archived generation numbers, ascending (current committed gen
    is always implicitly readable even when not in this list)."""
    import re as _re

    try:
        names = fsutil.listdir(os.path.join(out_dir, SNAPSHOT_DIR), spark)
    except Exception:
        return []
    out = []
    for n in names:
        m = _re.fullmatch(r"gen-(\d+)\.json", n.rsplit("/", 1)[-1])
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_tombstones(
    spark: SparkSession, out_dir: str, meta: dict | None = None
) -> DataFrame | None:
    if meta is None:
        try:
            meta = _stats(out_dir)
        except Exception:
            meta = {}
    try:
        return spark.read.parquet(
            table_path(out_dir, "tombstones", meta)
        )
    except Exception:
        return None


def _live_docs(
    spark: SparkSession, out_dir: str, meta: dict | None = None
) -> DataFrame:
    meta = _stats(out_dir) if meta is None else meta
    docs = spark.read.parquet(table_path(out_dir, "docs", meta))
    tomb = read_tombstones(spark, out_dir, meta)
    if tomb is not None:
        docs = docs.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    return docs


def _recompute_scalar_stats(
    spark: SparkSession, out_dir: str, meta: dict
) -> dict:
    # meta's (possibly pending, pre-commit) paths decide which
    # generation the recompute reads.  Full-scan path: used by vacuum
    # (the one op that is O(corpus) by design) and as the bootstrap
    # for legacy descriptors missing the exact ``sum_len`` — append/
    # tombstone normally go through :func:`_apply_scalar_delta`.
    live = _live_docs(spark, out_dir, meta)
    agg = live.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n = int(agg["n"] or 0)
    meta["n_docs"] = n
    meta["sum_len"] = int(agg["s"] or 0)
    meta["avg_len"] = (int(agg["s"]) / n) if n else 0.0
    return meta


def _apply_scalar_delta(
    spark: SparkSession,
    out_dir: str,
    meta: dict,
    dn: int,
    dsum: int,
    recompute_includes_delta: bool = True,
) -> dict:
    """O(1) scalar-stats maintenance: n_docs/avg_len from the
    committed exact ``sum_len`` plus this op's delta — no docs-table
    scan.  Sound inductively: build seeds the exact integer sum,
    append adds only genuinely-new live rows, tombstone subtracts
    exactly the newly-dead rows, vacuum re-syncs from scratch.  At
    10^12 docs this is the difference between O(delta) and O(corpus)
    work per maintenance op.  Legacy descriptors (no ``sum_len``)
    bootstrap through one full recompute, after which the exact sum
    is carried forward; ``recompute_includes_delta`` says whether the
    tables that recompute reads already reflect this op's delta
    (tombstone: yes — the pending tombstone table is written; append:
    no — it runs before the docs append, so the delta is added on
    top)."""
    if "sum_len" not in meta:
        _recompute_scalar_stats(spark, out_dir, meta)
        if recompute_includes_delta:
            return meta
        dn, dsum = int(dn), int(dsum)
    n = int(meta["n_docs"]) + int(dn)
    s = int(meta["sum_len"]) + int(dsum)
    meta["n_docs"] = n
    meta["sum_len"] = s
    meta["avg_len"] = (s / n) if n else 0.0
    return meta


def _incremental_stoplist(
    spark: SparkSession,
    out_dir: str,
    meta: dict,
    delta_terms: DataFrame,
    old_stoplist: list[str],
    ts_df: DataFrame | None = None,
) -> dict:
    """Append-only stoplist maintenance (R14): every df delta is
    non-negative, so the new top-K provably lies within old-top-K ∪
    {terms whose df changed} — a term outside both kept its df while
    each old top-K member's df only grew, and the (df desc, term asc)
    tie-break is stable under weak increase.  Restricting the top-K
    scan to that candidate set makes it O(delta + K) instead of
    O(vocab); tombstone/vacuum (decrements — any term can be
    promoted) keep the full :func:`_recompute_stoplist`.

    ``ts_df`` lets the caller pass the NEW term_stats as an in-memory
    plan so this top-K runs CONCURRENTLY with (instead of after) that
    table's write — rows identical by construction."""
    ts = (
        ts_df
        if ts_df is not None
        else spark.read.parquet(
            table_path(out_dir, "term_stats", meta)
        )
    )
    old = spark.createDataFrame(
        [(t,) for t in old_stoplist], "term string"
    )
    cand = ts.join(
        delta_terms.select("term").unionByName(old).distinct(),
        "term",
        "left_semi",
    )
    meta["stoplist"] = list(
        compute_stoplist(cand, meta["n_docs"], meta["stoplist_size"])
    )
    return meta


def _recompute_stoplist(
    spark: SparkSession, out_dir: str, meta: dict,
    ts_df: DataFrame | None = None,
) -> dict:
    """Full top-K over term_stats; ``ts_df`` (an in-memory plan of
    the same rows) lets it run concurrently with that table's
    write."""
    ts = (
        ts_df
        if ts_df is not None
        else spark.read.parquet(
            table_path(out_dir, "term_stats", meta)
        )
    )
    meta["stoplist"] = list(
        compute_stoplist(ts, meta["n_docs"], meta["stoplist_size"])
    )
    return meta


def terms_of_docs(segments: DataFrame, doc_ids: list[int]) -> DataFrame:
    """R4 equivalent: (term, doc_id) pairs for the given docs,
    decoding only blocks whose [first,last] id-range can contain
    them.  Doc ids are id-segment-clustered (operators/compact.
    assign_doc_ids), so a min/max envelope filter skips most blocks;
    exact per-id OR-chains are added only for small batches."""
    lo, hi = min(doc_ids), max(doc_ids)
    blocks = segments.filter(
        (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
    )
    if len(doc_ids) <= 64:
        cond = F.lit(False)
        for d in doc_ids:
            cond = cond | (
                (F.col("first_doc_id") <= d) & (F.col("last_doc_id") >= d)
            )
        blocks = blocks.filter(cond)
    hits = decode_segments(blocks)
    return hits.filter(F.col("doc_id").isin(doc_ids)).select(
        "term", "doc_id"
    )


def _append_manifest_rows(
    spark: SparkSession, out_dir: str, rows: list[tuple]
) -> None:
    """Append lineage rows to ``manifest/`` driver-side (pyarrow): a
    one-row createDataFrame→parquet append is a whole Spark job
    (~0.3–0.5 s of fixed orchestration per maintenance op) for a few
    hundred bytes.  The part-file written here is schema-identical to
    the Spark writer's (MANIFEST_SCHEMA: int/string/long/long/
    double/string), so readers (``read_manifest``/``done_buckets``)
    see one homogeneous table.  Any failure (e.g. a filesystem
    pyarrow can't reach) falls back to the Spark writer."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_spark.plans.local_serve import _fs_path

        fs, root = _fs_path(os.path.join(out_dir, "manifest"))
        fs.create_dir(root, recursive=True)
        schema = pa.schema(
            [
                pa.field("bucket", pa.int32()),
                pa.field("status", pa.string()),
                pa.field("postings", pa.int64()),
                pa.field("blocks", pa.int64()),
                pa.field("built_at", pa.float64()),
                pa.field("build_id", pa.string()),
            ]
        )
        cols = list(zip(*rows))
        table = pa.table(
            {
                f.name: pa.array(list(c), type=f.type)
                for f, c in zip(schema, cols)
            },
            schema=schema,
        )
        # write under a non-parquet temp name and rename into place:
        # a mid-stream failure must not leave a truncated
        # part-*.parquet that both corrupts manifest readers AND gets
        # duplicated by the Spark fallback below (ADVICE r04)
        name = f"part-{uuid.uuid4().hex}-drv.parquet"
        tmp = root + f"/.{name}.tmp"
        try:
            with fs.open_output_stream(tmp) as sink:
                pq.write_table(table, sink)
            fs.move(tmp, root + f"/{name}")
        except Exception:
            try:
                fs.delete_file(tmp)
            except Exception:
                pass
            raise
    except Exception:
        spark.createDataFrame(rows, MANIFEST_SCHEMA).write.mode(
            "append"
        ).parquet(os.path.join(out_dir, "manifest"))


def _driver_bloom_probe(
    bloom_dir: str,
    urls: list[str],
    m_bits: int,
    k: int,
    cap: int,
) -> list[str]:
    """Bloom-positive urls of ``urls``, computed entirely on the
    driver: pyarrow reads the set-bit table (≤ m_bits longs), the
    XXH64 twin maps each url to its k bit positions, sorted-array
    membership does the rest.  Zero Spark jobs; exact same positives
    as :func:`operators.bloom.bloom_contains` by bit-parity."""
    import numpy as np
    import pyarrow.dataset as ds

    from search_engine_spark.functions.xxh64 import bloom_bits_py
    from search_engine_spark.plans.local_serve import _fs_path

    fs, root = _fs_path(bloom_dir)
    bits = np.sort(
        ds.dataset(root, filesystem=fs)
        .to_table(columns=["bit"])
        .column("bit")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if bits.size == 0:
        return []
    probe = np.array(
        [b for u in urls for b in bloom_bits_py(u, m_bits, k)],
        dtype=np.int64,
    ).reshape(len(urls), k)
    pos = np.searchsorted(bits, probe)
    pos[pos == bits.size] = 0
    hit = (bits[pos] == probe).all(axis=1)
    return [u for u, h in zip(urls, hit) if h][: cap + 1]


def _driver_write_segments(segs: DataFrame, epoch_dir: str) -> None:
    """Write a latency-sized delta's compact block rows as the
    hive-partitioned epoch dir with pyarrow on the driver.

    The Spark writer pays a full repartition shuffle plus an
    n_buckets-task write stage (~seconds of fixed orchestration) to
    place a few MB of blocks; driver-side it is ONE Arrow collect of
    the already-computed ``segs`` plan plus local parquet writes.
    Layout-identical to the Spark writer: one
    ``bucket=B/part-*.parquet`` per present bucket, bucket as a hive
    partition key (not a data column), rows term-sorted so row-group
    term min/max statistics prune (the property
    plans/local_serve.py's bucket reads rely on); the Arrow schema
    comes from the Spark plan itself, so physical parquet types match
    the Spark writer's.  Files land under temp names and rename into
    place; any failure raises and the caller's Spark writer
    (mode=overwrite) takes over."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from search_engine_spark.plans.local_serve import _fs_path

    tbl = segs.toArrow()
    sort_cols = [
        c for c in ("bucket", "term", "shard", "block_id")
        if c in tbl.column_names
    ]
    tbl = tbl.sort_by([(c, "ascending") for c in sort_cols])
    fs, root = _fs_path(epoch_dir)
    buckets = tbl.column("bucket")
    data_cols = [c for c in tbl.column_names if c != "bucket"]
    for b in pc.unique(buckets).to_pylist():
        part = tbl.filter(pc.equal(buckets, b)).select(data_cols)
        bdir = f"{root}/bucket={int(b)}"
        fs.create_dir(bdir, recursive=True)
        name = f"part-{uuid.uuid4().hex}-drv.parquet"
        tmp = f"{bdir}/.{name}.tmp"
        try:
            with fs.open_output_stream(tmp) as sink:
                pq.write_table(part, sink)
            fs.move(tmp, f"{bdir}/{name}")
        except Exception:
            try:
                fs.delete_file(tmp)
            except Exception:
                pass
            raise


def _driver_terms_dec(
    out_dir: str, meta: dict, dead_ids: list[int]
) -> dict[str, int]:
    """``{term: #dead docs in its postings}`` computed on the driver
    — the R24 df decrement for a latency-sized delete, replacing a
    distributed ``terms_of_docs`` + groupBy job pair.

    Exactly :func:`terms_of_docs`'s access path in pyarrow/numpy:
    read the same segment dirs ``read_segments`` unions (base
    ``index/`` + descriptor-visible delta epochs), filtered to block
    rows whose [first_doc_id, last_doc_id] envelope can contain a
    dead id (row-group pruned; the exact per-id OR refinement for
    small batches, like terms_of_docs), then ``decode_doc_ids`` +
    sorted-array membership per block.  Identical counts by
    construction — the codec and visibility rules are shared."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from search_engine_spark.functions.codec import decode_doc_ids
    from search_engine_spark.plans.local_serve import (
        _fs_path,
        pyarrow_segment_dirs,
    )

    fs, root = _fs_path(out_dir)
    dirs = pyarrow_segment_dirs(fs, root, meta)

    dead = np.asarray(sorted(set(int(d) for d in dead_ids)), np.int64)
    lo, hi = int(dead[0]), int(dead[-1])
    filt = (pc.field("last_doc_id") >= lo) & (
        pc.field("first_doc_id") <= hi
    )
    if dead.size <= 64:
        sub = None
        for d in dead.tolist():
            c = (pc.field("first_doc_id") <= d) & (
                pc.field("last_doc_id") >= d
            )
            sub = c if sub is None else (sub | c)
        filt = filt & sub
    from collections import Counter

    dec: Counter = Counter()
    for d in dirs:
        tbl = ds.dataset(
            d, filesystem=fs, partitioning="hive"
        ).to_table(filter=filt, columns=["term", "count", "doc_ids"])
        for term_v, cnt, buf in zip(
            tbl.column("term").to_pylist(),
            tbl.column("count").to_pylist(),
            tbl.column("doc_ids").to_pylist(),
        ):
            ids = decode_doc_ids(buf, int(cnt)).astype(np.int64)
            pos = np.searchsorted(dead, ids)
            pos[pos == dead.size] = 0
            n = int((dead[pos] == ids).sum())
            if n:
                dec[term_v] += n
    return dict(dec)


@_with_maintenance_conf
def append_pages(
    spark: SparkSession,
    out_dir: str,
    new_pages: DataFrame,
    postings_per_shard: int = 1 << 20,
    use_html: bool = False,
) -> dict:
    """Add not-yet-indexed docs.  Urls already present are ignored
    (use :func:`reindex_pages` for R25 upsert semantics).  The result
    dict carries a ``phases`` wall-clock split (guard / analysis /
    concurrent-writes / docs / commit) for maintenance-latency
    attribution."""
    phases: dict[str, float] = {}
    _t_prev = [time.time()]

    def _mark_phase(name: str) -> None:
        now = time.time()
        phases[name] = round(now - _t_prev[0], 3)
        _t_prev[0] = now

    meta = _stats(out_dir)
    _expire_retired(out_dir, meta)
    gen_next = int(meta.get("gen", 0)) + 1
    # visible epochs BEFORE this op writes its own (legacy
    # descriptors: snapshot the current listing)
    visible_epochs = meta.get("delta_epochs")
    if visible_epochs is None:
        visible_epochs = [
            p.rstrip("/").rsplit("/", 1)[-1]
            for p in delta_epoch_dirs(spark, out_dir, meta)
        ]
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    build_id = uuid.uuid4().hex[:12]

    enriched = enrich_pages(
        new_pages, use_html=use_html,
        compute_tokens=(meta["analyzer"] != "lemma"),
    )
    # LIVE urls only: a tombstoned url is re-addable (the R25 upsert
    # path tombstones the old version, then appends through here).
    #
    # Bloom guard (the visited-set scale path): without it every
    # append anti-joins the delta against the corpus-sized docs url
    # column — O(corpus) per append at 10^12 docs.  With the index's
    # url_bloom, bloom-NEGATIVE urls are definitely new (no false
    # negatives), so: zero bloom-positives → skip the join entirely;
    # a small positive set (≤ maybe_cap: true re-adds + the fpp
    # fraction) → probe docs through an IN-list predicate (parquet
    # row-group pruning, O(delta)); a large one (filter saturated or
    # a bulk re-crawl) → the exact anti-join, unchanged.  Every
    # branch is exact — the guard only decides how much of the docs
    # table the exactness check has to touch.
    ub = meta.get("url_bloom")
    if ub:
        m_b, k_b = int(ub["m_bits"]), int(ub["k"])
        cap = int(ub.get("maybe_cap", 100_000))
        # Driver-local probe fast path: a latency-sized delta's
        # membership question is milliseconds of hashing, but as a
        # Spark job it costs a distinct + k-way union + broadcast +
        # groupBy (~seconds of fixed orchestration — the measured
        # bulk of append latency).  The bloom table is ≤ m_bits rows
        # of bit positions: read it with pyarrow and probe with the
        # bit-exact XXH64 twin (functions/xxh64.py, parity-pinned by
        # tests/test_xxh64.py).  Bulk deltas (> probe_cap urls) and
        # any local-read failure fall back to the distributed probe —
        # identical answers either way, only the venue differs.
        probe_cap = int(ub.get("driver_probe_cap", 20_000))
        maybe = None
        # overlap the two independent jobs: the enriched-delta cache
        # materializes on a second driver thread (text analysis only)
        # while this thread collects the delta's urls and probes the
        # bloom locally — neither reads the other's output, and every
        # later step needs both
        from concurrent.futures import ThreadPoolExecutor

        enriched = enriched.cache()
        with ThreadPoolExecutor(max_workers=1) as pre:
            enrich_fut = pre.submit(enriched.count)
            url_sample = [
                r["url"]
                for r in new_pages.select("url").distinct()
                .limit(probe_cap + 1).collect()
            ]
            if len(url_sample) <= probe_cap:
                try:
                    maybe = _driver_bloom_probe(
                        table_path(out_dir, "url_bloom", meta),
                        url_sample, m_b, k_b, cap,
                    )
                except Exception:
                    maybe = None
            enrich_fut.result()
        if maybe is None:
            from search_engine_spark.operators.bloom import (
                bloom_contains,
            )

            bloom = spark.read.parquet(
                table_path(out_dir, "url_bloom", meta)
            )
            maybe = [
                r["key"]
                for r in bloom_contains(
                    bloom, new_pages.select("url"), "url", m_b, k_b
                )
                .filter(F.col("might_contain"))
                .select("key")
                .limit(cap + 1)
                .collect()
            ]
        _mark_phase("guard_bloom")
        if not maybe:
            fresh = enriched.cache()
        elif len(maybe) <= cap:
            docs0 = spark.read.parquet(
                table_path(out_dir, "docs", meta)
            ).filter(F.col("url").isin(maybe)).select("doc_id", "url")
            tomb0 = read_tombstones(spark, out_dir, meta)
            if tomb0 is not None:
                docs0 = docs0.join(
                    F.broadcast(tomb0.select("doc_id")),
                    "doc_id", "left_anti",
                )
            fresh = enriched.join(
                docs0.select("url"), "url", "left_anti"
            ).cache()
        else:
            existing = _live_docs(spark, out_dir, meta).select("url")
            fresh = enriched.join(existing, "url", "left_anti").cache()
    else:
        existing = _live_docs(spark, out_dir, meta).select("url")
        fresh = enriched.join(existing, "url", "left_anti").cache()
    # one action materializes the cache AND yields the exact Σ doc_len
    # the O(1) scalar-stats update below needs (no second agg job)
    fagg = fresh.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n_new = int(fagg["n"])
    dsum = int(fagg["s"] or 0)
    _mark_phase("guard")
    if n_new == 0:
        return {"build_id": build_id, "appended": 0}

    # fresh id-segments so appended ids never collide with old ones
    seg_base = int(meta.get("next_id_segment", 1 << 20))
    delta_segments = max(8, min(256, n_new // 1000 + 1))
    from search_engine_spark.operators.postings import doc_lens_table

    doc_map = assign_doc_ids(
        doc_lens_table(fresh, "url"), "url", delta_segments
    ).withColumn(
        "doc_id",
        F.col("doc_id") + F.lit(seg_base << 40).cast("long"),
    ).cache()

    # the delta postings feed the segment compaction AND the df
    # merge; cached so the Arrow analysis UDF runs over the delta
    # exactly ONCE (uncached it re-lemmatized the delta for the
    # salt-factor broadcast and again for the main compaction scan)
    post = build_postings(fresh, "url", meta["analyzer"]).cache()
    delta_ts = term_stats(post).cache()
    # force-materialize every cache the concurrent writes below
    # share, in dependency order (one analysis pass, one tiny agg):
    # racing threads would otherwise each kick off the UDF pass
    # before the first result lands in the block store
    doc_map.count()
    n_post = int(post.count())
    delta_ts.count()
    _mark_phase("analysis")
    # block metadata built with blocks_avg_len so every segment in the
    # index shares one metadata baseline (WAND gating, plans/wand.py)
    blocks_avg = meta.get("blocks_avg_len", meta["avg_len"])
    if (not blocks_avg or blocks_avg <= 0) and n_post > 0:
        # gated on n_post: doc_len counts tokens BEFORE the particle
        # filter, so a delta can carry doc length yet zero postings —
        # consuming the one-shot re-anchor on it would leave the real
        # first blocks built against a stale baseline (WAND metadata
        # drift, pruning silently disabled until vacuum).
        # a zero baseline can only come from a zero-postings index
        # (bootstrap-empty build: no tokens anywhere → avg_len 0), so
        # there are NO existing blocks to stay consistent with —
        # re-anchor the shared baseline at the post-append average.
        # Left at 0, every delta block's max_u would be computed
        # against avg_len=0 (division by zero; bounds pinned to 0),
        # and WAND's upper-bound gating could wrongly prune blocks
        # holding real results once postings grow past min_cand.
        prev_sum = int(meta.get("sum_len", 0) or 0)
        prev_n = int(meta.get("n_docs", 0) or 0)
        denom = prev_n + n_new
        blocks_avg = (prev_sum + dsum) / denom if denom else 1.0
        meta["blocks_avg_len"] = blocks_avg
    segs = compact_postings(
        post, doc_map, delta_ts, blocks_avg, "url", config,
        postings_per_shard,
    )
    # delta_ts drives the same merge bypass a fresh build gets: a
    # delta term under postings_per_shard has a single sorted run
    # already (no shuffle + Python merge cycle for the whole tail)
    segs = merge_segments(
        segs, blocks_avg, config,
        term_stats=delta_ts, postings_per_shard=postings_per_shard,
    )
    # block identity must be unique across appends: delta shards would
    # otherwise restart at 0 and collide with existing (term, shard,
    # block_id) keys — ambiguous for WAND's packed selected-block
    # filter (plans/wand.py).  Each append gets a fresh 16-bit shard
    # epoch (salt ids are < 2^16 by config.max_salt ≪ 2^16).
    epoch = int(meta.get("append_epoch", 0)) + 1
    segs = segs.withColumn(
        "shard",
        (F.col("shard") + F.lit(epoch << 16)).cast("int"),
    )
    segs = segs.withColumn("bucket", bucket_col(F.col("term"), n_buckets))

    # LSM-style: each append lands in its OWN epoch directory under
    # the deltas dir (never appended into the base index files), so
    # merge_delta_epochs can consolidate deltas proportionally to
    # delta size and vacuum/merges can drop whole directories.
    # INVISIBLE until commit: readers resolve epochs through the
    # descriptor's delta_epochs list, which doesn't name this one yet.
    def _write_delta_segments() -> None:
        epoch_dir = os.path.join(
            table_path(out_dir, "index_deltas", meta),
            f"epoch={epoch}",
        )
        # latency-sized delta: ONE Arrow collect + driver-side
        # parquet writes instead of a repartition shuffle plus an
        # n_buckets-task write stage; identical layout either way
        if n_new <= DRIVER_DELTA_WRITE_CAP:
            try:
                _driver_write_segments(segs, epoch_dir)
                return
            except Exception:
                pass  # fall through to the distributed writer
        (
            segs.repartition(n_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(epoch_dir)
        )

    # positional-index co-maintenance: when the build wrote a
    # compressed positional index (jobs/build_index.py --positions),
    # append the delta pages' positional rows keyed by their NEW
    # dense doc_ids — stale rows of re-added/reindexed urls reference
    # tombstoned ids and drop at the query-time liveness join, so
    # phrase/near correctness survives maintenance with no rewrite
    pos_dir = out_dir.rstrip("/") + "/positions"
    appended_positions = fsutil.exists(pos_dir, spark)

    def _append_positions() -> None:
        from search_engine_spark.operators.phrases import (
            compact_positions,
            positional_meta,
            positional_postings,
        )

        pos_src = fresh
        if "tokens" not in pos_src.columns:
            from search_engine_spark.functions.textproc import (
                tokens_col,
            )

            pos_src = pos_src.withColumn(
                "tokens", tokens_col(F.col("text"), F.col("lang"))
            )
        pos_src = pos_src.join(
            doc_map.select("doc_id", "url"), "url"
        )
        # bucket count from the positional index's OWN meta — it may
        # legitimately differ from the tf index's bucket count
        nb_pos = int(positional_meta(spark, pos_dir)["n_buckets"])
        packed = compact_positions(
            positional_postings(pos_src, "doc_id"), "doc_id"
        ).withColumn("bucket", bucket_col(F.col("term"), nb_pos))
        (
            packed.repartition(nb_pos, F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(pos_dir)
        )

    # derived stats: df = old + delta (R10 batch form), written to a
    # FRESH generation dir — the committed term_stats is never
    # touched, so readers of the current snapshot stay consistent and
    # no tmp/swap ordering is needed.  Still written BEFORE the docs
    # append: ``fresh`` (and thus delta_ts) anti-joins the docs table,
    # and writing docs/ would invalidate its cache and re-evaluate
    # the delta to empty.
    old_ts_rel = (meta.get("paths") or {}).get(
        "term_stats", "term_stats"
    )
    old_ts = spark.read.parquet(table_path(out_dir, "term_stats", meta))
    merged = (
        old_ts.join(delta_ts.withColumnRenamed("df", "df2"), "term",
                    "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df2", F.lit(0)))
            .alias("df"),
        )
    )
    ts_rel = _gen_rel("term_stats", gen_next)

    # pending view: the descriptor this commit will publish
    old_ss_rel = (meta.get("paths") or {}).get(
        "site_stats", "site_stats"
    )
    ss_rel = _gen_rel("site_stats", gen_next)
    pending = dict(meta)
    pending["paths"] = {
        **(meta.get("paths") or {}),
        "term_stats": ts_rel,
        "site_stats": ss_rel,
    }

    # O(1) scalar stats first (pure arithmetic off the committed
    # sum_len + this delta's exact sums — no job): the stoplist
    # top-K below scores candidates against the post-append n_docs
    _apply_scalar_delta(
        spark, out_dir, pending, n_new, dsum,
        recompute_includes_delta=False,
    )

    def _write_term_stats() -> None:
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, ts_rel)
        )

    def _stoplist_task() -> None:
        # candidate-restricted top-K over the NEW df — fed the
        # in-memory ``merged`` plan, so it runs CONCURRENTLY with
        # the term_stats write instead of chaining behind it
        _incremental_stoplist(
            spark, out_dir, pending, delta_ts,
            list(meta.get("stoplist") or []),
            ts_df=merged,
        )

    def _write_site_stats() -> None:
        # O(delta): per-site counts from the cached delta, merged
        # into the committed (site, pages) table — never a docs scan
        _merge_site_stats(
            spark, out_dir, meta,
            doc_map.groupBy("site").agg(
                F.count(F.lit(1)).cast("long").alias("d")
            ),
            ss_rel,
        )

    # url-bloom maintenance: filter' = filter OR build(delta urls)
    # (bloom_merge linearity) into a fresh generation dir; indexes
    # without one bootstrap it here from the pre-append live urls ∪
    # delta (one O(corpus) pass the anti-join was paying anyway).
    from search_engine_spark.config import DEFAULT as _DEF

    bloom_commit = {}
    bloom_retire = []
    bloom_task = None
    if ub or _DEF.url_bloom_enabled:
        from search_engine_spark.operators.bloom import (
            bloom_build,
            bloom_merge,
        )

        if ub:
            m_b, k_b = int(ub["m_bits"]), int(ub["k"])
            new_bloom = bloom_merge(
                spark.read.parquet(
                    table_path(out_dir, "url_bloom", meta)
                ),
                bloom_build(fresh.select("url"), "url", m_b, k_b),
            )
            bloom_retire.append(
                (meta.get("paths") or {}).get("url_bloom", "url_bloom")
            )
            n_keys = int(ub.get("n_keys", 0)) + n_new
        else:
            m_b, k_b = _DEF.url_bloom_m_bits, _DEF.url_bloom_k
            new_bloom = bloom_build(
                _live_docs(spark, out_dir, meta)
                .select("url")
                .unionByName(fresh.select("url")),
                "url", m_b, k_b,
            )
            n_keys = int(meta.get("n_docs", 0)) + n_new
        bloom_rel = _gen_rel("url_bloom", gen_next)

        def bloom_task() -> None:
            new_bloom.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, bloom_rel)
            )

        bloom_commit = {"url_bloom": bloom_rel}
        meta["url_bloom"] = {
            "m_bits": m_b,
            "k": k_b,
            "n_keys": n_keys,
            "maybe_cap": int(
                (ub or {}).get("maybe_cap", _DEF.url_bloom_maybe_cap)
            ),
        }

    # the five delta-derived table writes (delta segments,
    # term_stats→stoplist chain, site_stats, url_bloom, positions)
    # are mutually independent — each reads only committed tables
    # plus cached delta frames (fresh / doc_map / post / delta_ts,
    # all force-materialized above) — so they are submitted on
    # concurrent driver threads and Spark schedules them in parallel:
    # ~5 sequential job barriers collapse into one.  The docs append
    # below still waits for ALL of them, preserving the ordering
    # hazard documented above: every one of these descends from the
    # anti-join against docs/, so a cache-evicted re-evaluation after
    # the append would see the delta as empty.
    from concurrent.futures import ThreadPoolExecutor

    # a delta whose pages carry NO postings (empty/all-stoplisted
    # text) must not write — or commit — an epoch at all: an epoch
    # dir with no parquet files breaks every later reader
    # (spark.read.parquet cannot infer a schema from it, and
    # LocalIndex raises LocalSnapshotError for a missing dir), and
    # the docs themselves are fully represented by the docs append +
    # scalar-stat updates below
    tasks = [_write_term_stats, _stoplist_task, _write_site_stats]
    if n_post > 0:
        tasks.insert(0, _write_delta_segments)
    if bloom_task is not None:
        tasks.append(bloom_task)
    if appended_positions:
        tasks.append(_append_positions)

    def _timed_task(t):
        def run():
            t0 = time.time()
            t()
            phases[f"w_{t.__name__.strip('_')}"] = round(
                time.time() - t0, 3
            )
        return run

    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futs = [pool.submit(_timed_task(t)) for t in tasks]
        for f in futs:
            f.result()
    _mark_phase("concurrent_writes")

    # docs append is ADDITIVE in place: rows for uncommitted doc_ids
    # are inert for concurrent readers (their postings epoch is not
    # in any committed delta_epochs list, and n_docs/avg_len flip
    # only at commit)
    doc_map.write.mode("append").parquet(
        table_path(out_dir, "docs", meta)
    )
    _mark_phase("docs")

    meta["next_id_segment"] = seg_base + delta_segments
    meta["append_epoch"] = epoch
    meta["delta_epochs"] = list(visible_epochs) + (
        [f"epoch={epoch}"] if n_post > 0 else []
    )
    meta["n_docs"] = pending["n_docs"]
    meta["sum_len"] = pending["sum_len"]
    meta["avg_len"] = pending["avg_len"]
    meta["stoplist"] = pending["stoplist"]
    _commit(
        out_dir, meta,
        new_paths={
            "term_stats": ts_rel,
            "site_stats": ss_rel,
            **bloom_commit,
        },
        retire=[old_ts_rel, old_ss_rel, *bloom_retire],
    )

    _append_manifest_rows(
        spark, out_dir,
        [(None, "append", int(n_new), None, time.time(), build_id)],
    )
    _mark_phase("commit")
    return {
        "build_id": build_id,
        "appended": n_new,
        "appended_positions": appended_positions,
        "phases": phases,
    }


@_with_maintenance_conf
def tombstone_urls(
    spark: SparkSession, out_dir: str, urls: list[str]
) -> dict:
    """R23+R24: logically delete pages; df decremented via the dead
    docs' term lists, scalar stats recomputed from live docs.

    Snapshot-committed: the new tombstone table (old rows ∪ new) and
    the decremented term_stats land in fresh generation dirs and
    become visible in ONE atomic stats.json flip — a concurrent
    reader never sees the tombstones applied without the matching
    df/stoplist/avg_len."""
    meta = _stats(out_dir)
    _expire_retired(out_dir, meta)
    gen_next = int(meta.get("gen", 0)) + 1

    docs = spark.read.parquet(table_path(out_dir, "docs", meta))
    tomb = read_tombstones(spark, out_dir, meta)
    # site/doc_len ride along so the stats tables can be maintained
    # from exactly the newly-dead rows (O(deleted)), not rescanned
    dead = docs.filter(F.col("url").isin(urls)).select(
        "doc_id", "url", "site", "doc_len"
    )
    if tomb is not None:
        dead = dead.join(
            tomb.select("doc_id"), "doc_id", "left_anti"
        )
    dead_rows = dead.collect()
    if not dead_rows:
        return {"tombstoned": 0}
    dead_ids = [r["doc_id"] for r in dead_rows]

    # R24 df decrement: latency-sized deletes decode the dead docs'
    # term lists on the driver (pyarrow range-filtered block read +
    # numpy membership — same venue shift as the append's bloom
    # probe); bulk deletes and any local-read failure use the
    # distributed decode.  Counts identical by construction.
    dec_counts = None
    if len(dead_ids) <= DRIVER_TOMB_DECODE_CAP:
        try:
            dec_counts = _driver_terms_dec(out_dir, meta, dead_ids)
        except Exception:
            dec_counts = None
    if dec_counts is not None:
        dec = F.broadcast(
            spark.createDataFrame(
                sorted(
                    (t, int(c)) for t, c in dec_counts.items()
                ),
                "term string, dec long",
            )
        )
    else:
        segments = read_segments(spark, out_dir, meta)
        dec = (
            terms_of_docs(segments, dead_ids)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("dec"))
        )
    old_ts_rel = (meta.get("paths") or {}).get(
        "term_stats", "term_stats"
    )
    old_ts = spark.read.parquet(table_path(out_dir, "term_stats", meta))
    new_ts = (
        old_ts.join(dec, "term", "left")
        .select(
            "term",
            (F.col("df") - F.coalesce("dec", F.lit(0))).alias("df"),
        )
        .filter(F.col("df") > 0)  # decrement-or-DELETE (R24)
    )
    ts_rel = _gen_rel("term_stats", gen_next)

    now = time.time()
    new_tomb = spark.createDataFrame(
        [(int(r["doc_id"]), r["url"], now) for r in dead_rows],
        TOMBSTONE_SCHEMA,
    )
    if tomb is not None:
        new_tomb = tomb.unionByName(new_tomb)
    old_tomb_rel = (
        (meta.get("paths") or {}).get("tombstones", "tombstones")
        if tomb is not None
        else None
    )
    tomb_rel = _gen_rel("tombstones", gen_next)

    old_ss_rel = (meta.get("paths") or {}).get(
        "site_stats", "site_stats"
    )
    ss_rel = _gen_rel("site_stats", gen_next)
    pending = dict(meta)
    pending["paths"] = {
        **(meta.get("paths") or {}),
        "term_stats": ts_rel,
        "tombstones": tomb_rel,
        "site_stats": ss_rel,
    }
    # O(1) scalar stats first (arithmetic off the already-collected
    # dead rows): the stoplist recompute below scores against the
    # post-delete n_docs.  Legacy descriptors (no stored sum_len)
    # bootstrap from the COMMITTED snapshot — the new tombstone table
    # is written concurrently BELOW, so a recompute through the
    # pending paths would find no tombstones at all and overcount;
    # seeding the exact sum from the old generation and applying this
    # op's delta arithmetically is equivalent and order-independent.
    if "sum_len" not in pending:
        boot = dict(meta)
        boot["paths"] = dict(meta.get("paths") or {})
        _recompute_scalar_stats(spark, out_dir, boot)
        pending["n_docs"] = boot["n_docs"]
        pending["sum_len"] = boot["sum_len"]
    _apply_scalar_delta(
        spark, out_dir, pending,
        -len(dead_rows),
        -sum(int(r["doc_len"]) for r in dead_rows),
    )
    # O(deleted) stats maintenance from the already-collected dead
    # rows — no live-docs rescan (the rows were collected above to
    # build the tombstone table, so this costs nothing extra)
    from collections import Counter

    site_dec = Counter(r["site"] for r in dead_rows)
    delta_counts = spark.createDataFrame(
        [(s, -int(c)) for s, c in sorted(site_dec.items())],
        "site string, d long",
    )

    # the decremented df frame feeds BOTH the table write and the
    # full stoplist recompute (a decrement can promote any term) —
    # cached so the dead-docs segment decode underneath runs once,
    # letting the two consumers run concurrently
    new_ts = new_ts.cache()

    def _write_term_stats() -> None:
        new_ts.write.mode("overwrite").parquet(
            os.path.join(out_dir, ts_rel)
        )

    def _stoplist_task() -> None:
        _recompute_stoplist(spark, out_dir, pending, ts_df=new_ts)

    def _write_tombstones() -> None:
        new_tomb.write.mode("overwrite").parquet(
            os.path.join(out_dir, tomb_rel)
        )

    def _write_site_stats() -> None:
        _merge_site_stats(spark, out_dir, meta, delta_counts, ss_rel)

    # the generation writes are independent (each reads only
    # committed tables + the collected dead rows) → concurrent
    # driver threads, one barrier instead of four sequential ones
    from concurrent.futures import ThreadPoolExecutor

    tasks = [_write_term_stats, _stoplist_task, _write_tombstones,
             _write_site_stats]
    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futs = [pool.submit(t) for t in tasks]
        for f in futs:
            f.result()
    new_ts.unpersist()
    meta["n_docs"] = pending["n_docs"]
    meta["sum_len"] = pending["sum_len"]
    meta["avg_len"] = pending["avg_len"]
    meta["stoplist"] = pending["stoplist"]
    _commit(
        out_dir, meta,
        new_paths={
            "term_stats": ts_rel,
            "tombstones": tomb_rel,
            "site_stats": ss_rel,
        },
        retire=(old_ts_rel, old_tomb_rel, old_ss_rel),
    )
    return {"tombstoned": len(dead_rows)}


def reindex_pages(
    spark: SparkSession, out_dir: str, pages: DataFrame
) -> dict:
    """R25: upsert — tombstone any existing version of each url, then
    append the new content (RecursiveWebParser.java:94-117)."""
    urls = [r["url"] for r in pages.select("url").distinct().collect()]
    t = tombstone_urls(spark, out_dir, urls)
    a = append_pages(spark, out_dir, pages)
    return {**t, **a}


def plan_epoch_merge(
    sizes: list[tuple[str, int]],
    tier_ratio: float = 10.0,
    min_merge: int = 2,
    max_merge: int = 10,
) -> list[str]:
    """Size-tiered merge selection (the Lucene TieredMergePolicy /
    Cassandra STCS shape): given ``(epoch_name, bytes)`` pairs, pick
    the epochs worth merging NOW — the smallest tier, i.e. the
    longest smallest-first prefix in which every epoch is within
    ``tier_ratio``× of the smallest, capped at ``max_merge``.
    Returns [] when the tier has fewer than ``min_merge`` members.

    Why this bounds write amplification where merge-all does not:
    with merge-all, every consolidation rewrites the total delta
    volume, so N appends cost O(N²) bytes written; with size tiers a
    posting is rewritten only when its epoch graduates a tier — at
    ratio r that is O(log_r N) rewrites per posting.  At 100 TB the
    difference is the feasibility of frequent appends.  Pure
    function, deterministic (ties break on epoch name) — unit-tested
    without Spark."""
    if tier_ratio < 1.0:
        raise ValueError("tier_ratio must be >= 1")
    ordered = sorted(sizes, key=lambda t: (t[1], t[0]))
    if len(ordered) < min_merge:
        return []
    smallest = max(1, ordered[0][1])
    tier = [
        name
        for name, sz in ordered
        if sz <= tier_ratio * smallest
    ][: max(min_merge, max_merge)][:max_merge]
    return tier if len(tier) >= min_merge else []


@_with_maintenance_conf
def merge_delta_epochs(
    spark: SparkSession,
    out_dir: str,
    min_epochs: int = 2,
    policy: str = "all",
    tier_ratio: float = 10.0,
    max_merge_at_once: int = 10,
) -> dict:
    """Tiered (LSM-style) delta consolidation: rebuild delta epochs
    into ONE fresh epoch, leaving the base ``index/`` untouched.

    ``policy="all"`` (default) consolidates every visible epoch —
    right when deltas are few or a vacuum follows.  ``policy=
    "tiered"`` sizes each epoch (one namenode call apiece, no data
    read) and merges only the smallest size tier chosen by
    :func:`plan_epoch_merge`; larger epochs keep their directories
    and their place in ``delta_epochs``, so a huge old epoch is not
    rewritten every time small fresh appends consolidate — bounded
    write amplification, the LSM property merge-all lacks.

    Every append lands in its own ``index_deltas/epoch=N`` directory;
    unchecked, a long-lived index accumulates one query-time union
    leg (and per-term block fan-out) per append. This op decodes the
    delta rows only — merge cost is proportional to DELTA size, never
    base size (the property that distinguishes tiered merging from
    :func:`vacuum`, which rewrites everything). Tombstones are NOT
    applied here (they live in their own table until vacuum); query
    results are invariant by construction since decode→rebuild
    preserves the logical (term, doc_id, tf, doc_len) multiset.

    No-op (returns ``{"merged_epochs": 0}``) when fewer than
    ``min_epochs`` delta directories exist. Salting/sharding reuse
    the live full-index term_stats, so the N1/N4 invariants hold for
    the consolidated epoch; block metadata keeps the shared
    ``blocks_avg_len`` baseline so WAND gating semantics are
    unchanged."""
    meta = _stats(out_dir)
    dirs = delta_epoch_dirs(spark, out_dir, meta)
    if len(dirs) < min_epochs:
        return {"merged_epochs": 0}
    if policy == "tiered":
        sizes = [
            (os.path.basename(d.rstrip("/")), fsutil.dir_size(d, spark))
            for d in dirs
        ]
        chosen = set(
            plan_epoch_merge(
                sizes, tier_ratio=tier_ratio, min_merge=min_epochs,
                max_merge=max_merge_at_once,
            )
        )
        if not chosen:
            return {"merged_epochs": 0}
        keep_dirs = [
            d for d in dirs
            if os.path.basename(d.rstrip("/")) not in chosen
        ]
        dirs = [
            d for d in dirs
            if os.path.basename(d.rstrip("/")) in chosen
        ]
    elif policy == "all":
        keep_dirs = []
    else:
        raise ValueError(f"unknown merge policy {policy!r}")
    _expire_retired(out_dir, meta)
    gen_next = int(meta.get("gen", 0)) + 1
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    pps = int(meta.get("postings_per_shard", 1 << 20))
    blocks_avg = meta.get("blocks_avg_len", meta["avg_len"])

    deltas = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        deltas = deltas.unionByName(spark.read.parquet(d))
    posts = decode_segments(deltas).select(
        "term", "doc_id", "tf", "doc_len"
    )
    # salt factors from the LIVE full-index df (a delta-local df
    # would under-salt a head term that is mostly in the base)
    live_ts = spark.read.parquet(
        table_path(out_dir, "term_stats", meta)
    )
    segs = compact_postings_withlen(
        posts, live_ts, blocks_avg, config, pps
    )
    segs = merge_segments(
        segs, blocks_avg, config,
        term_stats=live_ts, postings_per_shard=pps,
    )
    epoch = int(meta.get("append_epoch", 0)) + 1
    segs = segs.withColumn(
        "shard", (F.col("shard") + F.lit(epoch << 16)).cast("int")
    ).withColumn("bucket", bucket_col(F.col("term"), n_buckets))

    old_deltas_rel = (meta.get("paths") or {}).get(
        "index_deltas", "index_deltas"
    )
    if keep_dirs:
        # tiered: the consolidated epoch lands as a NEW epoch subdir
        # of the LIVE deltas root (the append pattern — invisible
        # until the delta_epochs flip); unmerged epochs keep their
        # dirs, merged epoch subdirs are retired individually (their
        # paths are protected per-epoch by _expire_retired for
        # retained generations)
        (
            segs.repartition(n_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(
                os.path.join(
                    out_dir, old_deltas_rel, f"epoch={epoch}"
                )
            )
        )
        kept_names = [
            os.path.basename(d.rstrip("/")) for d in keep_dirs
        ]
        merged_names = [
            os.path.basename(d.rstrip("/")) for d in dirs
        ]
        meta["append_epoch"] = epoch
        meta["delta_epochs"] = sorted(
            kept_names + [f"epoch={epoch}"],
            key=lambda n: int(n.split("=", 1)[1]),
        )
        _commit(
            out_dir, meta,
            retire=tuple(
                f"{old_deltas_rel}/{n}" for n in merged_names
            ),
        )
    else:
        # merge-all: the consolidated level lands in a FRESH deltas
        # dir; the old level stays on disk for in-flight readers and
        # is retired (the next op deletes it) — the whole flip is the
        # one stats.json swap
        deltas_rel = _gen_rel("index_deltas", gen_next)
        (
            segs.repartition(n_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, deltas_rel,
                                  f"epoch={epoch}"))
        )

        meta["append_epoch"] = epoch
        meta["delta_epochs"] = [f"epoch={epoch}"]
        _commit(
            out_dir, meta,
            new_paths={"index_deltas": deltas_rel},
            retire=(old_deltas_rel,),
        )
    _append_manifest_rows(
        spark, out_dir,
        [(None, "merge_deltas", len(dirs), None, time.time(),
          uuid.uuid4().hex[:12])],
    )
    return {
        "merged_epochs": len(dirs),
        "kept_epochs": len(keep_dirs),
        "new_epoch": epoch,
    }


@_with_maintenance_conf
def vacuum(spark: SparkSession, out_dir: str) -> dict:
    """Physically drop tombstoned postings and re-merge each term's
    segments; clears the tombstone table.

    The rebuild goes through the SAME machinery as a fresh build —
    :func:`compact_postings_withlen` with the recomputed live
    ``term_stats`` and the build's recorded ``postings_per_shard``,
    then :func:`merge_segments` — so the N1 df-driven salting and N4
    stop-term-sharding invariants survive maintenance: after vacuum a
    head term's posting list is still split across salt shards (never
    one task / one at-rest shard), exactly as a fresh build of the
    surviving corpus would leave it."""
    meta = _stats(out_dir)
    _expire_retired(out_dir, meta)
    gen_next = int(meta.get("gen", 0)) + 1
    tomb = read_tombstones(spark, out_dir, meta)
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    pps = int(meta.get("postings_per_shard", 1 << 20))
    segments = read_segments(spark, out_dir, meta)

    dead_ids = (
        {r["doc_id"] for r in tomb.select("doc_id").collect()}
        if tomb is not None
        else set()
    )
    posts = decode_segments(segments)
    if dead_ids:
        dead_df = spark.createDataFrame(
            [(int(d),) for d in dead_ids], "doc_id long"
        )
        posts = posts.join(
            F.broadcast(dead_df), "doc_id", "left_anti"
        )
    # df stats straight from the live postings; block metadata is
    # re-baselined on the LIVE avg_len, re-arming WAND.  live_ts is
    # consumed twice (salt factors + merge-bypass predicates) inside
    # one job over the old index files → cache until written out.
    posts = posts.select("term", "doc_id", "tf", "doc_len")
    live_ts = posts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).cache()

    segs = compact_postings_withlen(
        posts, live_ts, meta["avg_len"], config, pps
    )
    segs = merge_segments(
        segs, meta["avg_len"], config,
        term_stats=live_ts, postings_per_shard=pps,
    )
    rebuilt = segs.withColumn(
        "bucket", bucket_col(F.col("term"), n_buckets)
    )
    # every rewritten table lands in a FRESH generation dir — the
    # committed snapshot's files are never touched during the op, so
    # in-flight readers keep a consistent index and the visibility
    # flip is exactly one atomic stats.json replacement (_commit)
    old_paths = dict(meta.get("paths") or {})
    idx_rel = _gen_rel("index", gen_next)
    ts_rel = _gen_rel("term_stats", gen_next)
    # materialize the live_ts cache ONCE up front (one decode+agg
    # job): the index rebuild and the term_stats write consume it on
    # CONCURRENT driver threads below — racing threads would each
    # trigger the full old-index decode before the cache lands
    live_ts.count()

    def _write_index() -> None:
        (
            rebuilt.repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, idx_rel))
        )
        # vacuum-to-zero-postings (every text-bearing doc removed)
        # must still leave a readable index dir
        ensure_segments_readable(
            spark, rebuilt, os.path.join(out_dir, idx_rel)
        )

    def _write_ts() -> None:
        live_ts.write.mode("overwrite").parquet(
            os.path.join(out_dir, ts_rel)
        )

    old_docs_rel = old_paths.get("docs", "docs")
    docs_rel = old_docs_rel
    docs = spark.read.parquet(table_path(out_dir, "docs", meta))
    live_docs = docs
    docs_task = None
    if dead_ids:
        # anti-JOIN, not a driver isin list: bulk deletes can carry
        # arbitrarily many ids, and a join keeps the predicate O(1)
        dead_df = spark.createDataFrame(
            [(int(d),) for d in dead_ids], "doc_id long"
        )
        live_docs = docs.join(F.broadcast(dead_df), "doc_id", "left_anti")
        docs_rel = _gen_rel("docs", gen_next)

        def docs_task() -> None:
            live_docs.write.mode("overwrite").parquet(
                os.path.join(out_dir, docs_rel)
            )

    # positional-index co-vacuum: appends/reindexes leave stale
    # positional rows keyed by dead dense doc_ids (correct at query
    # time — the live-doc_map join masks them — but unbounded space
    # under churn).  Vacuum is the full-rewrite op, so rewrite the
    # positions dir too, keeping only ids present in the post-vacuum
    # docs table.  The dir sits at a FIXED path (not generation-
    # tracked), so the flip is two renames; the missing-dir window is
    # a clean retryable read, and the old dir is retired for deferred
    # deletion like every other table.
    pos_dir = out_dir.rstrip("/") + "/positions"
    pos_out: dict = {"dropped": None, "retired_rel": None}
    has_positions = fsutil.exists(pos_dir, spark)

    def _rewrite_positions() -> None:
        import json as _json

        from search_engine_spark.config import DEFAULT as _CFG
        from search_engine_spark.operators.phrases import (
            positional_meta,
        )

        pmeta = positional_meta(spark, pos_dir)
        pos = spark.read.parquet(pos_dir)
        # actual on-disk rows, not pmeta["rows"]: appends extend the
        # dir without refreshing the meta counts (vacuum's rewrite is
        # what brings them back in sync)
        rows_before = pos.count()
        live_ids = live_docs.select("doc_id")
        kept = pos.join(live_ids, "doc_id", "left_semi")
        new_rel = _gen_rel("positions", gen_next)
        new_dir = os.path.join(out_dir, new_rel)
        writer = (
            kept.repartition(F.col("bucket"))
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
        )
        if _CFG.write_term_bloom:
            writer = writer.option(
                "parquet.bloom.filter.enabled#term", "true"
            ).option(
                "parquet.bloom.filter.expected.ndv#term",
                str(_CFG.term_bloom_ndv),
            )
        writer.parquet(new_dir)
        # same empty-partitioned-write hazard as the index dir: a
        # vacuum that keeps zero positional rows would emit only
        # _SUCCESS and the read-back below could not infer a schema
        ensure_segments_readable(spark, kept, new_dir)
        stats = (
            spark.read.parquet(new_dir)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.length("pos_blob")).alias("blob_bytes"),
                F.sum("n").alias("positions"),
            )
            .collect()[0]
        )
        fsutil.write_text(
            new_dir.rstrip("/") + "/_positions_meta.json",
            _json.dumps({
                **pmeta,
                "rows": int(stats["rows"] or 0),
                "blob_bytes": int(stats["blob_bytes"] or 0),
                "positions": int(stats["positions"] or 0),
            }),
            spark,
        )
        pos_out["dropped"] = rows_before - int(stats["rows"] or 0)
        pos_out["retired_rel"] = f"positions_retired_g{gen_next}"
        # recorded so positions_dir_for can resolve a generation to
        # its positional data — and fail loudly (SnapshotExpiredError)
        # when the retired dir has aged out, instead of silently
        # serving post-rewrite positions to a pre-rewrite snapshot
        meta["positions_rewrites"] = list(
            meta.get("positions_rewrites") or []
        ) + [gen_next]
        fsutil.rename(
            pos_dir, os.path.join(out_dir, pos_out["retired_rel"]),
            spark,
        )
        fsutil.rename(new_dir, pos_dir, spark)

    # the generation rewrites are mutually independent — each reads
    # only the COMMITTED snapshot's files (never another rewrite's
    # output) — so they run on concurrent driver threads; the
    # stats/bloom recomputes below read the new tables via the
    # pending paths and therefore wait for this barrier
    from concurrent.futures import ThreadPoolExecutor

    tasks = [_write_index, _write_ts]
    if docs_task is not None:
        tasks.append(docs_task)
    if has_positions:
        tasks.append(_rewrite_positions)
    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futs = [pool.submit(t) for t in tasks]
        for f in futs:
            f.result()
    live_ts.unpersist()
    positions_dropped = pos_out["dropped"]
    pos_retired_rel = pos_out["retired_rel"]

    ss_rel = _gen_rel("site_stats", gen_next)
    new_paths = {
        "index": idx_rel,
        "term_stats": ts_rel,
        "docs": docs_rel,
        "site_stats": ss_rel,
        # fresh (not-yet-existing) namespaces: deltas and tombstones
        # were folded into / dropped by the rebuild
        "index_deltas": _gen_rel("index_deltas", gen_next),
        "tombstones": _gen_rel("tombstones", gen_next),
    }
    pending = dict(meta)
    pending["paths"] = {**old_paths, **new_paths}
    # url-bloom rebuild from the post-vacuum live urls: drops dead
    # keys (the one op that can shrink the filter, keeping its fpp in
    # step with the corpus) and creates it for pre-bloom indexes —
    # vacuum is already a full scan, so this rides along free
    from search_engine_spark.config import DEFAULT as _DEF

    if meta.get("url_bloom") or _DEF.url_bloom_enabled:
        from search_engine_spark.operators.bloom import bloom_build

        ub0 = meta.get("url_bloom") or {}
        m_b = int(ub0.get("m_bits", _DEF.url_bloom_m_bits))
        k_b = int(ub0.get("k", _DEF.url_bloom_k))
        bloom_rel = _gen_rel("url_bloom", gen_next)

        def bloom_task() -> None:
            bloom_build(
                _live_docs(spark, out_dir, pending).select("url"),
                "url", m_b, k_b,
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, bloom_rel)
            )

        if "url_bloom" in (old_paths or {}) or fsutil.exists(
            os.path.join(out_dir, "url_bloom"), spark
        ):
            retire_bloom = old_paths.get("url_bloom", "url_bloom")
        else:
            retire_bloom = None
        new_paths["url_bloom"] = bloom_rel
        meta["url_bloom"] = {
            "m_bits": m_b,
            "k": k_b,
            "n_keys": 0,  # refreshed from n_docs below
            "maybe_cap": int(
                ub0.get("maybe_cap", _DEF.url_bloom_maybe_cap)
            ),
        }
    else:
        retire_bloom = None
        bloom_task = None

    def _scalar_then_stoplist() -> None:
        # chained: the stoplist top-K scores against the post-vacuum
        # n_docs the scalar recompute just put into ``pending``
        _recompute_scalar_stats(spark, out_dir, pending)
        _recompute_stoplist(spark, out_dir, pending)

    # second barrier: the recomputes all read the NEW tables through
    # the pending paths (docs/term_stats written above) but are
    # mutually independent → concurrent driver threads again
    tasks2 = [
        _scalar_then_stoplist,
        lambda: _write_site_stats(spark, out_dir, pending, ss_rel),
    ]
    if bloom_task is not None:
        tasks2.append(bloom_task)
    with ThreadPoolExecutor(max_workers=len(tasks2)) as pool:
        futs = [pool.submit(t) for t in tasks2]
        for f in futs:
            f.result()
    meta["n_docs"] = pending["n_docs"]
    meta["sum_len"] = pending["sum_len"]
    meta["avg_len"] = pending["avg_len"]
    meta["stoplist"] = pending["stoplist"]
    meta["blocks_avg_len"] = meta["avg_len"]
    # the rebuild re-salted every term from scratch — append shard
    # epochs restart (shard ids are fresh-build-shaped again)
    meta["append_epoch"] = 0
    meta["delta_epochs"] = []
    retire = [
        old_paths.get("index", "index"),
        old_paths.get("term_stats", "term_stats"),
        old_paths.get("site_stats", "site_stats"),
        old_paths.get("index_deltas", "index_deltas"),
    ]
    if docs_rel != old_docs_rel:
        retire.append(old_docs_rel)
    if tomb is not None:
        retire.append(old_paths.get("tombstones", "tombstones"))
    if pos_retired_rel is not None:
        retire.append(pos_retired_rel)
    if retire_bloom is not None:
        retire.append(retire_bloom)
    if meta.get("url_bloom"):
        meta["url_bloom"]["n_keys"] = int(meta["n_docs"])
    _commit(out_dir, meta, new_paths=new_paths, retire=retire)
    out = {"vacuumed": len(dead_ids)}
    if positions_dropped is not None:
        out["positions_rows_dropped"] = positions_dropped
    return out


def open_index(spark: SparkSession, out_dir: str):
    """Load for querying with tombstones applied (doc_map = live
    docs), so search results never surface deleted pages.

    The descriptor is read ONCE and shared between the index load and
    the tombstone read — two independent stats.json reads could
    straddle a concurrent maintenance commit and mix generations."""
    meta = _stats(out_dir)
    cidx = load_compact_index(spark, out_dir, meta)
    tomb = read_tombstones(spark, out_dir, meta)
    if tomb is not None:
        cidx.tombstones = tomb
        cidx.doc_map = cidx.doc_map.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    return cidx


def open_index_at(spark: SparkSession, out_dir: str, gen: int):
    """Time-travel read: load the index exactly as generation ``gen``
    committed it (Iceberg snapshot-read analog).

    The archived descriptor pins every table path, the visible delta
    epochs, n_docs/avg_len/stoplist and the tombstone set of that
    generation.  Two in-place-additive structures need masking:

    - ``docs`` rows appended AFTER the snapshot (their postings live
      in epochs the descriptor doesn't list) are filtered by the
      archived ``next_id_segment`` id cursor — every post-snapshot
      doc_id sits in a segment at or above it;
    - delta epoch dirs written after the snapshot are inside the same
      deltas dir but absent from the descriptor's ``delta_epochs``
      list, so :func:`read_segments` never reads them.

    Raises :class:`SnapshotExpiredError` when a later op has expired
    a data dir the snapshot references (retention = one maintenance
    interval; vacuum/merge rewrite tables into fresh generation dirs
    and retire the old ones)."""
    meta = snapshot_descriptor(out_dir, gen)
    cidx = load_compact_index(spark, out_dir, meta)
    id_ceiling = int(meta.get("next_id_segment", 1 << 20)) << 40
    cidx.doc_map = cidx.doc_map.filter(F.col("doc_id") < id_ceiling)
    tomb = read_tombstones(spark, out_dir, meta)
    if tomb is not None:
        cidx.tombstones = tomb
        cidx.doc_map = cidx.doc_map.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    return cidx


def positions_dir_for(
    spark: SparkSession, out_dir: str, gen: int | None = None
) -> str:
    """The positional-index directory valid at generation ``gen``
    (None = current).  The positional index lives at a FIXED path and
    is rewritten only by vacuum, which moves the pre-rewrite data to
    ``positions_retired_gG`` (G = the vacuum's generation) — that dir
    is the positional truth for every generation < G.  With multiple
    vacuums, the data for ``gen`` sits in the EARLIEST rewrite after
    it; if none, the live dir still holds it.  Pair with
    :func:`open_index_at` so time-travel phrase/NEAR queries read
    positions consistent with their snapshot (subject to the same
    retention window — an expired retired dir means the snapshot's
    positional data is gone, like any other expired table)."""
    base = out_dir.rstrip("/") + "/positions"
    if gen is None:
        return base
    meta = _stats(out_dir)
    rewrites = sorted(
        int(g) for g in meta.get("positions_rewrites") or []
        if int(g) > gen
    )
    if not rewrites:
        return base  # no rewrite since `gen`: live dir IS its data
    want = os.path.join(out_dir, f"positions_retired_g{rewrites[0]}")
    if not fsutil.exists(want, spark):
        raise SnapshotExpiredError(
            f"positional data for generation {gen} was retired by "
            f"the vacuum at generation {rewrites[0]} and has been "
            "expired; raise snapshot_retention before vacuuming to "
            "keep it readable"
        )
    return want


# ---------------------------------------------------------------------------


def _config_from(meta: dict) -> EngineConfig:
    from search_engine_spark.config import BM25Config

    return EngineConfig(
        bm25=BM25Config(k1=meta["k1"], b=meta["b"]),
        stoplist_size=meta["stoplist_size"],
        block_size=meta["block_size"],
        shard_df_threshold=meta["shard_df_threshold"],
        index_buckets=meta["n_buckets"],
        # maintenance re-encodes with the index's own codec
        doc_id_codec=meta.get("doc_id_codec", "varint"),
    )


def _write_site_stats(
    spark: SparkSession, out_dir: str, meta: dict, dest_rel: str
) -> None:
    """Recompute site_stats from the (pending) snapshot's live docs
    into a fresh generation dir — the committed dir is never touched,
    so no tmp/swap dance is needed.  Full-scan path: vacuum only;
    append/tombstone merge deltas via :func:`_merge_site_stats`."""
    live = _live_docs(spark, out_dir, meta)
    stats = live.groupBy("site").agg(F.count(F.lit(1)).alias("pages"))
    stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, dest_rel)
    )


def _merge_site_stats(
    spark: SparkSession,
    out_dir: str,
    old_meta: dict,
    delta_counts: DataFrame,
    dest_rel: str,
) -> None:
    """site_stats' = site_stats ± this op's per-site delta — an
    O(|sites| + |delta|) merge of the committed (site, pages) table,
    never a scan of the live docs.  Inductively equal to the groupBy
    over live docs (build seeds it exactly; append deltas count only
    genuinely-new rows; tombstone deltas count exactly the newly-dead
    rows; vacuum re-syncs from scratch).  ``delta_counts`` is
    (site, d) with d signed; sites reaching 0 live pages drop out,
    matching the recompute's semantics."""
    old = spark.read.parquet(
        table_path(out_dir, "site_stats", old_meta)
    )
    merged = (
        old.join(delta_counts, "site", "full_outer")
        .select(
            "site",
            (
                F.coalesce(F.col("pages"), F.lit(0))
                + F.coalesce(F.col("d"), F.lit(0))
            ).cast("long").alias("pages"),
        )
        .filter(F.col("pages") > 0)
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(out_dir, dest_rel)
    )
