"""Snapshot isolation of incremental maintenance (N3/N6 + S8).

The maintenance ops commit by atomically replacing stats.json (the
Iceberg version-hint analog): replacement tables land in fresh
generation dirs, the descriptor's ``paths`` map flips in one rename,
and the old generation is retained until the NEXT op starts.  These
tests simulate a concurrent reader by running a full
``load_compact_index`` + search probe at every filesystem mutation
point inside vacuum / merge_delta_epochs / append_pages / tombstone
(via fsutil interposition) and assert each probe sees a complete OLD
or complete NEW snapshot — never an error, never a mix (results must
match what the probe's own descriptor generation promises).

Reference semantics: the reference swaps rows transactionally through
JPA (repositories/IndexRepository.java:23-36); at Spark/parquet scale
the equivalent guarantee needs the snapshot-commit protocol tested
here.
"""

from __future__ import annotations

import os

import pytest

from search_engine_spark import fsutil
from search_engine_spark.config import BM25Config, EngineConfig
from search_engine_spark.plans.build import (
    build_and_write,
    load_compact_index,
    load_stats,
    table_path,
)
from search_engine_spark.plans.incremental import (
    append_pages,
    merge_delta_epochs,
    tombstone_urls,
    vacuum,
)
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.fixtures import pages_df

pytestmark = pytest.mark.usefixtures("spark")

QUERIES = ("crystal meadow", "falcon harbor lantern")


def _probe(spark, out_dir):
    """One consistent-reader observation: descriptor generation plus
    everything a query-path user can see under that generation
    (open_index — the tombstone-aware production loader)."""
    from search_engine_spark.plans.incremental import open_index

    meta = load_stats(spark, out_dir)
    cidx = open_index(spark, out_dir)
    results = tuple(
        tuple(
            (r["url"], round(r["score"], 9))
            for r in search_compact(cidx, q, limit=5).collect()
        )
        for q in QUERIES
    )
    return {
        "gen": int(meta.get("gen", 0)),
        "n_docs": cidx.n_docs,
        "avg_len": round(cidx.avg_len, 9),
        "n_terms": cidx.term_stats.count(),
        "results": results,
    }


class _Interposer:
    """Runs a reader probe immediately BEFORE every destructive /
    visibility-changing fsutil call a maintenance op makes."""

    PATCH = ("delete", "rename", "rename_overwrite", "write_text")

    def __init__(self, spark, out_dir):
        self.spark = spark
        self.out_dir = out_dir
        self.probes = []
        self._orig = {}
        self._busy = False

    def __enter__(self):
        for name in self.PATCH:
            orig = getattr(fsutil, name)
            self._orig[name] = orig

            def wrapper(*a, _orig=orig, **kw):
                if not self._busy:
                    self._busy = True
                    try:
                        self.probes.append(
                            _probe(self.spark, self.out_dir)
                        )
                    finally:
                        self._busy = False
                return _orig(*a, **kw)

            setattr(fsutil, name, wrapper)
        return self

    def __exit__(self, *exc):
        for name, orig in self._orig.items():
            setattr(fsutil, name, orig)
        return False


@pytest.fixture()
def index_dir(spark, tmp_path):
    out = str(tmp_path / "idx")
    base = pages_df(spark, 150, n_sites=4, seed=42).cache()
    config = EngineConfig(
        bm25=BM25Config(k1=1.2, b=0.75), index_buckets=4
    )
    build_and_write(
        spark, base, out, analyzer="tokens", config=config, n_segments=4
    )
    return out, base


def _extra_pages(spark, base, parity):
    rows = [
        (r["url"] + f"?v={parity}", r["warc_ts"], r["html"], r["text"],
         r["lang"])
        for r in base.limit(30).collect()
    ]
    return spark.createDataFrame(rows, base.schema)


def _assert_probes_consistent(probes, before, after):
    assert probes, "interposer captured no mutation points"
    by_gen = {before["gen"]: before, after["gen"]: after}
    for p in probes:
        assert p["gen"] in by_gen, (
            f"probe saw unexpected generation {p['gen']}"
        )
        assert p == by_gen[p["gen"]], (
            "probe mixed generations: descriptor said "
            f"gen={p['gen']} but observed state differs\n"
            f"probe: {p}\nexpected: {by_gen[p['gen']]}"
        )


def test_reader_mid_vacuum_sees_old_or_new(spark, index_dir):
    out, base = index_dir
    append_pages(spark, out, _extra_pages(spark, base, 1))
    dead = [r["url"] for r in
            spark.read.parquet(
                table_path(out, "docs", load_stats(spark, out))
            ).limit(7).select("url").collect()]
    tombstone_urls(spark, out, dead)

    before = _probe(spark, out)
    with _Interposer(spark, out) as ip:
        vacuum(spark, out)
    after = _probe(spark, out)

    assert after["gen"] == before["gen"] + 1
    # vacuum is result-invariant (tombstones were already applied at
    # query time) but physically rewrites everything
    assert after["results"] == before["results"]
    _assert_probes_consistent(ip.probes, before, after)


def test_reader_mid_merge_sees_old_or_new(spark, index_dir):
    out, base = index_dir
    append_pages(spark, out, _extra_pages(spark, base, 1))
    append_pages(spark, out, _extra_pages(spark, base, 2))

    before = _probe(spark, out)
    with _Interposer(spark, out) as ip:
        res = merge_delta_epochs(spark, out)
    after = _probe(spark, out)

    assert res["merged_epochs"] == 2
    assert after["results"] == before["results"]  # merge is logical no-op
    _assert_probes_consistent(ip.probes, before, after)


def test_reader_mid_append_sees_old_or_new(spark, index_dir):
    out, base = index_dir
    before = _probe(spark, out)
    with _Interposer(spark, out) as ip:
        append_pages(spark, out, _extra_pages(spark, base, 1))
    after = _probe(spark, out)

    assert after["gen"] == before["gen"] + 1
    assert after["n_docs"] > before["n_docs"]
    _assert_probes_consistent(ip.probes, before, after)


def test_reader_mid_tombstone_sees_old_or_new(spark, index_dir):
    out, base = index_dir
    dead = [r["url"] for r in
            spark.read.parquet(
                table_path(out, "docs", load_stats(spark, out))
            ).limit(5).select("url").collect()]
    before = _probe(spark, out)
    with _Interposer(spark, out) as ip:
        tombstone_urls(spark, out, dead)
    after = _probe(spark, out)

    assert after["n_docs"] == before["n_docs"] - 5
    _assert_probes_consistent(ip.probes, before, after)


def test_old_snapshot_readable_until_next_op(spark, index_dir):
    # retention = one maintenance interval: a CompactIndex loaded
    # before a vacuum commit still answers queries AFTER the commit
    # (old generation dirs are retired, not deleted)
    out, base = index_dir
    append_pages(spark, out, _extra_pages(spark, base, 1))

    old_cidx = load_compact_index(spark, out)
    old_results = [
        (r["url"], round(r["score"], 9))
        for r in search_compact(old_cidx, QUERIES[0], limit=5).collect()
    ]
    vacuum(spark, out)
    # same frames, same answers — the files they point at still exist
    again = [
        (r["url"], round(r["score"], 9))
        for r in search_compact(old_cidx, QUERIES[0], limit=5).collect()
    ]
    assert again == old_results

    # the NEXT op expires the retired generation
    retired = load_stats(spark, out)["retired"]
    assert retired, "vacuum should retire the old generation"
    append_pages(spark, out, _extra_pages(spark, base, 2))
    for rel in retired:
        assert not fsutil.exists(os.path.join(out, rel), spark)


def test_crash_before_commit_preserves_old_snapshot(spark, index_dir):
    # a maintenance op that dies before its stats.json flip leaves
    # only orphaned generation dirs; the committed snapshot still
    # loads and answers identically, and a retried op succeeds
    import search_engine_spark.plans.incremental as incr

    out, base = index_dir
    append_pages(spark, out, _extra_pages(spark, base, 1))
    before = _probe(spark, out)

    orig = incr._commit

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before commit")

    incr._commit = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            vacuum(spark, out)
    finally:
        incr._commit = orig

    assert _probe(spark, out) == before  # old snapshot intact

    vacuum(spark, out)  # retry overwrites the orphaned gen dirs
    after = _probe(spark, out)
    assert after["gen"] == before["gen"] + 1
    assert after["results"] == before["results"]
