"""Executable Iceberg-mapping contract (VERDICT r03 item #6): the
same table-op history replayed through the engine's real parquet
storage layer (plans/catalog.ParquetDirCatalog — the literal call
patterns of build/maintenance) and through an in-memory
FakeIcebergCatalog that models the Iceberg semantic contract
(immutable snapshots, append, partition-level overwrite, time-travel
reads, partition-pruned scans).  State-identity after every op is
what "the parquet layer maps 1:1 onto an Iceberg catalog" means —
upgraded here from BASELINE.md prose to a test."""

from __future__ import annotations

import copy

import pytest

from search_engine_spark.plans.catalog import (
    ParquetDirCatalog,
    TableCatalog,
)


class FakeIcebergCatalog(TableCatalog):
    """In-memory Iceberg semantic model: every mutation creates a new
    immutable per-table version; descriptors commit atomically and
    stay readable by generation (snapshot time travel)."""

    def __init__(self):
        self._tables: dict[str, list[list[tuple]]] = {}
        self._descriptors: dict[int, dict] = {}
        self._current: dict | None = None
        self._rows_schema: dict[str, list[str]] = {}

    # -- rows helpers (the fake stores plain python rows) ----------
    def _rows(self, df):
        cols = df.columns
        return cols, [tuple(r[c] for c in cols) for r in df.collect()]

    def append(self, table, df, partition_col=None):
        cols, rows = self._rows(df)
        versions = self._tables.setdefault(table, [[]])
        self._rows_schema.setdefault(table, cols)
        versions.append(list(versions[-1]) + rows)

    def overwrite_partitions(self, table, df, partition_col):
        cols, rows = self._rows(df)
        self._rows_schema.setdefault(table, cols)
        pidx = cols.index(partition_col)
        replaced = {r[pidx] for r in rows}
        versions = self._tables.setdefault(table, [[]])
        prev = versions[-1]
        kept = [
            r for r in prev
            if r[self._rows_schema[table].index(partition_col)]
            not in replaced
        ]
        versions.append(kept + rows)

    def read(self, table):
        return self._tables.get(table, [[]])[-1]

    def read_partitions(self, table, partition_col, values):
        cols = self._rows_schema[table]
        pidx = cols.index(partition_col)
        return [
            r for r in self.read(table) if r[pidx] in set(values)
        ]

    def commit(self, descriptor):
        gen = int(descriptor.get("gen", 0))
        snap = copy.deepcopy(descriptor)
        # snapshot pins each table's CURRENT version index
        snap["_versions"] = {
            t: len(v) - 1 for t, v in self._tables.items()
        }
        self._descriptors[gen] = snap
        self._current = snap
        return gen

    def descriptor(self, gen=None):
        if gen is None:
            return self._current
        return self._descriptors[gen]

    def current_gen(self):
        return int(self._current.get("gen", 0))

    def read_at(self, table, gen):
        vi = self._descriptors[gen]["_versions"].get(table, 0)
        return self._tables.get(table, [[]])[vi]


@pytest.fixture()
def catalogs(spark, tmp_path):
    return (
        ParquetDirCatalog(spark, str(tmp_path / "cat")),
        FakeIcebergCatalog(),
        spark,
    )


def _seg_rows(spark, bucket_vals, tag):
    return spark.createDataFrame(
        [
            (f"term{i}", tag, int(b))
            for b in bucket_vals
            for i in range(3)
        ],
        "term string, build string, bucket int",
    )


def _state(real: ParquetDirCatalog, table):
    return sorted(
        tuple(r[c] for c in ("term", "build", "bucket"))
        for r in real.read(table).collect()
    )


def test_op_history_isomorphism(catalogs):
    """append → overwrite-partition → partition-pruned read →
    snapshot commit / time travel: identical visible state through
    the parquet layer and the Iceberg semantic model at every step."""
    real, fake, spark = catalogs

    # 1. initial build write (partitioned table, like index/)
    df0 = _seg_rows(spark, [0, 1, 2], "b0")
    real.overwrite_partitions("index", df0, "bucket")
    fake.overwrite_partitions("index", df0, "bucket")
    gen0 = {"gen": 0, "n_docs": 3}
    real.commit(gen0)
    fake.commit(gen0)
    assert _state(real, "index") == sorted(fake.read("index"))

    # 2. append (delta epoch pattern)
    d1 = _seg_rows(spark, [3], "b1")
    real.append("index", d1, partition_col="bucket")
    fake.append("index", d1, partition_col="bucket")
    assert _state(real, "index") == sorted(fake.read("index"))

    # 3. overwrite ONE partition (resume/rebuild pattern): bucket 1
    #    replaced, buckets 0/2/3 untouched
    d2 = _seg_rows(spark, [1], "b2")
    real.overwrite_partitions("index", d2, "bucket")
    fake.overwrite_partitions("index", d2, "bucket")
    state = _state(real, "index")
    assert state == sorted(fake.read("index"))
    assert {r[1] for r in state if r[2] == 1} == {"b2"}
    assert {r[1] for r in state if r[2] == 0} == {"b0"}
    gen1 = {"gen": 1, "n_docs": 4}
    real.commit(gen1)
    fake.commit(gen1)

    # 4. partition-pruned read
    pr = sorted(
        tuple(r[c] for c in ("term", "build", "bucket"))
        for r in real.read_partitions("index", "bucket", [1, 3])
        .collect()
    )
    assert pr == sorted(fake.read_partitions("index", "bucket", [1, 3]))
    assert {r[2] for r in pr} == {1, 3}

    # 5. snapshot read: both catalogs serve the archived descriptor
    assert real.descriptor(0)["n_docs"] == 3
    assert fake.descriptor(0)["n_docs"] == 3
    assert real.current_gen() == fake.current_gen() == 1


def test_commit_is_atomic_replacement(catalogs):
    """The descriptor flip is a rename-overwrite: a reader sees the
    whole old or whole new descriptor (the commit primitive the
    Iceberg HadoopCatalog analogizes)."""
    real, fake, spark = catalogs
    real.commit({"gen": 0, "marker": "a"})
    real.commit({"gen": 1, "marker": "b"})
    assert real.descriptor()["marker"] == "b"
    assert real.descriptor(0)["marker"] == "a"
