"""Storage-catalog interface: the exact table operations the
persisted index performs, named.

plans/build.py documents that the on-disk layout (hive-partitioned
parquet dirs + an atomically-replaced JSON snapshot descriptor) maps
1:1 onto an Iceberg catalog.  This module makes that mapping
EXECUTABLE instead of prose: :class:`TableCatalog` enumerates every
storage op the engine issues —

    append(table, df[, partition])     Iceberg: table.newAppend()
    overwrite_partitions(table, df)    Iceberg: OverwritePartitions /
                                       dynamic partitionOverwriteMode
    read(table)                        Iceberg: table scan
    read_partitions(table, col, vals)  Iceberg: scan w/ partition
                                       predicate (partition pruning)
    commit(descriptor)                 Iceberg: snapshot commit
                                       (atomic metadata swap)
    descriptor(gen) / current_gen()    Iceberg: time-travel snapshot

:class:`ParquetDirCatalog` implements it with the SAME Spark calls
the engine's build/maintenance code uses today (mode="append",
dynamic partitionOverwriteMode, bucket-pruned reads, fsutil atomic
descriptor replace).  tests/test_catalog_contract.py replays one op
history through this implementation AND through an in-memory
FakeIcebergCatalog that follows the Iceberg semantic model
(immutable snapshots, partition-level overwrite), asserting
state-identity after every op — the drop-in-isomorphism claim of
BASELINE.md, as a test.  No Iceberg jars exist in this sandbox; the
fake encodes the SEMANTICS the real catalog guarantees.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import fsutil


class TableCatalog:
    """The storage contract the engine assumes (see module doc)."""

    def append(
        self, table: str, df: DataFrame,
        partition_col: str | None = None,
    ) -> None:
        raise NotImplementedError

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_col: str
    ) -> None:
        raise NotImplementedError

    def read(self, table: str) -> DataFrame:
        raise NotImplementedError

    def read_partitions(
        self, table: str, partition_col: str, values: list
    ) -> DataFrame:
        raise NotImplementedError

    def commit(self, descriptor: dict) -> int:
        raise NotImplementedError

    def descriptor(self, gen: int | None = None) -> dict:
        raise NotImplementedError

    def current_gen(self) -> int:
        raise NotImplementedError


class ParquetDirCatalog(TableCatalog):
    """The engine's actual storage layer behind the interface —
    every method body is the literal call pattern used by
    plans/build.py and plans/incremental.py."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def append(
        self, table: str, df: DataFrame,
        partition_col: str | None = None,
    ) -> None:
        # partitioned tables append THROUGH the partition layout
        # (the delta-epoch write pattern); flat tables (docs/) append
        # plain files — both are Iceberg newAppend() on the other side
        w = df.write.mode("append")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(self._path(table))

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_col: str
    ) -> None:
        # the resumed-build write pattern (plans/build.py): replace
        # ONLY the partitions present in df, leave the rest
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(conf_key, "static")
        self.spark.conf.set(conf_key, "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(self._path(table))
            )
        finally:
            self.spark.conf.set(conf_key, prev)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def read_partitions(
        self, table: str, partition_col: str, values: list
    ) -> DataFrame:
        # partition-pruned scan (Catalyst prunes hive dirs)
        return self.read(table).filter(
            F.col(partition_col).isin(values)
        )

    def commit(self, descriptor: dict) -> int:
        gen = int(descriptor.get("gen", 0))
        path = os.path.join(self.root, "stats.json")
        tmp = path + "." + uuid.uuid4().hex[:8] + ".tmp"
        fsutil.write_text(tmp, json.dumps(descriptor), self.spark)
        fsutil.rename_overwrite(tmp, path, self.spark)
        fsutil.write_text(
            os.path.join(self.root, "snapshots", f"gen-{gen}.json"),
            json.dumps(descriptor),
            self.spark,
        )
        return gen

    def descriptor(self, gen: int | None = None) -> dict:
        if gen is None:
            return json.loads(
                fsutil.read_text(
                    os.path.join(self.root, "stats.json"), self.spark
                )
            )
        return json.loads(
            fsutil.read_text(
                os.path.join(
                    self.root, "snapshots", f"gen-{gen}.json"
                ),
                self.spark,
            )
        )

    def current_gen(self) -> int:
        return int(self.descriptor().get("gen", 0))
