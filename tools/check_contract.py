"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry against its oracle_sql()
through DuckDB on the same parquet tables, compares row count, column
names, and values (rows sorted by all columns, columns sorted by name).

Usage: python tools/check_contract.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []

    for name, fn in qs.items():
        # comma-separated substrings, OR-matched
        if name_filter and not any(
            part and part in name for part in name_filter.split(",")
        ):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS" if len(got) >= 0 else "?"
            print(f"{status}  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue

        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS  {name}: {len(got)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
            failures.append(name)

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
        + (f"; failures: {failures}" if failures else "")
    )
    spark.stop()
    return 1 if n_fail else 0


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> tuple[bool, str]:
    if len(got) != len(exp):
        return False, f"row count {len(got)} != {len(exp)}"
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        return False, f"columns {gcols} != {ecols}"
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    for c in gcols:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
            if not np.allclose(
                gv.astype(float), ev.astype(float),
                rtol=0, atol=0, equal_nan=True,
            ):
                bad = ~np.isclose(gv.astype(float), ev.astype(float),
                                  rtol=0, atol=0, equal_nan=True)
                i = int(np.argmax(np.asarray(bad)))
                return False, (
                    f"col {c} exact-mismatch at row {i}: "
                    f"{gv.iloc[i]!r} != {ev.iloc[i]!r}"
                )
        else:
            if not gv.astype(str).equals(ev.astype(str)):
                diff = gv.astype(str) != ev.astype(str)
                i = int(np.argmax(np.asarray(diff)))
                return False, (
                    f"col {c} mismatch at row {i}: "
                    f"{gv.iloc[i]!r} != {ev.iloc[i]!r}"
                )
    return True, ""


if __name__ == "__main__":
    raise SystemExit(main())
