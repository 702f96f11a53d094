"""Bit-parity of the driver-side XXH64 twin with Spark's xxhash64
expression — the soundness bedrock of the no-job bloom probe
(plans/incremental.append_pages)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from search_engine_spark.functions.xxh64 import (
    bloom_bits_py,
    spark_xxhash64,
)


def _spark_hashes(spark, rows, exprs):
    df = spark.createDataFrame(rows, "s string, i int")
    return [r["h"] for r in df.select(exprs.alias("h")).collect()]


def test_string_hash_matches_spark(spark):
    rng = random.Random(7)
    strs = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "https://site00.example/alpha/beta/p123", "é漢字🚀" * 3,
    ] + [
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz0123456789/:._-é漢")
            for _ in range(rng.randrange(0, 120))
        )
        for _ in range(200)
    ]
    rows = [(s, 0) for s in strs]
    want = _spark_hashes(spark, rows, F.xxhash64("s"))
    got = [spark_xxhash64(s) for s in strs]
    assert got == want


def test_chained_string_int_matches_spark(spark):
    rng = random.Random(11)
    rows = [
        (
            "".join(
                rng.choice("abcdefghij/:._-")
                for _ in range(rng.randrange(0, 64))
            ),
            rng.randrange(-5, 2_000_000_000),
        )
        for _ in range(200)
    ]
    want = _spark_hashes(spark, rows, F.xxhash64("s", "i"))
    got = [spark_xxhash64(s, i) for s, i in rows]
    assert got == want


def test_bloom_bits_match_spark_bit_expr(spark):
    """bloom_bits_py ≡ operators/bloom._bit (the production bit
    mapping the driver probe must reproduce)."""
    from search_engine_spark.operators.bloom import _key_bits

    urls = [
        f"https://site0{i % 4}.example/path/p{i}" for i in range(50)
    ]
    m_bits, k = 1 << 23, 5
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = _key_bits(df, "url", m_bits, k, "xxhash64",
                     keep_key=True).collect()
    want: dict[str, set] = {}
    for r in rows:
        want.setdefault(r["key"], set()).add(int(r["bit"]))
    got = {u: set(bloom_bits_py(u, m_bits, k)) for u in urls}
    assert got == want
