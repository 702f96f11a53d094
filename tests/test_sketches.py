"""Count-Min Sketch: guarantees, linearity, streaming merge."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from search_engine_spark.operators.sketches import (
    cms_build,
    cms_error_bound,
    cms_estimate,
    cms_merge,
)

WORDS = (
    ["spark"] * 500 + ["query"] * 200 + ["index"] * 50
    + [f"tail{i}" for i in range(300)]
)


def _tokens_df(spark, words=WORDS):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_cms_overestimates_never_under(spark):
    df = _tokens_df(spark)
    sk = cms_build(df, "term").cache()
    true = Counter(WORDS)
    probes = ["spark", "query", "index", "tail0", "absent"]
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(sk, probes).collect()
    }
    bound = cms_error_bound(len(WORDS))
    for k in probes:
        assert est[k] >= true[k]          # one-sided error
        assert est[k] <= true[k] + bound  # CM guarantee (d=5 → w.h.p.)


def test_cms_cell_budget(spark):
    sk = cms_build(_tokens_df(spark), "term", depth=4, width=64)
    assert sk.count() <= 4 * 64
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 4 * len(WORDS)


def test_cms_linearity_merge_equals_whole(spark):
    """CMS is linear: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    cell-for-cell — the property streaming/partial aggregation relies
    on."""
    half = len(WORDS) // 2
    a = cms_build(_tokens_df(spark, WORDS[:half]), "term")
    b = cms_build(_tokens_df(spark, WORDS[half:]), "term")
    whole = cms_build(_tokens_df(spark), "term")
    merged = cms_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 3), ("a", 5)], "term string, n int"
    )
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(
            cms_build(df, "term", weight_col="n"), ["a", "b"]
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 3


def test_cms_streaming_foreachbatch_merge(spark, tmp_path):
    """Micro-batch sketches merged via foreachBatch equal the batch
    sketch over the full stream — constant state per trigger."""
    src = str(tmp_path / "src")
    half = len(WORDS) // 2
    _tokens_df(spark, WORDS[:half]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _tokens_df(spark, WORDS[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out_dir = str(tmp_path / "cells")

    def sink(batch_df, batch_id):
        cms_build(batch_df, "term").write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema("term string").parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = (
        spark.read.parquet(out_dir)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(_tokens_df(spark), "term")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, whole.collect())
    )


# ---------------------------------------------------------------------------
# dyadic-CMS quantile sketches
# ---------------------------------------------------------------------------


def test_xxhash64_py_matches_spark(spark):
    from search_engine_spark.operators.sketches import xxhash64_py

    rows = [(v, s) for v in [0, 1, 7, 123456789, (1 << 20) - 1]
            for s in [1000, 1001, 1003]]
    df = spark.createDataFrame(rows, "v long, s int")
    got = df.select(
        "v", "s", F.xxhash64(F.col("v"), F.col("s")).alias("h")
    ).collect()
    for r in got:
        assert xxhash64_py(r.v, r.s) == r.h


def test_quantile_sketch_accuracy(spark):
    from search_engine_spark.operators.sketches import (
        quantile_build,
        quantile_error_bound,
        quantile_query,
        quantile_ranks,
    )

    # deterministic skewed values: doc-length-like, heavy low tail
    vals = [((i * 37) % 100) ** 2 % 1000 + (i % 13) for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = quantile_build(df, "v")
    n = len(vals)
    bound = quantile_error_bound(n)

    svals = sorted(vals)
    # rank probes
    ranks = quantile_ranks(sk, [0, 100, 500, 1000])
    for v, est in ranks.items():
        true = sum(1 for x in vals if x < v)
        assert true <= est <= true + bound  # one-sided CMS error

    # quantiles land within rank error of the true order statistic
    qs = quantile_query(sk, [0.1, 0.5, 0.9, 0.99])
    for q, v in qs.items():
        true_rank = q * n
        lo = max(0, int(true_rank - bound) - 1)
        hi = min(n - 1, int(true_rank + bound) + 1)
        assert svals[lo] <= v <= svals[hi]


def test_quantile_merge_equals_rebuild(spark):
    from search_engine_spark.operators.sketches import (
        quantile_build,
        quantile_merge,
    )

    a = [(i % 700,) for i in range(1500)]
    b = [((i * 3) % 900,) for i in range(1500)]
    da = spark.createDataFrame(a, "v long")
    db = spark.createDataFrame(b, "v long")
    dall = da.unionByName(db)
    merged = {
        (r.lvl, r.row, r.col): r.cnt
        for r in quantile_merge(
            quantile_build(da, "v"), quantile_build(db, "v")
        ).collect()
    }
    rebuilt = {
        (r.lvl, r.row, r.col): r.cnt
        for r in quantile_build(dall, "v").collect()
    }
    assert merged == rebuilt


def test_quantile_clamps_domain(spark):
    from search_engine_spark.operators.sketches import (
        quantile_build,
        quantile_query,
    )

    df = spark.createDataFrame(
        [(-5,), (2 ** 40,), (10,), (10,)], "v long"
    )
    sk = quantile_build(df, "v")
    q = quantile_query(sk, [0.5])
    assert 0 <= q[0.5] <= (1 << 20) - 1


# --- md5-register HLL twin (SQL-reproducible) ---


def test_hll_md5_estimate_within_bound(spark):
    import math

    from search_engine_spark.operators.sketches import (
        hll_estimate_md5,
        hll_registers_md5,
    )

    n = 3000
    df = spark.createDataFrame(
        [(f"doc-{i}", "ru" if i % 3 else "en") for i in range(n)],
        "key string, lang string",
    )
    reg = hll_registers_md5(df, "key", ["lang"], lg_k=8)
    est = {
        r["lang"]: r["est"]
        for r in hll_estimate_md5(reg, ["lang"], lg_k=8).collect()
    }
    true = {"en": n // 3, "ru": n - n // 3}
    rse = 1.04 / math.sqrt(256)
    for lang, t in true.items():
        assert abs(est[lang] - t) / t < 4 * rse, (lang, est[lang], t)


def test_hll_md5_merge_equals_whole(spark):
    from search_engine_spark.operators.sketches import (
        hll_merge_md5,
        hll_registers_md5,
    )

    rows = [(f"k{i}",) for i in range(1200)]
    whole = spark.createDataFrame(rows, "key string")
    a = spark.createDataFrame(rows[:700], "key string")
    b = spark.createDataFrame(rows[500:], "key string")  # overlap
    want = sorted(
        (r["bucket"], r["rho"])
        for r in hll_registers_md5(whole, "key", lg_k=6).collect()
    )
    got = sorted(
        (r["bucket"], r["rho"])
        for r in hll_merge_md5(
            hll_registers_md5(a, "key", lg_k=6),
            hll_registers_md5(b, "key", lg_k=6),
        ).collect()
    )
    assert got == want


def test_hll_md5_small_range_linear_counting_is_near_exact(spark):
    from search_engine_spark.operators.sketches import (
        hll_estimate_md5,
        hll_registers_md5,
    )

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(40)], "key string"
    )
    reg = hll_registers_md5(df, "key", lg_k=8)
    (est,) = hll_estimate_md5(reg, lg_k=8).collect()
    # linear-counting regime: tiny cardinality vs 256 registers
    assert abs(est["est"] - 40) < 5


def test_quantile_md5_twin_matches_python_replay(spark):
    """md5 quantile sketch: Spark cells == pure-python bucket replay,
    and rank/quantile probes through hash_method='md5' stay within
    the same dyadic-CMS error bound as the xxhash64 default."""
    import hashlib

    from search_engine_spark.operators.sketches import (
        quantile_build,
        quantile_query,
        quantile_ranks,
    )

    bits, depth, width = 10, 3, 128
    vals = [(i * 37) % 1000 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    cells = {
        (r["lvl"], r["row"], r["col"]): r["cnt"]
        for r in quantile_build(
            df, "x", bits, depth, width, hash_method="md5"
        ).collect()
    }
    want: dict = {}
    for v in vals:
        vc = max(0, min(v, (1 << bits) - 1))
        for lvl in range(bits):
            for row in range(depth):
                col = int(
                    hashlib.md5(
                        f"{vc >> lvl}#{1000 + row}".encode()
                    ).hexdigest()[17:32], 16,
                ) % width
                want[(lvl, row, col)] = want.get((lvl, row, col), 0) + 1
    assert cells == want

    sk = quantile_build(df, "x", bits, depth, width, hash_method="md5")
    ranks = quantile_ranks(sk, [100, 500], bits, depth, width,
                           hash_method="md5")
    for v, est in ranks.items():
        true = sum(1 for x in vals if x < v)
        assert true <= est <= true + 60  # one-sided CMS overcount
    med = quantile_query(sk, [0.5], bits, depth, width,
                         hash_method="md5")[0.5]
    svals = sorted(vals)
    assert abs(svals.index(min(svals, key=lambda x: abs(x - med)))
               - len(vals) // 2) < 60
