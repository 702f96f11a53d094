"""Deterministic weighted sampling (Efraimidis–Spirakis A-ES)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from search_engine_spark.operators.curation import weighted_sample


def _key(doc_id, weight, salt="v1"):
    h = hashlib.md5((str(doc_id) + salt).encode()).hexdigest()
    v = int(h[17:32], 16)  # substring(h, 18, 15), 1-indexed
    u = (v + 0.5) / float(1 << 60)
    return -math.log(u) / weight


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, grp string, w double"
    )


def test_matches_python_reference_exactly(spark):
    rows = [(i, "g%d" % (i % 3), 0.5 + (i % 7)) for i in range(300)]
    got = sorted(
        r.doc_id
        for r in weighted_sample(
            _df(spark, rows), 25, "w"
        ).collect()
    )
    want = sorted(
        i for i, _, w in sorted(rows, key=lambda r: (_key(r[0], r[2]), r[0]))[:25]
    )
    assert got == want


def test_partitioning_invariant(spark):
    rows = [(i, "g", 1.0 + (i % 5)) for i in range(200)]
    df = _df(spark, rows)
    a = sorted(r.doc_id for r in weighted_sample(df, 30, "w").collect())
    b = sorted(
        r.doc_id
        for r in weighted_sample(df.repartition(13), 30, "w").collect()
    )
    assert a == b


def test_weights_bias_inclusion(spark):
    # 500 heavy (w=10) + 500 light (w=1); a 300-row sample should be
    # dominated by heavy rows (expected ~272 under A-ES)
    rows = [(i, "h", 10.0) for i in range(500)] + [
        (i, "l", 1.0) for i in range(500, 1000)
    ]
    out = weighted_sample(_df(spark, rows), 300, "w").collect()
    heavy = sum(1 for r in out if r.grp == "h")
    assert len(out) == 300
    assert heavy > 230  # far above the unweighted expectation of 150


def test_nonpositive_and_null_weights_never_selected(spark):
    rows = [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -1.0), (4, "g", None)]
    out = weighted_sample(_df(spark, rows), 10, "w").collect()
    assert [r.doc_id for r in out] == [1]


def test_per_group_mode(spark):
    rows = [(i, "g%d" % (i % 4), 1.0 + (i % 3)) for i in range(120)]
    out = weighted_sample(
        _df(spark, rows), 5, "w", group_col="grp"
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert set(by_grp) == {"g0", "g1", "g2", "g3"}
    assert all(len(v) == 5 for v in by_grp.values())
    # group mode agrees with the python reference per group
    for g, ids in by_grp.items():
        want = sorted(
            i
            for i, gg, w in sorted(
                (r for r in rows if r[1] == g),
                key=lambda r: (_key(r[0], r[2]), r[0]),
            )[:5]
        )
        assert sorted(ids) == want


def test_plan_is_take_ordered(spark):
    rows = [(i, "g", 1.0) for i in range(50)]
    plan = weighted_sample(_df(spark, rows), 5, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
