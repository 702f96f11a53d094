"""Online ranker comparison by interleaving (A/B on one result list).

Interleaving merges the result lists of two rankers into ONE list
shown to the user; clicks then vote directly between the rankers —
an order of magnitude more sensitive than A/B-testing separate
traffic slices.  Two standard schemes:

- :func:`balanced_interleave` / :func:`balanced_outcome` — balanced
  interleaving (Joachims 2003, "Evaluating retrieval performance
  using clickthrough data").  The pointer-merge algorithm has a
  closed form — the union of both lists sorted per query by
  ``(min(rank_a, rank_b), leader's doc first on ties)`` — so the
  whole operator is JVM column expressions + one window, and a SQL
  oracle can replay it bit-exactly.
- :func:`team_draft_interleave` / :func:`team_draft_outcome` — team-
  draft interleaving (Radlinski, Kurup & Joachims 2008): rounds of
  captain picks with a per-round coin; inherently sequential per
  query, implemented as an Arrow-batched ``applyInPandas`` over the
  query group (each query's lists are SERP-sized — tiny groups,
  parallelism across queries).

Randomization is a DETERMINISTIC per-query coin (seeded hash), the
standard trick for replayable online experiments: the same
(query, seed) always interleaves identically, so logs can be joined
back to the exact interleaved list without storing it.
``hash_method="md5"`` switches the coin to the md5-substring integer
idiom a DuckDB oracle can reproduce (same pattern as the sketch /
minhash operators); default is the faster ``xxhash64``.

At 100 TB / 1000 executors: inputs are per-query top-k lists (rows =
queries × k, never corpus-sized); balanced interleaving is one
full-outer join on (query, doc) + one window, team-draft is one
grouped Arrow stage; outcomes are one aggregation each.  No skew:
every query group is ≤ 2k rows by construction.

No reference counterpart (the reference serves one ranker); public
formulations cited above.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BIG = 1 << 40  # "absent from this list" rank sentinel


def _coin_col(query_col, seed: int, hash_method: str):
    """Deterministic per-query coin in {0, 1}: 0 → ranker A leads."""
    if hash_method == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", query_col, F.lit(str(seed)))),
                18, 15,
            ),
            16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(2))
    if hash_method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown coin hash {hash_method!r}")
    return F.pmod(F.xxhash64(query_col, F.lit(seed)), F.lit(2))


def _joined_ranks(
    rank_a: DataFrame,
    rank_b: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
) -> DataFrame:
    """Full-outer join of the two rankings on (query, doc) with
    absent-side ranks at the ``_BIG`` sentinel."""
    a = rank_a.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("rank_a"),
    )
    b = rank_b.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("rank_b"),
    )
    return (
        a.join(b, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("rank_a", F.lit(_BIG)).alias("rank_a"),
            F.coalesce("rank_b", F.lit(_BIG)).alias("rank_b"),
        )
    )


def balanced_interleave(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    seed: int = 42,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rn",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """``(query_id, pos, doc_id, rank_a, rank_b)`` — the balanced
    interleaving of the two rankings, top ``k`` per query.

    Closed form of the Joachims pointer merge: sort the doc union by
    ``m = min(rank_a, rank_b)``; a tie at ``m`` is one doc per side,
    and the LEADER's doc (per-query coin) goes first.  Verified
    equivalent to the sequential algorithm in the test suite.
    """
    leads_b = _coin_col(F.col("query_id"), seed, hash_method)
    m = F.least("rank_a", "rank_b")
    # 0 when the doc's min-rank comes from the leading list
    pref = F.when(
        (leads_b == 0) & (F.col("rank_a") == m), F.lit(0)
    ).when(
        (leads_b == 1) & (F.col("rank_b") == m), F.lit(0)
    ).otherwise(F.lit(1))
    w = Window.partitionBy("query_id").orderBy(
        m.asc(), pref.asc(), F.col("doc_id").asc()
    )
    return (
        _joined_ranks(rank_a, rank_b, query_col, doc_col, rank_col)
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("query_id", "pos", "doc_id", "rank_a", "rank_b")
    )


def balanced_outcome(
    rank_a: DataFrame,
    rank_b: DataFrame,
    clicks: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rn",
) -> DataFrame:
    """``(query_id, k, clicks_a, clicks_b, winner)`` per query with
    ≥1 click — the balanced-interleaving credit rule.

    ``k = max over clicked docs of min(rank_a, rank_b)`` (the
    smallest prefix depth whose union covers every click), then each
    ranker is credited its clicked docs at rank ≤ k; winner ∈
    {'A', 'B', 'tie'}.  ``clicks`` is ``(query_col, doc_col)``.
    """
    cl = clicks.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
    ).dropDuplicates(["query_id", "doc_id"])
    j = _joined_ranks(
        rank_a, rank_b, query_col, doc_col, rank_col
    ).join(cl, ["query_id", "doc_id"])
    per_q = (
        j.withColumn("m", F.least("rank_a", "rank_b"))
        .groupBy("query_id")
        .agg(
            F.max("m").alias("k"),
            F.collect_list(
                F.struct("rank_a", "rank_b")
            ).alias("ranks"),
        )
        .select(
            "query_id",
            "k",
            F.aggregate(
                "ranks",
                F.lit(0),
                lambda acc, r: acc
                + F.when(r["rank_a"] <= F.col("k"), 1).otherwise(0),
            ).alias("clicks_a"),
            F.aggregate(
                "ranks",
                F.lit(0),
                lambda acc, r: acc
                + F.when(r["rank_b"] <= F.col("k"), 1).otherwise(0),
            ).alias("clicks_b"),
        )
    )
    return per_q.withColumn(
        "winner",
        F.when(F.col("clicks_a") > F.col("clicks_b"), "A")
        .when(F.col("clicks_b") > F.col("clicks_a"), "B")
        .otherwise("tie"),
    )


_TDI_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("team", T.StringType()),
    ]
)


def team_draft_interleave(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    seed: int = 42,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rn",
    coin_method: str = "xxhash",
) -> DataFrame:
    """``(query_id, pos, doc_id, team)`` — team-draft interleaving
    (Radlinski et al. 2008), top ``k`` per query.

    Per round the team with fewer picks goes first (per-round seeded
    coin on ties); each team appends its best not-yet-picked doc and
    OWNS it for credit.  Sequential per query → one Arrow
    ``applyInPandas`` over the (query)-grouped join; the per-round
    coin hashes (query_id, round, seed) with the same pure-Python
    xxhash64 used by the sketch oracles, so results are independent
    of partitioning and replayable.

    ``coin_method="md5"`` swaps the tie coin for the md5-substring
    parity of ``"qid#round#seed"`` — the SQL-reproducible idiom the
    other twins use, so a DuckDB recursive CTE can replay the whole
    sequential draft.
    """
    from search_engine_spark.operators.sketches import xxhash64_py

    if coin_method == "md5":
        import hashlib

        def _coin(qid: int, rnd: int) -> int:
            return (
                int(
                    hashlib.md5(
                        f"{qid}#{rnd}#{seed}".encode()
                    ).hexdigest()[17:32],
                    16,
                )
                & 1
            )
    else:
        def _coin(qid: int, rnd: int) -> int:
            return xxhash64_py(qid, rnd * 1_000_003 + seed) & 1

    def _draft(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in pdf.groupby("query_id"):
            la = (
                g[g.rank_a < _BIG]
                .sort_values("rank_a")["doc_id"]
                .tolist()
            )
            lb = (
                g[g.rank_b < _BIG]
                .sort_values("rank_b")["doc_id"]
                .tolist()
            )
            picked: set = set()
            inter: list = []
            na = nb = 0
            rnd = 0
            ia = ib = 0
            while len(inter) < k:
                ia_left = any(d not in picked for d in la[ia:])
                ib_left = any(d not in picked for d in lb[ib:])
                if not ia_left and not ib_left:
                    break
                if na < nb:
                    turn = "A"
                elif nb < na:
                    turn = "B"
                else:
                    coin = _coin(int(qid), rnd)
                    turn = "A" if coin == 0 else "B"
                rnd += 1
                if turn == "A" and not ia_left:
                    turn = "B"
                elif turn == "B" and not ib_left:
                    turn = "A"
                if turn == "A":
                    while la[ia] in picked:
                        ia += 1
                    d = la[ia]
                    na += 1
                else:
                    while lb[ib] in picked:
                        ib += 1
                    d = lb[ib]
                    nb += 1
                picked.add(d)
                inter.append((qid, len(inter) + 1, d, turn))
            out.extend(inter)
        return pd.DataFrame(
            out, columns=["query_id", "pos", "doc_id", "team"]
        )

    joined = _joined_ranks(
        rank_a, rank_b, query_col, doc_col, rank_col
    )
    return joined.groupBy("query_id").applyInPandas(
        _draft, schema=_TDI_SCHEMA
    )


def team_draft_outcome(
    interleaved: DataFrame,
    clicks: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """``(query_id, clicks_a, clicks_b, winner)`` per query with ≥1
    click on the interleaved list — each click credits the team that
    picked the doc."""
    cl = clicks.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
    ).dropDuplicates(["query_id", "doc_id"])
    per_q = (
        interleaved.join(cl, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("team") == "A", 1).otherwise(0)
            ).alias("clicks_a"),
            F.sum(
                F.when(F.col("team") == "B", 1).otherwise(0)
            ).alias("clicks_b"),
        )
    )
    return per_q.withColumn(
        "winner",
        F.when(F.col("clicks_a") > F.col("clicks_b"), "A")
        .when(F.col("clicks_b") > F.col("clicks_a"), "B")
        .otherwise("tie"),
    )
