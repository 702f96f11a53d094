"""Near-duplicate clustering: pair lists → components → one kept doc.

The pair generators in :mod:`operators.dedup` and
:mod:`operators.similarity` emit (id_a, id_b) near-dup edges; a
training-data pipeline then needs the TRANSITIVE closure — if A~B and
B~C, all three are one duplicate cluster and exactly one survives.
This module supplies that last step:

- :func:`connected_components` — distributed components over an edge
  DataFrame via alternating *large-star* / *small-star* contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014).  Converges in O(log² n) rounds on ANY graph shape —
  unlike plain min-label propagation, whose round count is the graph
  diameter (a 10⁶-long chain of pairwise near-dups would take 10⁶
  shuffles to label; star contraction takes ~40).
- :func:`assign_clusters` — every doc labelled with its cluster id
  (component-minimum id; docs in no pair are their own singleton).
- :func:`dedup_keep_representative` — the corpus with one kept doc
  per cluster (smallest id, or best-by-priority-column).

Scale design (100 TB corpus, 1000 executors):

- Each round is two hash aggregations (groupBy-min — map-side
  combined, skew-free) and two edge⋈min joins.  No ``collect_set``:
  a star center's million-edge neighborhood is never materialized as
  one array; it stays a distributed edge list.
- The edge⋈min join IS skewed at the star center by construction —
  that is AQE skew-join territory (``spark.sql.adaptive.enabled``,
  on by default here), which splits the hot key's partitions.
- Lineage is truncated every round with ``localCheckpoint`` —
  iterative DataFrame plans otherwise grow exponentially and planning
  itself becomes the bottleneck long before data does.
- Convergence is detected with a count + order-independent
  ``xxhash64`` checksum of the edge set (one tiny aggregate per
  round), not a full ``exceptAll`` diff.

Reference parity: the reference engine has no near-dup clustering (it
dedups by exact URL only — ``services/utils/RecursiveWebParser.java``
visited-set); this operator family is part of the LLM-training-data
surface this engine adds on top.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def _canon_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every pair hi→lo, drop self-loops and duplicates."""
    a, b = F.col(src), F.col(dst)
    return (
        pairs.select(
            F.greatest(a, b).alias("src"), F.least(a, b).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, min(Γ⁺(u))) for every undirected edge (u,v) with v > u."""
    und = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    mins = und.groupBy("src").agg(F.min("dst").alias("mn"))
    m = F.least(F.col("src"), F.col("mn"))
    return (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Edges arrive oriented src > dst; every node of N(u) ∪ {u} is
    re-pointed at m = min(N(u))."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("m"))
    repointed = (
        edges.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    own = mins.select("src", F.col("m").alias("dst"))
    return repointed.unionByName(own).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            # decimal(38,0) sum: immune to ANSI long-overflow at any
            # edge count (xxhash64 values are full-range int64)
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, cluster) for every node appearing in ``pairs``.

    ``cluster`` is the component-minimum node id.  Alternates
    large-star / small-star until the edge set is stable; each round
    shrinks every component toward a star rooted at its minimum, in
    O(log² n) rounds total regardless of diameter.
    """
    edges = _canon_edges(pairs, src, dst).localCheckpoint(eager=True)
    n, h = _edge_checksum(edges)
    if n == 0:
        return edges.select(
            F.col("src").alias("node"), F.col("dst").alias("cluster")
        )
    for it in range(max_iter):
        edges2 = _small_star(_large_star(edges)).localCheckpoint(
            eager=True
        )
        n2, h2 = _edge_checksum(edges2)
        edges = edges2
        if (n2, h2) == (n, h):
            _log.info("connected_components: converged in %d rounds", it + 1)
            break
        n, h = n2, h2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # at convergence every edge is (node, component_min); the roots
    # themselves appear only on the dst side
    roots = edges.select(F.col("dst").alias("src"), F.col("dst")).distinct()
    return (
        edges.unionByName(roots)
        .distinct()
        .select(F.col("src").alias("node"), F.col("dst").alias("cluster"))
    )


def assign_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """``df`` + a ``cluster_id`` column (component min; singleton docs
    are their own cluster).  The labels frame is component-count-sized
    (≪ corpus) only when dup density is low — it is joined, never
    collected, so either way the shape is one shuffle join."""
    labels = connected_components(pairs, src, dst)
    return (
        df.join(
            labels.withColumnRenamed("node", id_col), id_col, "left"
        )
        .withColumn("cluster_id", F.coalesce("cluster", F.col(id_col)))
        .drop("cluster")
    )


def dedup_keep_representative(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    priority_col: str | None = None,
) -> DataFrame:
    """Corpus with one kept doc per near-dup cluster.

    Default keeps the smallest id (deterministic, matches
    :func:`operators.dedup.exact_dedup`); with ``priority_col`` the
    max-priority doc wins, id ascending as the tiebreak — e.g.
    ``priority_col="n_chars"`` keeps the longest variant, the common
    web-pipeline policy.

    One window over ``cluster_id`` (single shuffle on a key whose
    groups are near-dup clusters — small by construction).
    """
    from pyspark.sql.window import Window

    clustered = assign_clusters(df, pairs, id_col, src, dst)
    if priority_col is None:
        order = [F.col(id_col).asc()]
    else:
        order = [F.col(priority_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )
