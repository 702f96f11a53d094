"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline.  JVM-side dot
  product via ``zip_with`` + ``aggregate`` (whole-stage codegen, no
  Python), broadcast of the (small) query set, per-query top-k via a
  window over the partitioned-by-query candidate scores.
- LSH-bucketed variant (the 100 TB scale path): sign-random-projection
  buckets from a deterministic hyperplane set; candidates only join
  within a bucket, turning the O(N·Q) scan into O(N) bucketing + a
  per-bucket join.  Recall is tunable by n_planes/n_tables; verified
  against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import types as T
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact cosine top-k.

    ``queries`` is expected small → broadcast; the corpus is scanned
    once, scores stay JVM-side, per-query top-k via window.
    Tie-break: sim desc, neighbor_id asc (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # spread the scanned side: a single-file corpus would make the
    # broadcast join one task
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _hyperplanes_md5(
    dim: int, n_planes: int, table: int
) -> list[list[float]]:
    """SQL-reproducible hyperplanes: each component is the
    md5-substring integer of ``"table#plane#dim"`` mapped to a
    uniform grid on [-1, 1] — the same idiom as the CMS/HLL/Bloom/
    quantile twins, so a DuckDB oracle regenerates the planes, the
    SRP buckets, and the final top-k bit-exactly.  Uniform components
    are a valid SRP family (any symmetric distribution preserves the
    sign-agreement/angle relation up to constants); the gaussian
    :func:`_hyperplanes` stays the production default."""
    import hashlib

    return [
        [
            (
                int(
                    hashlib.md5(
                        f"{table}#{i}#{d}".encode()
                    ).hexdigest()[17:32],
                    16,
                )
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(dim)
        ]
        for i in range(n_planes)
    ]


def srp_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (long) for one LSH table."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec, parr) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, i).cast("long")
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 1234,
    multi_probe: bool = False,
    plane_method: str = "gauss",
) -> DataFrame:
    """Approximate cosine top-k: candidates share an SRP bucket in at
    least one of ``n_tables`` hash tables; exact rescoring on the
    (small) candidate set.

    ``multi_probe`` (Lv et al. 2007): the QUERY side additionally
    probes every Hamming-distance-1 bucket (flip each plane bit) —
    n_planes extra probe rows per query per table, corpus side
    untouched.  Equal-or-better recall lets ``n_tables`` shrink (the
    corpus-side bucketing, the expensive half at 100 TB, scales with
    n_tables; query-side probes are queries-sized — cheap).

    ``plane_method="md5"`` swaps the gaussian planes for the
    SQL-reproducible md5-grid family (:func:`_hyperplanes_md5`) so a
    DuckDB oracle replays the whole pipeline."""
    if plane_method == "md5":
        tables = [
            _hyperplanes_md5(dim, n_planes, t) for t in range(n_tables)
        ]
    else:
        tables = [
            _hyperplanes(dim, n_planes, seed + t)
            for t in range(n_tables)
        ]

    def bucketize(
        df: DataFrame, idname: str, vecname: str, probe: bool = False
    ) -> DataFrame:
        def probes(bucket):
            if not probe:
                return F.array(bucket)
            return F.array(
                bucket,
                *[
                    bucket.bitwiseXOR(F.lit(1 << b).cast("long"))
                    for b in range(n_planes)
                ],
            )

        buckets = F.flatten(F.array(
            *[
                F.transform(
                    probes(
                        srp_bucket_col(F.col(vecname), tables[t])
                    ),
                    lambda bk: F.struct(
                        F.lit(t).alias("table"), bk.alias("bucket")
                    ),
                )
                for t in range(n_tables)
            ]
        ))
        return df.select(
            F.col(idname), F.col(vecname), F.explode(buckets).alias("tb")
        ).select(idname, vecname, "tb.table", "tb.bucket")

    q = bucketize(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        "query_id", "qvec", probe=multi_probe,
    )
    c = bucketize(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec")),
        "neighbor_id", "cvec",
    )
    cand = (
        c.join(q, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim", F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs:
    ``(id_a, id_b, sim)`` for every unordered pair with
    cos ≥ threshold.  O(N²) — the correctness baseline and oracle
    target; :func:`cosine_near_dup_pairs_lsh` is the scale path."""
    # norms computed once per side, not once per pair (the pair join
    # is O(N²) — anything per-pair must be just the dot product).
    # The streamed side is spread across the cluster: a single-file
    # input would otherwise make the nested-loop join ONE task.
    spark = df.sparkSession
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    ).repartition(spark.sparkContext.defaultParallelism)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 1234,
    plane_method: str = "gauss",
) -> DataFrame:
    """Approximate near-dup pairs: only pairs sharing an SRP bucket in
    ≥1 table are scored — O(N) bucketing + per-bucket self-join
    instead of the O(N²) cross join.  High-cosine pairs collide with
    probability (1 − θ/π)^planes per table; misses are tunable via
    n_planes / n_tables (recall vs cost).

    ``plane_method="md5"`` swaps the gaussian planes for the
    SQL-reproducible md5-grid family (:func:`_hyperplanes_md5`) so a
    DuckDB oracle replays bucketing, candidate join and scoring."""
    if plane_method == "md5":
        tables = [
            _hyperplanes_md5(dim, n_planes, t) for t in range(n_tables)
        ]
    else:
        tables = [
            _hyperplanes(dim, n_planes, seed + t)
            for t in range(n_tables)
        ]
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                srp_bucket_col(F.col(vec_col), tables[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets).alias("tb")
    ).select(id_col, vec_col, "tb.table", "tb.bucket")
    a = bucketed.select(
        "table", "bucket",
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
    )
    b = bucketed.select(
        "table", "bucket",
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "sim", F.round(cosine_sim(F.col("va"), F.col("vb")), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_centroids_md5(n_lists: int, dim: int) -> "np.ndarray":
    """SQL-reproducible coarse quantizer: each raw component is the
    md5-grid value of ``"ivf#list#dim"`` (the same idiom as
    :func:`_hyperplanes_md5`), rows normalized to unit length so
    argmax-dot assignment partitions by direction.  Lets a DuckDB
    oracle regenerate the quantizer and replay the FULL IVF-PQ
    pipeline — the k-means :func:`train_ivf_centroids` stays the
    production default (rows-only)."""
    import hashlib

    g = np.array(
        [
            [
                (
                    int(
                        hashlib.md5(
                            f"ivf#{lst}#{d}".encode()
                        ).hexdigest()[17:32],
                        16,
                    )
                    % 2001
                    - 1000
                )
                / 1000.0
                for d in range(dim)
            ]
            for lst in range(n_lists)
        ],
        dtype=np.float64,
    )
    return g / np.linalg.norm(g, axis=1, keepdims=True)


def pq_codebooks_md5(m: int, n_codes: int, dsub: int) -> "np.ndarray":
    """SQL-reproducible PQ codebooks: codeword components are the
    md5-grid values of ``"pq#subspace#code#dim"`` scaled to
    [-0.25, 0.25] (the component scale of unit-norm sub-vectors).
    Production training (:func:`train_pq_codebooks`) stays default."""
    import hashlib

    return np.array(
        [
            [
                [
                    (
                        int(
                            hashlib.md5(
                                f"pq#{j}#{c}#{d}".encode()
                            ).hexdigest()[17:32],
                            16,
                        )
                        % 2001
                        - 1000
                    )
                    / 4000.0
                    for d in range(dsub)
                ]
                for c in range(n_codes)
            ]
            for j in range(m)
        ],
        dtype=np.float64,
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> "np.ndarray":
    """Deterministic k-means coarse quantizer trained driver-side on
    a seeded sample (standard IVF practice: training is tiny relative
    to the corpus; assignment is the distributed part)."""
    rows = (
        corpus.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)),
                         replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(cents.shape[0]):
            mask = assign == c
            if mask.any():
                m = x[mask].mean(axis=0)
                cents[c] = m / (np.linalg.norm(m) or 1.0)
    return cents


def _ivf_assign_udf(spark, cents: "np.ndarray"):
    """argmax-cosine centroid assignment as an Arrow-vectorized pandas
    UDF over a BROADCAST centroid matrix: one ``X @ C.T`` matmul per
    batch, plan size flat in ``n_lists`` (an unrolled per-centroid
    Catalyst expression would grow the plan O(n_lists × dim) and
    collapse planning at the n_lists ≈ 10⁴–10⁵ a 100 TB corpus
    needs).  Centroids are unit-norm and ``argmax`` is invariant to
    the per-row positive factor 1/‖x‖, so the dot product alone
    ranks lists identically to cosine."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(cents, dtype=np.float64)
    )

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        c = bc.value
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series((x @ c.T).argmax(axis=1).astype(np.int32))

    return assign


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    centroid (one pass, JVM-side dot products); each query scans only
    its ``n_probe`` nearest lists.  At rest the corpus would be
    written partitioned by ``ivf_list`` so a query touches n_probe
    partitions — the disk analog of the index's term buckets."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_lists, vec_col)

    assign = _ivf_assign_udf(corpus.sparkSession, centroids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("ivf_list", assign(F.col("cvec")))

    # per-query probe lists (small, computed driver-side via numpy on
    # the collected query set — queries are the broadcast side anyway)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()
    qx = np.array([r["qvec"] for r in qrows], dtype=np.float64)
    qx = qx / np.linalg.norm(qx, axis=1, keepdims=True)
    probes = np.argsort(-(qx @ centroids.T), axis=1)[:, :n_probe]
    spark = corpus.sparkSession
    probe_rows = [
        (int(r["query_id"]), r["qvec"], [int(p) for p in probes[i]])
        for i, r in enumerate(qrows)
    ]
    q = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("qvec", T.ArrayType(T.FloatType()), False),
                T.StructField(
                    "probe_lists", T.ArrayType(T.IntegerType()), False
                ),
            ]
        ),
    ).select("query_id", "qvec", F.explode("probe_lists").alias("ivf_list"))

    cand = (
        c.join(F.broadcast(q), "ivf_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim", F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ (product quantization — the compressed 100 TB ANN path)
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 12,
    seed: int = 7,
) -> "np.ndarray":
    """Per-subspace L2 k-means codebooks, shape ``(m, n_codes, d/m)``.

    Classic product quantization (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): split the (unit-
    normalized) vector into ``m`` contiguous subspaces, k-means each
    independently.  Training runs driver-side on a seeded sample —
    standard practice, the sample is tiny relative to the corpus and
    the result is a broadcast constant; ENCODING is the distributed
    part.  ``n_codes <= 256`` so a code is one byte: a 64-dim float32
    vector (256 B) compresses to ``m`` bytes (32x at m=8) — the
    difference between an ANN index that fits executor memory at
    10^12 vectors and one that doesn't.
    """
    if n_codes > 256:
        raise ValueError("n_codes > 256 would not fit one byte/code")
    rows = (
        corpus.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        k = min(n_codes, len(xs))
        cents = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * xs @ cents.T
                + (cents * cents).sum(1)[None, :]
            )
            a = d2.argmin(axis=1)
            for c in range(k):
                msk = a == c
                if msk.any():  # empty cluster keeps its old centroid
                    cents[c] = xs[msk].mean(axis=0)
        if k < n_codes:  # tiny corpus: pad by repeating, codes unused
            cents = np.vstack([cents, cents[: n_codes - k]])[:n_codes]
        books[j] = cents
    return books


def _pq_encode_udf(spark, books: "np.ndarray"):
    """Arrow-vectorized PQ encoder: vector → ``m`` uint8 codes as one
    BINARY value.  One ``(batch × n_codes)`` distance matrix per
    subspace per Arrow batch; the codebook rides a broadcast."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(books, dtype=np.float64)
    )

    @pandas_udf(T.BinaryType())
    def encode(vecs: pd.Series) -> pd.Series:
        cb = bc.value
        m, n_codes, dsub = cb.shape
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * dsub : (j + 1) * dsub]
            d2 = -2.0 * xs @ cb[j].T + (cb[j] * cb[j]).sum(1)[None, :]
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    return encode


def pq_encode(
    corpus: DataFrame,
    books: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(<id>, pq_code binary)`` — the at-rest compressed index
    payload (write partitioned by ``ivf_list`` alongside it)."""
    enc = _pq_encode_udf(corpus.sparkSession, books)
    return corpus.select(
        F.col(id_col), enc(F.col(vec_col)).alias("pq_code")
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 4,
    centroids: "np.ndarray | None" = None,
    books: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k — the full compressed ANN
    pipeline a 10^12-vector corpus needs:

    1. coarse quantizer routes each corpus vector to an ``ivf_list``
       (broadcast-matrix pandas UDF, plan size flat in n_lists);
    2. vectors are PQ-encoded to ``m`` bytes (32x smaller shuffle /
       storage than raw float32 — the candidate join moves CODES, not
       vectors);
    3. each query scans only its ``n_probe`` lists, scoring
       candidates by asymmetric distance (ADC): a per-query
       ``(m × n_codes)`` lookup table of subspace dot products is
       broadcast, and a candidate's approximate cosine is ``m`` table
       lookups — no floating-point vector math on the scan;
    4. the ADC top ``k·refine`` are re-ranked EXACTLY (join back the
       raw vectors for just those few rows, JVM-side cosine) so the
       returned ``sim`` values are true cosines — ADC error only
       costs recall, never score fidelity.  ``refine=0`` skips the
       rerank and returns raw ADC scores (column ``sim`` is then the
       ADC approximation).

    Tie-break everywhere: score desc, neighbor_id asc.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_lists, vec_col, seed=7
        )
    if books is None:
        books = train_pq_codebooks(
            corpus, m=m, n_codes=n_codes, vec_col=vec_col
        )

    assign = _ivf_assign_udf(spark, centroids)
    enc = _pq_encode_udf(spark, books)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("ivf_list", assign(F.col("cvec"))).withColumn(
        "pq_code", enc(F.col("cvec"))
    )

    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()
    qx = np.array([r["qvec"] for r in qrows], dtype=np.float64)
    qx = qx / np.linalg.norm(qx, axis=1, keepdims=True)
    probes = np.argsort(-(qx @ centroids.T), axis=1)[:, :n_probe]

    # per-query ADC lookup tables: lut[j, code] = q_sub_j . codeword
    mm, n_c, dsub = books.shape
    luts = {}
    for i, r in enumerate(qrows):
        lut = np.empty((mm, n_c), dtype=np.float64)
        for j in range(mm):
            lut[j] = books[j] @ qx[i, j * dsub : (j + 1) * dsub]
        luts[int(r["query_id"])] = lut
    bc_luts = spark.sparkContext.broadcast(luts)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def adc_score(qids: pd.Series, codes: pd.Series) -> pd.Series:
        tabs = bc_luts.value
        n = len(codes)
        cm = np.frombuffer(
            b"".join(codes.tolist()), dtype=np.uint8
        ).reshape(n, -1)
        out = np.empty(n, dtype=np.float64)
        qarr = qids.to_numpy()
        rows_j = np.arange(cm.shape[1])
        for qid in np.unique(qarr):
            msk = qarr == qid
            out[msk] = tabs[int(qid)][rows_j[None, :], cm[msk]].sum(
                axis=1
            )
        return pd.Series(out)

    probe_rows = [
        (int(r["query_id"]), r["qvec"], [int(p) for p in probes[i]])
        for i, r in enumerate(qrows)
    ]
    q = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("qvec", T.ArrayType(T.FloatType()), False),
                T.StructField(
                    "probe_lists", T.ArrayType(T.IntegerType()), False
                ),
            ]
        ),
    ).select(
        "query_id", "qvec", F.explode("probe_lists").alias("ivf_list")
    )

    # candidate scan joins CODES only (qvec is dropped before the
    # window; the wide column re-enters only for the k·refine rerank)
    cand = (
        c.join(F.broadcast(q.select("query_id", "ivf_list")), "ivf_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "adc", adc_score(F.col("query_id"), F.col("pq_code"))
        )
        .select("query_id", "neighbor_id", "adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    if refine <= 0:
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("adc", 6).alias("sim"),
                "rank",
            )
        )
    short = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * refine)
        .drop("rank")
    )
    qv = spark.createDataFrame(
        [(int(r["query_id"]), r["qvec"]) for r in qrows],
        "query_id long, qvec array<float>",
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    exact = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "sim", F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6)
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
