"""Embedding near-dup pairs + distributed fixture generator."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_lsh,
)
from search_engine_spark.sources.fixtures import pages_df, pages_df_dist


def _emb(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _np_pairs(rows, threshold):
    import numpy as np

    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=float)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if a > b:
                a, b = b, a
            if round(sims[i][j], 6) >= threshold:
                out.add((a, b))
    return out


def test_near_dup_exact_matches_numpy(spark):
    emb = _emb(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    want = _np_pairs(emb.collect(), 0.4)
    assert got == want and len(got) > 0


def test_near_dup_lsh_subset_with_high_recall(spark):
    emb = _emb(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    # SRP collision prob per table = (1 - θ/π)^planes: at cos 0.4
    # (θ≈66°) that's ~0.16 with 4 planes → 16 tables give ~94% recall.
    # (The defaults are tuned for true near-dups, cos ≥ 0.9.)
    approx = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs_lsh(
            emb, threshold=0.4, n_planes=4, n_tables=16
        ).collect()
    }
    # LSH may miss pairs but never invents them
    assert approx <= exact
    assert len(approx) >= math.ceil(0.6 * len(exact))


def test_dist_generator_partitioning_invariant(spark):
    a = pages_df_dist(spark, 300, n_sites=4, seed=7, n_partitions=2)
    b = pages_df_dist(spark, 300, n_sites=4, seed=7, n_partitions=16)
    ra = sorted(
        (r["url"], r["text"], r["lang"])
        for r in a.select("url", "text", "lang").collect()
    )
    rb = sorted(
        (r["url"], r["text"], r["lang"])
        for r in b.select("url", "text", "lang").collect()
    )
    assert ra == rb
    assert len({u for u, _, _ in ra}) == 300


def test_dist_generator_schema_and_html_invariant(spark):
    from search_engine_spark.functions.textproc import extract_text_py

    df = pages_df_dist(spark, 50, n_sites=4, seed=7, n_partitions=4)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    for r in df.collect():
        # the input_hint per-row invariant: extract_text(html) == text
        assert extract_text_py(r["html"]) == r["text"]


def test_driver_and_dist_generators_share_vocab(spark):
    """Both generators draw from the same Zipf vocab (content differs
    by design — seeding schemes are different — but the token space
    must be identical so benchmarks exercise the same skew)."""
    from search_engine_spark.functions.textproc import tokenize_py

    d = pages_df(spark, 40, n_sites=4, seed=42)
    g = pages_df_dist(spark, 40, n_sites=4, seed=42, n_partitions=2)
    vd = {t for r in d.select("text").collect()
          for t in tokenize_py(r["text"])}
    vg = {t for r in g.select("text").collect()
          for t in tokenize_py(r["text"])}
    assert vg <= (vd | vg)  # sanity
    from search_engine_spark.sources.fixtures import _PARTICLE_POOL, _vocab

    allowed = set(_vocab()) | set(_PARTICLE_POOL)
    assert vd <= allowed and vg <= allowed


def test_multi_probe_lsh_recall(spark):
    """Multi-probe (Hamming-1 query probes) dominates single-probe
    recall at the same n_tables, and approaches brute force with
    HALF the tables of the plain config."""
    import numpy as np
    from search_engine_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    # planted-neighbor corpus: uniformly random vectors have no real
    # neighbor structure (any ANN's recall is noise); each query gets
    # 5 planted close neighbors among 250 background vectors
    rng = np.random.RandomState(7)
    dim, n_q, n_planted, n_bg = 32, 8, 5, 250
    rows = []
    vid = 0
    for q in range(n_q):
        base = rng.randn(dim)
        rows.append((vid, base.tolist())); vid += 1
        for _ in range(n_planted):
            rows.append(
                (vid, (base + 0.15 * rng.randn(dim)).tolist())
            ); vid += 1
    for _ in range(n_bg):
        rows.append((vid, rng.randn(dim).tolist())); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    query_ids = [q * (n_planted + 1) for q in range(n_q)]
    queries = df.filter(F.col("vec_id").isin(query_ids))

    def topk(result):
        out = {}
        for r in result.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk(cosine_topk_bruteforce(df, queries, k=5))

    def recall(res):
        hits = sum(
            len(res.get(q, set()) & exact[q]) for q in exact
        )
        return hits / sum(len(v) for v in exact.values())

    plain = topk(cosine_topk_lsh(
        df, queries, k=5, dim=dim, n_planes=6, n_tables=2))
    probed = topk(cosine_topk_lsh(
        df, queries, k=5, dim=dim, n_planes=6, n_tables=2,
        multi_probe=True))
    assert recall(probed) >= recall(plain)
    assert recall(probed) >= 0.85


def test_md5_plane_lsh_matches_python_replay_and_recalls(spark):
    """plane_method='md5': the hyperplane grid is bit-identical to
    the hashlib replay, and on a planted-neighbor corpus the md5
    family recalls planted neighbors about as well as the gaussian
    family (it is a valid SRP — only the component distribution
    differs)."""
    import hashlib

    import numpy as np

    from search_engine_spark.operators.similarity import (
        _hyperplanes_md5,
        cosine_topk_lsh,
    )

    planes = _hyperplanes_md5(8, 3, table=2)
    for i in range(3):
        for d in range(8):
            h = int(
                hashlib.md5(f"2#{i}#{d}".encode()).hexdigest()[17:32],
                16,
            )
            assert planes[i][d] == (h % 2001 - 1000) / 1000.0
    flat = [x for row in planes for x in row]
    assert min(flat) >= -1.0 and max(flat) <= 1.0
    assert len(set(flat)) > 15  # not degenerate

    rng = np.random.RandomState(11)
    dim, n_q, n_planted, n_bg = 32, 6, 5, 200
    rows, vid = [], 0
    for q in range(n_q):
        base = rng.randn(dim)
        rows.append((vid, base.tolist())); vid += 1
        for _ in range(n_planted):
            rows.append(
                (vid, (base + 0.15 * rng.randn(dim)).tolist())
            ); vid += 1
    for _ in range(n_bg):
        rows.append((vid, rng.randn(dim).tolist())); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    query_ids = [q * (n_planted + 1) for q in range(n_q)]
    queries = df.filter(F.col("vec_id").isin(query_ids))
    got = cosine_topk_lsh(
        df, queries, k=n_planted, dim=dim, n_planes=6, n_tables=6,
        plane_method="md5",
    ).collect()
    hits = total = 0
    for q in range(n_q):
        qid = q * (n_planted + 1)
        planted = {qid + j for j in range(1, n_planted + 1)}
        found = {r["neighbor_id"] for r in got if r["query_id"] == qid}
        hits += len(found & planted)
        total += n_planted
    assert hits / total >= 0.6  # ANN recall, planted structure
