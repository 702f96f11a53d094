"""Federated search over multiple independently-built compact indexes.

A 100 TB corpus is rarely one build: crawls land as per-snapshot or
per-shard indexes (each built/maintained on its own cadence with
plans/build.py).  Federation lets one query treat N such indexes as a
single corpus with EXACT global statistics — bit-identical ranking to
a monolithic index over the concatenated corpus (pytest-pinned):

- ``df`` merges by integer addition per term;
- ``n_docs`` adds; ``avg_len`` re-derives from the exact integer token
  totals (each shard's ``avg_len`` is an exact int-sum/count, so
  ``round(avg_len · n_docs)`` recovers the shard's total exactly for
  any total below 2^52 tokens — comfortably past 100 TB of text);
- the stop-list is recomputed from the MERGED df table with the same
  R14 rule, so a term that is stop-frequent only globally stops
  globally, exactly as in a monolithic build.

Plan shape: per shard the decode stays the compact fast path
(bucket-partition-pruned scan of the query terms' segments only,
Arrow block decode); the union of the decoded postings is a
no-shuffle concatenation; scoring then runs the unchanged logical
executor against the merged-stats view.  Stats merging is
metadata-scale (term_stats rows), never corpus-scale.

Corpora must be DISJOINT on the public id (a url in two shards would
double-score); route re-crawl snapshots through
``operators/curation.latest_snapshot`` / ``corpus_diff`` before
building, or pass ``check_disjoint=True`` to pay one count for an
assertion.

No reference counterpart (the reference is single-database by
construction: one PostgreSQL schema per deployment,
services/impl/SearchServiceImpl.java queries one ``lemma`` table);
semantics follow distributed IR's standard exact-global-statistics
federation.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.compact import CompactIndex
from search_engine_spark.operators.postings import (
    InvertedIndex,
    compute_stoplist,
)
from search_engine_spark.plans.search import analyze_query, search


def _check_compatible(cidxs: list[CompactIndex]) -> None:
    if not cidxs:
        raise ValueError("need at least one index")
    head = cidxs[0]
    for c in cidxs[1:]:
        if c.id_col != head.id_col:
            raise ValueError(
                f"id_col mismatch: {c.id_col!r} vs {head.id_col!r}"
            )
        if (
            c.config.bm25.k1 != head.config.bm25.k1
            or c.config.bm25.b != head.config.bm25.b
            or c.config.stoplist_size != head.config.stoplist_size
        ):
            raise ValueError(
                "indexes were built with different scoring configs"
            )


def merged_stats(
    cidxs: list[CompactIndex],
) -> tuple[DataFrame, DataFrame, int, float]:
    """``(term_stats, site_stats, n_docs, avg_len)`` over the union
    corpus, each exact (integer adds; avg from exact totals)."""
    _check_compatible(cidxs)
    term_stats = reduce(
        DataFrame.unionByName,
        [c.term_stats.select("term", "df") for c in cidxs],
    ).groupBy("term").agg(F.sum("df").alias("df"))
    site_stats = reduce(
        DataFrame.unionByName,
        [c.site_stats.select("site", "pages") for c in cidxs],
    ).groupBy("site").agg(F.sum("pages").alias("pages"))
    n_docs = sum(c.n_docs for c in cidxs)
    total_len = sum(round(c.avg_len * c.n_docs) for c in cidxs)
    avg_len = (total_len / n_docs) if n_docs else 0.0
    return term_stats, site_stats, n_docs, avg_len


def federated_view(
    cidxs: list[CompactIndex],
    terms: list[str],
    check_disjoint: bool = False,
) -> InvertedIndex:
    """:class:`InvertedIndex`-shaped view of N compact indexes as ONE
    corpus, restricted to ``terms`` (each shard decodes only those
    terms' segments — the same O(query-term postings) guarantee as
    :func:`plans.wand.logical_view`)."""
    from search_engine_spark.plans.wand import logical_view

    _check_compatible(cidxs)
    id_col = cidxs[0].id_col
    views = [logical_view(c, terms) for c in cidxs]
    postings = reduce(
        DataFrame.unionByName, [v.postings for v in views]
    )
    doc_lens = reduce(
        DataFrame.unionByName, [v.doc_lens for v in views]
    )
    if check_disjoint:
        n_ids = doc_lens.select(id_col).distinct().count()
        n_rows = doc_lens.count()
        if n_ids != n_rows:
            raise ValueError(
                f"shards overlap on {id_col}: {n_rows - n_ids} "
                "duplicate ids (dedup the corpora before building)"
            )
    term_stats, site_stats, n_docs, avg_len = merged_stats(cidxs)
    stoplist = compute_stoplist(
        term_stats, n_docs, cidxs[0].config.stoplist_size
    )
    return InvertedIndex(
        postings=postings,
        doc_lens=doc_lens,
        term_stats=term_stats,
        site_stats=site_stats,
        n_docs=n_docs,
        avg_len=avg_len,
        stoplist=stoplist,
        id_col=id_col,
        config=cidxs[0].config,
    )


CORI_B = 0.4  # Callan's default belief floor
CORI_DF_BASE = 50.0
CORI_CW_SCALE = 150.0


def cori_shard_scores(
    cidxs: list[CompactIndex],
    query: str,
    lang: str = "english",
    analyzer: str = "lemma",
) -> list[tuple[int, float]]:
    """CORI resource ranking (Callan, Lu & Croft, SIGIR 1995 §4) —
    score each shard's usefulness for ``query`` from per-shard
    METADATA only (no postings touched):

        T = df / (df + 50 + 150 · cw_i / avg_cw)
        I = log((|DB| + 0.5) / cf_t) / log(|DB| + 1)
        p(t|C_i) = b + (1 − b) · T · I          (b = 0.4)
        belief_i = mean over query terms with cf_t > 0

    where ``df`` = shard document frequency, ``cw_i`` = shard token
    count (reconstructed exactly from avg_len·n_docs, the same
    integer-total trick as :func:`merged_stats`), ``cf_t`` = number
    of shards containing t, ``|DB|`` = shard count.  Terms absent
    from every shard drop out (R1 unknown-term semantics); a query
    with no known term scores every shard 0.0.

    Selection is recall-oriented, so terms are NOT stop-filtered —
    a term that is stop-frequent globally can still be the signal
    that one shard specialises in it.

    Scale shape: ONE union-of-term_stats job (each leg a ``term IN``
    filtered probe of a metadata table) collects |shards| × |terms|
    rows; the formula is driver arithmetic over that.  Returns
    ``[(shard_index, belief)]`` in input order."""
    _check_compatible(cidxs)
    terms = sorted(set(analyze_query(query, lang, analyzer)))
    if not terms:
        return [(i, 0.0) for i in range(len(cidxs))]
    n_db = len(cidxs)
    cws = [float(round(c.avg_len * c.n_docs)) for c in cidxs]
    avg_cw = sum(cws) / n_db
    probes = [
        c.term_stats.filter(F.col("term").isin(terms)).select(
            F.lit(i).alias("shard"), "term", "df"
        )
        for i, c in enumerate(cidxs)
    ]
    rows = reduce(DataFrame.unionByName, probes).collect()
    dfs: list[dict[str, int]] = [{} for _ in cidxs]
    for r in rows:
        dfs[r["shard"]][r["term"]] = int(r["df"])
    cf = {t: sum(1 for d in dfs if d.get(t, 0) > 0) for t in terms}
    known = [t for t in terms if cf[t] > 0]
    out = []
    for i in range(n_db):
        if not known:
            out.append((i, 0.0))
            continue
        s = 0.0
        for t in known:
            df = dfs[i].get(t, 0)
            t_part = df / (
                df + CORI_DF_BASE + CORI_CW_SCALE * cws[i] / avg_cw
            )
            i_part = math.log((n_db + 0.5) / cf[t]) / math.log(
                n_db + 1.0
            )
            s += CORI_B + (1.0 - CORI_B) * t_part * i_part
        out.append((i, s / len(known)))
    return out


def select_shards(
    cidxs: list[CompactIndex],
    query: str,
    n_shards: int,
    lang: str = "english",
    analyzer: str = "lemma",
) -> list[int]:
    """Indexes of the ``n_shards`` highest-belief shards for
    ``query`` (belief desc, shard index asc — deterministic)."""
    scores = cori_shard_scores(cidxs, query, lang, analyzer)
    ranked = sorted(scores, key=lambda sb: (-sb[1], sb[0]))
    return [i for i, _ in ranked[: max(0, n_shards)]]


def search_federated(
    cidxs: list[CompactIndex],
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
    fuzzy: bool = False,
    fuzzy_max_dist: int = 1,
    candidates: str = "rarest",
    exclude_terms: list[str] | None = None,
    check_disjoint: bool = False,
    max_shards: int | None = None,
) -> DataFrame:
    """BM25 top-k over N compact indexes as one corpus — rank- and
    score-identical to a monolithic index built over the concatenated
    corpus (pytest-pinned).  Same contract as :func:`plans.search.
    search`; fuzzy correction and stop-removal run against the MERGED
    dictionary, so query rewrites match the monolithic behavior too.

    ``max_shards``: standard federated resource selection — rank
    shards with :func:`cori_shard_scores` and search only the top
    ``max_shards`` (an approximation: docs in unselected shards
    can't rank, and global statistics merge over the SELECTED shards
    only — distributed IR's usual trade; ``max_shards >= len(cidxs)``
    degrades to the exact path).
    """
    if max_shards is not None and max_shards < len(cidxs):
        keep = set(
            select_shards(cidxs, query, max_shards, lang, analyzer)
        )
        cidxs = [c for i, c in enumerate(cidxs) if i in keep]
    terms = analyze_query(query, lang, analyzer)
    decode = set(terms)
    for t in exclude_terms or []:
        decode.update(analyze_query(t, lang, analyzer))
    view: InvertedIndex | None = None
    if fuzzy and terms:
        # pre-correct against the merged dictionary so the view decodes
        # the CORRECTED terms; search() re-runs the identical correction
        # against the same merged term_stats, deterministically
        from search_engine_spark.operators.fuzzy import (
            correct_query_terms,
        )

        view = federated_view(
            cidxs, sorted(decode), check_disjoint=check_disjoint
        )
        fixes = correct_query_terms(
            view.term_stats, terms, max_dist=fuzzy_max_dist
        )
        corrected = {v for v in fixes.values() if v}
        if corrected - decode:
            decode |= corrected
            view = None  # rebuild below with the corrected terms
    if view is None:
        view = federated_view(
            cidxs, sorted(decode), check_disjoint=check_disjoint
        )
    return search(
        view,
        query,
        sites=sites,
        offset=offset,
        limit=limit,
        lang=lang,
        analyzer=analyzer,
        use_stoplist=use_stoplist,
        fuzzy=fuzzy,
        fuzzy_max_dist=fuzzy_max_dist,
        candidates=candidates,
        exclude_terms=exclude_terms,
    )


# ---------------------------------------------------------------------------
# Taily shard selection (Aly, Hiemstra & Demeester, SIGIR 2013)
# ---------------------------------------------------------------------------
#
# CORI ranks shards by a belief heuristic over df alone; Taily instead
# MODELS each shard's score distribution: per (shard, term) it stores
# the document frequency and the first two moments of the per-document
# term score, fits a Gamma to the query's (independence-summed) score
# distribution per shard, and estimates HOW MANY documents in that
# shard would make the global top-n_c — shards expected to contribute
# < v docs are skipped.  The stats are metadata-scale (one row per
# (shard, term)), built in ONE pass over each shard's postings at
# build/maintenance time; query-time work is driver arithmetic over
# |shards| × |query terms| collected rows, exactly like CORI.


def _gammp(k: float, x: float) -> float:
    """Regularized lower incomplete gamma P(k, x) — series expansion
    for x < k+1, continued fraction (Lentz) otherwise (the standard
    Numerical-Recipes-style split, implemented from the published
    formulas)."""
    if x <= 0.0:
        return 0.0
    if k <= 0.0:
        return 1.0
    lg = math.lgamma(k)
    if x < k + 1.0:
        ap, total, term = k, 1.0 / k, 1.0 / k
        for _ in range(500):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + k * math.log(x) - lg)
    # continued fraction for Q(k, x), then P = 1 - Q
    tiny = 1e-300
    b = x + 1.0 - k
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - k)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + k * math.log(x) - lg) * h
    return 1.0 - q


def _gamma_sf(k: float, theta: float, s: float) -> float:
    """P(X > s) for X ~ Gamma(shape k, scale theta)."""
    if s <= 0.0:
        return 1.0
    return 1.0 - _gammp(k, s / theta)


def _gamma_isf(k: float, theta: float, p: float) -> float:
    """Score s with survival probability p — bisection on the
    monotone survival function (driver-side, ~50 iterations)."""
    if p >= 1.0:
        return 0.0
    if p <= 0.0:
        return float("inf")
    lo, hi = 0.0, max(k * theta, theta) or 1.0
    while _gamma_sf(k, theta, hi) > p:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _gamma_sf(k, theta, mid) > p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


def taily_term_stats(index: InvertedIndex) -> DataFrame:
    """``(term, n, s1, s2)`` — per-term document frequency and the
    first two moments (Σs, Σs²) of the per-document term score

        s(t, d) = idf_t · bm25(tf, doc_len)

    under the SHARD'S OWN statistics (plans/search.py R11/R12
    expressions).  ONE postings ⋈ doc_lens pass + one
    map-side-combined aggregation; the result is metadata-scale (one
    row per term) and is what a shard publishes to the Taily broker
    at build/maintenance time."""
    id_col = index.id_col
    k1, b = index.config.bm25.k1, index.config.bm25.b
    n = float(index.n_docs)
    idf_expr = F.log(
        (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = index.postings.join(
        index.doc_lens.select(id_col, "doc_len"), id_col
    ).join(F.broadcast(index.term_stats.select("term", "df")), "term")
    tfn = F.col("tf").cast("double") / F.col("doc_len")
    u = (
        tfn
        * F.lit(k1 + 1.0)
        / (
            tfn
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doc_len") / F.lit(index.avg_len)
            )
        )
    )
    scored = scored.withColumn("_s", idf_expr * u)
    return scored.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_s").alias("s1"),
        F.sum(F.col("_s") * F.col("_s")).alias("s2"),
    )


def taily_shard_scores(
    stats: list[tuple[DataFrame, int]],
    query: str,
    n_c: int = 100,
    lang: str = "english",
    analyzer: str = "lemma",
) -> list[tuple[int, float]]:
    """Taily resource ranking: ``[(shard_index, est_docs)]`` — the
    estimated number of shard-i documents that would rank in the
    global top-``n_c``, in input order.

    ``stats`` is ``[(taily_term_stats frame, n_docs)]`` per shard.
    Per shard the query score is modelled Gamma via moment matching
    over the conjunctive (all-terms) doc set:

        f_i   = n_i^(1−|Q|) · Π_t n_{t,i}      (co-occurrence indep.)
        E_i   = Σ_t s1/n,   Var_i = Σ_t (s2/n − (s1/n)²)
        k_i   = E_i²/Var_i,  θ_i = Var_i/E_i

    the global cutoff s_c solves Σ_i f_i·SF_i(s_c) = n_c on the
    moment-merged all-shards Gamma, and est_i = f_i·SF_i(s_c).
    Query-time cost: one ``term IN`` metadata probe per shard +
    driver arithmetic (the published broker design)."""
    terms = sorted(set(analyze_query(query, lang, analyzer)))
    n_shards = len(stats)
    if not terms or not n_shards:
        return [(i, 0.0) for i in range(n_shards)]

    probes = [
        sdf.filter(F.col("term").isin(terms)).select(
            F.lit(i).alias("shard"), "term", "n", "s1", "s2"
        )
        for i, (sdf, _) in enumerate(stats)
    ]
    rows = reduce(DataFrame.unionByName, probes).collect()
    per: list[dict[str, tuple[int, float, float]]] = [
        {} for _ in range(n_shards)
    ]
    for r in rows:
        per[r["shard"]][r["term"]] = (
            int(r["n"]), float(r["s1"]), float(r["s2"]),
        )

    fits = []  # (f_i, E_i, Var_i) or None
    for i, (_, n_docs) in enumerate(stats):
        if any(t not in per[i] or per[i][t][0] == 0 for t in terms):
            fits.append(None)
            continue
        f_i = float(n_docs) ** (1 - len(terms))
        e = v = 0.0
        for t in terms:
            n_t, s1, s2 = per[i][t]
            f_i *= n_t
            m1 = s1 / n_t
            e += m1
            v += max(s2 / n_t - m1 * m1, 0.0)
        fits.append((f_i, e, v))

    live = [f for f in fits if f and f[0] > 0 and f[1] > 0]
    if not live:
        return [(i, 0.0) for i in range(n_shards)]
    f_all = sum(f for f, _, _ in live)
    e_all = sum(f * e for f, e, _ in live) / f_all
    m2_all = sum(f * (v + e * e) for f, e, v in live) / f_all
    var_all = max(m2_all - e_all * e_all, 1e-12)
    k_all = e_all * e_all / var_all
    th_all = var_all / e_all

    if n_c >= f_all:
        s_c = 0.0
    else:
        s_c = _gamma_isf(k_all, th_all, n_c / f_all)

    out = []
    for i, fit in enumerate(fits):
        if fit is None or fit[0] <= 0 or fit[1] <= 0:
            out.append((i, 0.0))
            continue
        f_i, e, v = fit
        v = max(v, 1e-12)
        k_i, th_i = e * e / v, v / e
        out.append((i, f_i * _gamma_sf(k_i, th_i, s_c)))
    return out


def taily_shard_scores_erlang(
    stats: list[tuple[DataFrame, int]],
    query: str,
    s_c: float,
    lang: str = "english",
    analyzer: str = "lemma",
) -> list[tuple[int, float]]:
    """Integer-shape (Erlang) Taily variant — the SQL-checkable form
    of :func:`taily_shard_scores`.

    Same per-shard moment fit (f_i, E_i, V_i) as the full broker, but
    the Gamma shape is clamped to a positive integer
    ``k = floor(E²/V + 0.5)`` in [1, 100] with a mean-preserving scale
    ``θ = E/k``, and the global cutoff ``s_c`` is an INPUT instead of
    the bisection solution.  With integer k the survival function has
    the closed Erlang form

        SF(s) = e^{-x} · Σ_{j=0}^{k-1} x^j / j!,   x = s/θ

    — a finite sum DuckDB computes exactly, so this variant carries
    the contract's hash-checked oracle (``taily_shard_scores_erlang``
    in ``__spark_entry__.py``), pinning the whole broker pipeline
    (term-stat moments → co-occurrence estimate → Gamma fit →
    survival mass) end-to-end; only the fractional-shape continued
    fraction and the cutoff bisection of the full variant stay
    pytest-pinned (tests/test_taily.py closed-form checks).
    Reference: Aly, Hiemstra, Demeester, "Taily: shard selection
    using the tail of score distributions", SIGIR 2013.
    """
    terms = sorted(set(analyze_query(query, lang, analyzer)))
    n_shards = len(stats)
    if not terms or not n_shards:
        return [(i, 0.0) for i in range(n_shards)]

    probes = [
        sdf.filter(F.col("term").isin(terms)).select(
            F.lit(i).alias("shard"), "term", "n", "s1", "s2"
        )
        for i, (sdf, _) in enumerate(stats)
    ]
    rows = reduce(DataFrame.unionByName, probes).collect()
    per: list[dict[str, tuple[int, float, float]]] = [
        {} for _ in range(n_shards)
    ]
    for r in rows:
        per[r["shard"]][r["term"]] = (
            int(r["n"]), float(r["s1"]), float(r["s2"]),
        )

    out = []
    for i, (_, n_docs) in enumerate(stats):
        if any(t not in per[i] or per[i][t][0] == 0 for t in terms):
            out.append((i, 0.0))
            continue
        f_i = float(n_docs) ** (1 - len(terms))
        e = v = 0.0
        for t in terms:
            n_t, s1, s2 = per[i][t]
            f_i *= n_t
            m1 = s1 / n_t
            e += m1
            v += max(s2 / n_t - m1 * m1, 0.0)
        if f_i <= 0 or e <= 0:
            out.append((i, 0.0))
            continue
        v = max(v, 1e-12)
        k = int(min(max(math.floor(e * e / v + 0.5), 1), 100))
        theta = e / k
        x = s_c / theta
        sf = math.exp(-x) * sum(
            x**j / math.factorial(j) for j in range(k)
        )
        out.append((i, f_i * sf))
    return out


def select_shards_taily(
    stats: list[tuple[DataFrame, int]],
    query: str,
    n_c: int = 100,
    v: float = 1.0,
    lang: str = "english",
    analyzer: str = "lemma",
) -> list[int]:
    """Shards whose estimated top-``n_c`` contribution is ≥ ``v``
    docs (est desc, shard index asc) — Taily's cutoff rule."""
    scores = taily_shard_scores(stats, query, n_c, lang, analyzer)
    keep = [(i, s) for i, s in scores if s >= v]
    return [i for i, _ in sorted(keep, key=lambda t: (-t[1], t[0]))]


# ---------------------------------------------------------------------------
# ReDDE: sample-based resource selection (Si & Callan, SIGIR 2003)
# ---------------------------------------------------------------------------

# A doc is sampled into the central sample index (CSI) iff the 60-bit
# md5-substring hash of its id is below fraction·2^60 — the same
# SQL-reproducible hash idiom as operators/sketches (DuckDB twin:
# ('0x' || substr(md5(id::VARCHAR), 18, 15))::BIGINT), so the whole
# selection pipeline is oracle-checkable end to end.
REDDE_HASH_BITS = 60


def _md5_hash60(col: F.Column) -> F.Column:
    return F.conv(
        F.substring(F.md5(col.cast("string")), 18, 15), 16, 10
    ).cast("long")


def redde_csi(
    shard_docs: list[DataFrame],
    fraction: float,
    id_col: str = "url",
    analyzer: str = "lemma",
    config=None,
    shard_n_docs: list[int] | None = None,
):
    """Build ReDDE's central sample index over per-shard enriched
    pages frames: a deterministic md5-hash sample of each shard
    (every node agrees on membership with no coordination, and the
    DuckDB oracle can replay the draw), unioned and indexed with the
    unchanged :func:`~search_engine_spark.operators.postings.build_index`.

    Returns ``(csi, shard_of, sizes)`` where ``shard_of`` maps each
    sampled id to its source shard index and ``sizes`` is
    ``[(n_docs_j, n_sample_j)]`` — ReDDE's per-shard scale factors.

    Scale shape: the CSI is built ONCE offline over fraction·corpus
    and reused across every query (Si & Callan §3.1's
    query-independent sample database); pass ``shard_n_docs`` when
    shard sizes are already known from build metadata to skip the
    full-shard counts.  No reference counterpart (single-database
    deployment); semantics follow the paper.
    """
    if not shard_docs:
        raise ValueError("need at least one shard")
    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    from search_engine_spark.config import DEFAULT as _DEFAULT
    from search_engine_spark.operators.postings import build_index

    thr = int(fraction * (1 << REDDE_HASH_BITS))
    samples, sizes = [], []
    for j, docs in enumerate(shard_docs):
        samp = docs.filter(_md5_hash60(F.col(id_col)) < F.lit(thr))
        samp = samp.withColumn("_redde_shard", F.lit(j)).cache()
        n_docs = (
            shard_n_docs[j] if shard_n_docs is not None else docs.count()
        )
        sizes.append((int(n_docs), int(samp.count())))
        samples.append(samp)
    union = reduce(DataFrame.unionByName, samples)
    shard_of = union.select(
        F.col(id_col), F.col("_redde_shard").alias("shard")
    )
    csi = build_index(
        union.drop("_redde_shard"),
        id_col=id_col,
        analyzer=analyzer,
        config=config or _DEFAULT,
    )
    csi.cached = tuple(csi.cached) + tuple(samples)
    return csi, shard_of, sizes


def redde_shard_scores(
    csi,
    shard_of: DataFrame,
    sizes: list[tuple[int, int]],
    query: str,
    n_csi: int = 100,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
) -> DataFrame:
    """ReDDE resource ranking (Si & Callan, SIGIR 2003 §3.2):
    retrieve the top-``n_csi`` sample docs for ``query`` from the
    CSI with the engine's unchanged BM25 scorer, let each vote for
    its source shard scaled by that shard's inverse sampling rate,

        est_rel_j = votes_j · N_j / n_j
        score_j   = est_rel_j / Σ_k est_rel_k   (0 when no votes)

    Returns ``(shard, votes, est_rel, score)`` with EVERY shard
    present (zero-filled), ordered by shard.

    Scale shape: one CSI top-k (O(query-term postings of the sample),
    TakeOrderedAndProject) + a broadcast join of the ≤ ``n_csi``-row
    result against ``shard_of``; everything after is |shards|-row
    metadata arithmetic — no full-shard postings are touched.
    """
    from pyspark.sql import Window

    spark = shard_of.sparkSession
    top = search(
        csi, query, offset=0, limit=n_csi, lang=lang,
        analyzer=analyzer, use_stoplist=use_stoplist,
    )
    id_col = csi.id_col
    voted = (
        F.broadcast(top.select(id_col))
        .join(shard_of, id_col)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    size_df = spark.createDataFrame(
        [(j, int(nd), int(ns)) for j, (nd, ns) in enumerate(sizes)],
        "shard int, n_docs long, n_sample long",
    )
    est = (
        size_df.join(voted, "shard", "left")
        .withColumn("votes", F.coalesce(F.col("votes"), F.lit(0)))
        .withColumn(
            "est_rel",
            F.when(
                F.col("n_sample") > 0,
                F.col("votes").cast("double")
                * F.col("n_docs")
                / F.col("n_sample"),
            ).otherwise(F.lit(0.0)),
        )
    )
    # |shards|-row frame: the empty-frame window is metadata-scale
    tot = F.sum("est_rel").over(Window.partitionBy())
    return (
        est.withColumn(
            "score",
            F.when(tot > 0, F.col("est_rel") / tot).otherwise(F.lit(0.0)),
        )
        .select(
            F.col("shard").cast("int").alias("shard"),
            F.col("votes"),
            F.round("est_rel", 6).alias("est_rel"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("shard")
    )


def select_shards_redde(
    csi,
    shard_of: DataFrame,
    sizes: list[tuple[int, int]],
    query: str,
    n_shards: int,
    n_csi: int = 100,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
) -> list[int]:
    """Indexes of the ``n_shards`` highest-ReDDE-score shards
    (score desc, shard index asc — deterministic)."""
    rows = redde_shard_scores(
        csi, shard_of, sizes, query, n_csi, lang, analyzer,
        use_stoplist,
    ).collect()
    ranked = sorted(rows, key=lambda r: (-r["score"], r["shard"]))
    return [int(r["shard"]) for r in ranked[: max(0, n_shards)]]
