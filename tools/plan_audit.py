"""Physical-plan audit over the contract queries.

Prints one line per audited query with the plan properties that
matter at 100 TB, and exits non-zero if a hard rule is violated:

- ``pushed``  — parquet scans carry PushedFilters / partition filters
  when the query is selective (filters reach the source, not a
  post-scan Filter over the full table);
- ``wsc``     — number of WholeStageCodegen spans (JVM-side work);
- ``exch``    — number of Exchanges (shuffles) in the plan;
- ``bhj/smj`` — broadcast vs sort-merge join counts (small sides must
  broadcast);
- ``python``  — per-row Python eval (BatchEvalPython) — MUST be 0
  everywhere (Arrow/pandas stages show as ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas and are allowed where
  declared).

Usage: python tools/plan_audit.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# queries whose plan is audited (a representative slice: scan-heavy,
# join-heavy, UDF-bearing, window-bearing)
AUDITED = [
    "bm25_topk",
    "bm25_prf_topk",
    "bm25_champion_topk",
    "robots_filter",
    "winnow_reuse_pairs",
    "minhash_pairs_md5",
    "simhash_pairs_md5",
    "cms_counts_md5",
    "bm25_site_restricted",
    "bm25_batch",
    "postings",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "gopher_gate",
    "unigram_logprob",
    "training_pipeline",
    "topk_orders",
    "join_revenue_topk",
    "topk_per_site",
    "event_hourly_window",
    "ann_cosine_topk",
    "site_lang_rollup",
    "pii_scan",
    "tfidf_keywords",
    "c4_span_dedup",
    "decontaminate",
    "pack_sequences",
    "stratified_sample",
    "chunk_documents",
    "facet_counts",
    "bm25_batch_compact",
    "fuzzy_terms",
    "sample_per_group",
    "percolate_rarest",
    "hybrid_rrf",
    "bm25_synonyms_topk",
    "lm_dirichlet_topk",
    "min_span_docs",
    "proximity_topk",
    "bigram_logprob",
    "latest_snapshot",
    "site_quality_stats",
    "rank_eval",
    "prefix_search",
    "collocations",
    "near_topk",
    "next_token_suggestions",
    "corpus_diff",
    "bm25_collapsed_topk",
    "bm25_priors_topk",
    "bm25f_anchor_topk",
    "anchor_postings",
    "weighted_sample",
    "hits_scores",
    "click_coec",
    "click_pbm_alpha",
    "bm25_fresh_topk",
    "interleave_balanced",
    "interleave_outcome",
    "related_coclick",
    "query_transitions",
    "bm25_maxscore_topk",
    "ltr_linear_rerank",
    "bm25_tuning",
    "rank_rbo",
    "wildcard_search",
    "lm_jm_topk",
    "cori_shard_scores",
    "kneser_ney_logprob",
    "semantic_decontaminate",
    "did_you_mean",
    "explain_score",
    "bm25_search_after",
    "dismax_topk",
    "impact_topk",
    "bm25_topk_pruned",
    "bm25_rescore_topk",
    "pl2_topk",
    "sdm_topk",
    "bm25_passage_topk",
    "bm25plus_topk",
    "bm25l_topk",
    "ppl_buckets",
    "query_clarity",
    "taily_shard_scores",
    # round-3 additions
    "redde_shard_scores",
    "bloom_bits_md5",
    "bloom_contains_md5",
    "more_like_this_topk",
    "quantile_cells_md5",
    "quantile_ranks_md5",
    "ann_cosine_lsh_md5",
]


def main() -> int:
    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    )
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    failures = []
    results = {}
    for name in AUDITED:
        if name_filter and name_filter not in name:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # codegen spans render as "*(n)" stage prefixes in the plan
        wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        exch = len(re.findall(r"Exchange ", plan))
        bhj = len(re.findall(r"BroadcastHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        pushed = len(
            re.findall(r"PushedFilters: \[[^\]]+\]", plan)
        ) + len(re.findall(r"PartitionFilters: \[[^\]]+\]", plan))
        py_rows = len(re.findall(r"BatchEvalPython", plan))
        arrow = len(
            re.findall(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                plan,
            )
        )
        status = "ok"
        if py_rows:
            status = "FAIL(row-python)"
            failures.append(name)
        print(
            f"{status:18s} {name:24s} wsc={wsc:2d} exch={exch:2d} "
            f"bhj={bhj} smj={smj} pushed={pushed} arrow={arrow} "
            f"rowpy={py_rows}"
        )
        results[name] = {
            "status": status, "codegen_spans": wsc, "exchanges": exch,
            "broadcast_joins": bhj, "sortmerge_joins": smj,
            "pushed_filter_scans": pushed, "arrow_python": arrow,
            "row_python": py_rows,
        }
    spark.stop()
    if not name_filter:
        import json

        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PLAN_AUDIT.json"), "w"
        ) as fh:
            json.dump(
                {"sf_dir": sf_dir, "clean": not failures,
                 "queries": results},
                fh, indent=1,
            )
    if failures:
        print(f"\n{len(failures)} plan failure(s): {failures}")
        return 1
    print("\nall audited plans clean (0 row-at-a-time Python)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
