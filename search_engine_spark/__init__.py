"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild (NOT a port) of the query & data-processing
semantics of KonstantinLi/search_engine (Java/Spring/Lucene-morphology,
reference at /root/reference) re-expressed Spark-first:

- input: a Common-Crawl-style pages table
  ``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
- build: tokenize/lemmatize (Arrow-vectorized pandas UDFs) -> explode ->
  salted repartition-by-term -> delta+varint block-compressed posting
  lists with block-max metadata -> partitioned parquet/Iceberg index
- query: broadcast query-term stats -> rarest-term candidate generation
  (reference semantics, ``SearchServiceImpl.java:164-174``) -> one
  vectorized join for all term TFs -> BM25 column expressions ->
  distributed top-k (TakeOrderedAndProject)

Everything relational is DataFrame built-ins so Catalyst/AQE handle
pushdown, pruning, broadcast selection, and skew; custom code is
confined to the text UDFs, the posting-block codec/WAND scorer, and
salting/manifest logic.
"""

from search_engine_spark.config import BM25Config, EngineConfig

__all__ = [
    "BM25Config",
    "EngineConfig",
    # lazy conveniences (see __getattr__): build_index, compact_index,
    # search, search_compact, build_and_write, load_compact_index,
    # open_index, enrich_pages, read_pages
]
__version__ = "0.1.0"

_LAZY = {
    "build_index": "search_engine_spark.operators.postings",
    "compact_index": "search_engine_spark.operators.compact",
    "search": "search_engine_spark.plans.search",
    "search_compact": "search_engine_spark.plans.wand",
    "search_many_compact": "search_engine_spark.plans.wand",
    "build_and_write": "search_engine_spark.plans.build",
    "load_compact_index": "search_engine_spark.plans.build",
    "open_index": "search_engine_spark.plans.incremental",
    "append_pages": "search_engine_spark.plans.incremental",
    "tombstone_urls": "search_engine_spark.plans.incremental",
    "reindex_pages": "search_engine_spark.plans.incremental",
    "merge_delta_epochs": "search_engine_spark.plans.incremental",
    "vacuum": "search_engine_spark.plans.incremental",
    "enrich_pages": "search_engine_spark.sources.pages",
    "read_pages": "search_engine_spark.sources.pages",
    "canonical_url_col": "search_engine_spark.operators.curation",
    "canonicalize_urls": "search_engine_spark.operators.curation",
    "parse_sitemap": "search_engine_spark.sources.sitemap",
    "read_warc": "search_engine_spark.sources.warc",
    "read_wet": "search_engine_spark.sources.wet",
    "write_wet": "search_engine_spark.sources.wet",
    "read_jsonl": "search_engine_spark.sources.jsonl",
    "write_jsonl": "search_engine_spark.sources.jsonl",
    "rrf_fuse": "search_engine_spark.plans.hybrid",
    "mmr_rerank": "search_engine_spark.plans.diversify",
    "build_champion_lists": "search_engine_spark.operators.champions",
    "prf_expansion_terms": "search_engine_spark.plans.feedback",
    "search_champions": "search_engine_spark.operators.champions",
    "robots_rules": "search_engine_spark.operators.robots",
    "robots_allowed": "search_engine_spark.operators.robots",
    "filter_by_robots": "search_engine_spark.operators.robots",
    "winnow_fingerprints": "search_engine_spark.operators.winnow",
    "winnow_reuse_pairs": "search_engine_spark.operators.winnow",
    "search_prf": "search_engine_spark.plans.feedback",
    "vsm_topk": "search_engine_spark.plans.vsm",
    "vsm_doc_norms": "search_engine_spark.plans.vsm",
    "kmeans_lloyd": "search_engine_spark.operators.embcluster",
    "assign_centroids": "search_engine_spark.operators.embcluster",
    "semantic_dedup": "search_engine_spark.operators.embcluster",
    "cluster_top_terms": "search_engine_spark.operators.embcluster",
    "hybrid_topk": "search_engine_spark.plans.hybrid",
    "explain_prune": "search_engine_spark.plans.wand",
    "parse_simple_query": "search_engine_spark.plans.boolquery",
    "search_boolean": "search_engine_spark.plans.boolquery",
    "search_boolean_compact": "search_engine_spark.plans.boolquery",
    "percolate": "search_engine_spark.plans.percolate",
    "percolate_pages": "search_engine_spark.plans.percolate",
    "percolate_stream": "search_engine_spark.plans.percolate",
    "prepare_queries": "search_engine_spark.plans.percolate",
    "statistics_report": "search_engine_spark.plans.statistics",
    "attach_snippets": "search_engine_spark.plans.snippets",
    "extract_links_col": "search_engine_spark.functions.textproc",
    "link_frontier": "search_engine_spark.functions.textproc",
    "simhash_near_dup_pairs": "search_engine_spark.operators.dedup",
    "minhash_lsh_pairs": "search_engine_spark.operators.dedup",
    "ngram_jaccard_pairs": "search_engine_spark.operators.dedup",
    "ngram_containment_pairs": "search_engine_spark.operators.dedup",
    "exact_dedup": "search_engine_spark.operators.dedup",
    "connected_components": "search_engine_spark.operators.clusters",
    "assign_clusters": "search_engine_spark.operators.clusters",
    "dedup_keep_representative": "search_engine_spark.operators.clusters",
    "prepare_training_data": "search_engine_spark.plans.pipeline",
    "PipelineConfig": "search_engine_spark.plans.pipeline",
    "streaming_exact_dedup": "search_engine_spark.streaming.dedup",
    "trending_terms": "search_engine_spark.streaming.trending",
    "top_terms_per_window": "search_engine_spark.streaming.trending",
    "sessionize": "search_engine_spark.operators.sessions",
    "session_stats": "search_engine_spark.operators.sessions",
    "user_activity_sketch": "search_engine_spark.operators.sessions",
    "asof_join": "search_engine_spark.operators.asof",
    "range_join": "search_engine_spark.operators.range",
    "phrase_match": "search_engine_spark.operators.phrases",
    "phrase_search": "search_engine_spark.operators.phrases",
    "positional_postings": "search_engine_spark.operators.phrases",
    "gopher_gate": "search_engine_spark.operators.curation",
    "gopher_metrics": "search_engine_spark.operators.curation",
    "ngram_repetition": "search_engine_spark.operators.curation",
    "unigram_logprob": "search_engine_spark.operators.curation",
    "assign_split": "search_engine_spark.operators.curation",
    "bm25f_topk": "search_engine_spark.plans.search",
    "more_like_this": "search_engine_spark.plans.search",
    "facet_counts": "search_engine_spark.plans.search",
    "corpus_rollup": "search_engine_spark.plans.statistics",
    "cosine_topk_ivfpq": "search_engine_spark.operators.similarity",
    "pq_encode": "search_engine_spark.operators.similarity",
    "train_pq_codebooks": "search_engine_spark.operators.similarity",
    "chunk_documents": "search_engine_spark.operators.packing",
    "pack_sequences": "search_engine_spark.operators.packing",
    "exclusive_prefix_sum": "search_engine_spark.operators.packing",
    "pagerank": "search_engine_spark.operators.graph",
    "recency_prior": "search_engine_spark.plans.freshness",
    "search_fresh": "search_engine_spark.plans.freshness",
    "hits": "search_engine_spark.operators.graph",
    "position_ctr": "search_engine_spark.operators.clicks",
    "coec_scores": "search_engine_spark.operators.clicks",
    "pbm_em_step": "search_engine_spark.operators.clicks",
    "suggest_terms": "search_engine_spark.operators.fuzzy",
    "stratified_sample": "search_engine_spark.operators.curation",
    "out_degrees": "search_engine_spark.operators.graph",
    "fuzzy_terms": "search_engine_spark.operators.fuzzy",
    "build_variant_index": "search_engine_spark.operators.fuzzy",
    "correct_query_terms": "search_engine_spark.operators.fuzzy",
    "annotate_pii": "search_engine_spark.functions.pii",
    "redact_pii": "search_engine_spark.functions.pii",
    "contaminated_ids": "search_engine_spark.operators.dedup",
    "decontaminate": "search_engine_spark.operators.dedup",
    "tfidf_keywords": "search_engine_spark.operators.curation",
    "filter_urls": "search_engine_spark.operators.curation",
    "sample_n_per_group": "search_engine_spark.operators.curation",
    "bigram_logprob": "search_engine_spark.operators.curation",
    "latest_snapshot": "search_engine_spark.operators.curation",
    "site_quality_stats": "search_engine_spark.operators.curation",
    "filter_quality_domains": "search_engine_spark.operators.curation",
    "rank_eval": "search_engine_spark.plans.eval",
    "rank_eval_summary": "search_engine_spark.plans.eval",
    "search_synonyms": "search_engine_spark.plans.synonyms",
    "expand_terms": "search_engine_spark.plans.synonyms",
    "search_groups": "search_engine_spark.plans.synonyms",
    "search_prefix": "search_engine_spark.plans.prefix",
    "search_prefix_compact": "search_engine_spark.plans.prefix",
    "search_synonyms_compact": "search_engine_spark.plans.synonyms",
    "search_lm_compact": "search_engine_spark.plans.lm",
    "logical_view": "search_engine_spark.plans.wand",
    "expand_prefix": "search_engine_spark.plans.prefix",
    "collocations": "search_engine_spark.operators.curation",
    "near_match": "search_engine_spark.operators.phrases",
    "near_search": "search_engine_spark.operators.phrases",
    "compact_positions": "search_engine_spark.operators.phrases",
    "decode_positions": "search_engine_spark.operators.phrases",
    "write_compact_positional_index": "search_engine_spark.operators.phrases",
    "read_compact_positions": "search_engine_spark.operators.phrases",
    "phrase_match_compact": "search_engine_spark.operators.phrases",
    "near_match_compact": "search_engine_spark.operators.phrases",
    "next_token_suggestions": "search_engine_spark.operators.curation",
    "corpus_diff": "search_engine_spark.operators.curation",
    "corpus_diff_summary": "search_engine_spark.operators.curation",
    "search_lm": "search_engine_spark.plans.lm",
    "min_cover_span": "search_engine_spark.operators.phrases",
    "proximity_search": "search_engine_spark.operators.phrases",
    "cms_build": "search_engine_spark.operators.sketches",
    "cms_merge": "search_engine_spark.operators.sketches",
    "cms_estimate": "search_engine_spark.operators.sketches",
    "hll_build": "search_engine_spark.operators.sketches",
    "hll_merge": "search_engine_spark.operators.sketches",
    "hll_estimate": "search_engine_spark.operators.sketches",
    "learn_bpe": "search_engine_spark.operators.bpe",
    "bpe_encode": "search_engine_spark.operators.bpe",
    "bpe_vocab": "search_engine_spark.operators.bpe",
    "merges_table": "search_engine_spark.operators.bpe",
    "remove_duplicate_token_spans": "search_engine_spark.operators.curation",
    "search_federated": "search_engine_spark.plans.federate",
    "federated_view": "search_engine_spark.plans.federate",
    "merged_stats": "search_engine_spark.plans.federate",
    "token_window_table": "search_engine_spark.operators.curation",
    "hashed_ngram_counts": "search_engine_spark.operators.selection",
    "dsir_log_weights": "search_engine_spark.operators.selection",
    "dsir_resample": "search_engine_spark.operators.selection",
    "train_quality_classifier": "search_engine_spark.operators.selection",
    "score_quality": "search_engine_spark.operators.selection",
    "pareto_filter": "search_engine_spark.operators.selection",
    "sample_mixture": "search_engine_spark.operators.mixing",
    "upsample_mixture": "search_engine_spark.operators.mixing",
    "mixture_rates_for_budget": "search_engine_spark.operators.mixing",
}


def __getattr__(name: str):
    # lazy re-exports keep `import search_engine_spark` light (no
    # pandas/numpy import cost until an operator is actually used)
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(mod), name)
