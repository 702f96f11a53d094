"""spark-submit job: BM25 top-k query against a persisted index.

    spark-submit --py-files search_engine_spark.zip jobs/search.py \
        --index /data/index_dir --query "free text query" \
        [--queries-file q.txt]  # batch: all queries in ONE job \
        [--index /data/other_index ...]  # federated, exact global stats \
        [--site host1 --site host2] [--offset 0] [--limit 20] \
        [--no-prune]  # disable block-max WAND, exact reference path \
        [--ranker bm25|lm|pl2|synonyms|prefix|wildcard|maxscore|
                  impact|rescore] \
        [--mu 2000] [--c 1.0] \
        [--synonyms '{"fast": ["quick"]}'] [--max-expansions 50]

Prints one JSON line per result row: {url, site, score, rn} — the
rebuild's counterpart of the reference's GET /api/search endpoint
(controllers/ApiController.java:72-89), with snippets added via
--snippets.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, action="append",
                    help="persisted index dir; repeat for federated "
                         "search over several per-shard/per-crawl "
                         "indexes (exact merged global stats — "
                         "plans/federate.py; bm25 ranker only)")
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None,
                    help="batch mode: file with one query per line, "
                         "all executed as ONE Spark job "
                         "(search_many_compact — the high-throughput "
                         "serving shape); prints rows with query_id "
                         "+ query; default bm25 ranker only")
    ap.add_argument("--site", action="append", default=None)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--no-prune", action="store_true")
    ap.add_argument("--bool", dest="bool_query", action="store_true",
                    help='boolean mini-language: +must -not "phrase"')
    ap.add_argument(
        "--ranker", default="bm25",
        choices=[
            "bm25", "maxscore", "lm", "pl2", "synonyms", "prefix",
            "wildcard", "impact", "rescore",
        ],
        help="bm25 (default, block-max WAND, rarest-term candidates)"
             " | maxscore (union/OR candidates, MaxScore-pruned) "
             "| lm (Dirichlet query likelihood) | pl2 (DFR "
             "divergence-from-randomness, --c) | synonyms (group "
             "BM25, needs --synonyms) | prefix (trailing-* units "
             "expand against the dictionary) | impact (quantized "
             "impact-ordered first pass over the persisted "
             "<index>/impacts artifact; build with --impacts) | "
             "rescore (impact first pass, exact BM25 re-rank of the "
             "top --first-k window)")
    ap.add_argument("--first-k", type=int, default=100,
                    help="candidate window for --ranker rescore")
    ap.add_argument("--min-impact", type=int, default=None,
                    help="skip postings below this quantized impact "
                         "for --ranker impact/rescore")
    ap.add_argument("--c", type=float, default=1.0,
                    help="length-normalization strength for "
                         "--ranker pl2")
    ap.add_argument("--mu", type=float, default=2000.0,
                    help="Dirichlet pseudo-count for --ranker lm")
    ap.add_argument(
        "--synonyms", default=None,
        help='JSON map for --ranker synonyms, e.g. '
             '\'{"fast": ["quick", "rapid"]}\'')
    ap.add_argument("--max-expansions", type=int, default=50,
                    help="dictionary-expansion cap for --ranker prefix")
    ap.add_argument("--snippets", action="store_true",
                    help="attach highlighted snippets (requires --pages)")
    ap.add_argument("--pages", default=None,
                    help="corpus path (url, text, lang) for snippet text")
    ap.add_argument("--at-gen", type=int, default=None,
                    help="time-travel: query the index as of this "
                         "committed generation (archived snapshot; "
                         "retention via 'maintain_index retention')")
    ap.add_argument("--local", action="store_true",
                    help="driver-local serving fast path: score the "
                         "query straight off the persisted parquet "
                         "index with pyarrow+numpy — NO SparkSession, "
                         "~ms latency (plans/local_serve.py; "
                         "rank-identical to the Spark path). Default "
                         "bm25 ranker only; composes with --site, "
                         "--offset/--limit, --at-gen and "
                         "--queries-file (looped per query)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    if bool(args.query) == bool(args.queries_file):
        ap.error("exactly one of --query / --queries-file")

    if args.local:
        if (len(args.index) > 1 or args.ranker != "bm25"
                or args.bool_query or args.snippets
                or args.no_prune):
            ap.error("--local supports one --index with the default "
                     "bm25 ranker (no --bool/--snippets/--no-prune)")
        from search_engine_spark.plans.local_serve import (
            open_local_index,
        )

        lidx = open_local_index(args.index[0], gen=args.at_gen)
        if args.queries_file:
            with open(args.queries_file) as fh:
                queries = [ln.strip() for ln in fh if ln.strip()]
            if not queries:
                ap.error(f"no queries in {args.queries_file}")
        else:
            queries = [args.query]
        for qid, q in enumerate(queries):
            out = lidx.search(
                q, sites=args.site, offset=args.offset,
                limit=args.limit,
            )
            for rec in out.to_dict("records"):
                if args.queries_file:
                    rec = {"query_id": qid, "query": q, **rec}
                print(json.dumps(rec, default=str))
        return

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("search_engine_spark-query")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.plans.build import load_compact_index
    from search_engine_spark.plans.wand import search_compact

    index_dirs = args.index
    if args.queries_file:
        if (len(index_dirs) > 1 or args.ranker != "bm25"
                or args.bool_query or args.snippets):
            ap.error("--queries-file batch mode supports one --index "
                     "with the default bm25 ranker, no --bool or "
                     "--snippets")
        if args.at_gen is not None or args.offset != 0:
            # search_many_compact always reads the CURRENT generation
            # and has no offset — reject instead of silently ignoring
            ap.error("--queries-file batch mode supports neither "
                     "--at-gen nor --offset (use --local for both, "
                     "or per-query jobs)")
        with open(args.queries_file) as fh:
            queries = [ln.strip() for ln in fh if ln.strip()]
        if not queries:
            ap.error(f"no queries in {args.queries_file}")
        from search_engine_spark.plans.wand import search_many_compact

        cidx = load_compact_index(spark, index_dirs[0])
        result = search_many_compact(
            cidx, queries, sites=args.site, limit=args.limit,
            analyzer=cidx_analyzer(spark, index_dirs[0]),
        )
        for row in result.collect():
            d = row.asDict()
            d["query"] = queries[int(d["query_id"])]
            print(json.dumps(d, default=str))
        spark.stop()
        return
    if len(index_dirs) > 1:
        if args.ranker != "bm25" or args.bool_query or args.snippets:
            ap.error("federated (multiple --index) supports the "
                     "default bm25 ranker without --bool/--snippets")
        if args.at_gen is not None:
            ap.error("--at-gen reads one index (no federated "
                     "time-travel)")
        analyzers = {cidx_analyzer(spark, d) for d in index_dirs}
        if len(analyzers) > 1:
            ap.error(f"indexes use different analyzers: {analyzers}")
        from search_engine_spark.plans.federate import search_federated

        shards = [load_compact_index(spark, d) for d in index_dirs]
        result = search_federated(
            shards, args.query, sites=args.site, offset=args.offset,
            limit=args.limit, analyzer=analyzers.pop(),
        )
        for row in result.collect():
            print(json.dumps(row.asDict(), default=str))
        spark.stop()
        return

    args.index = index_dirs[0]
    if args.at_gen is not None:
        from search_engine_spark.plans.incremental import (
            open_index_at,
        )

        cidx = open_index_at(spark, args.index, args.at_gen)
    else:
        cidx = load_compact_index(spark, args.index)
    if args.ranker != "bm25" and args.bool_query:
        ap.error("--bool composes with the default bm25 ranker only")
    if args.ranker == "maxscore":
        from search_engine_spark.plans.maxscore import (
            search_maxscore_compact,
        )

        result = search_maxscore_compact(
            cidx, args.query, sites=args.site, offset=args.offset,
            limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
            prune=not args.no_prune,
        )
    elif args.ranker in ("impact", "rescore"):
        from search_engine_spark import fsutil
        from search_engine_spark.plans.impact import (
            IMPACTS_META,
            impact_topk_persisted,
            rescore_topk_persisted,
        )

        if args.site:
            ap.error("--ranker impact/rescore reads only the impacts "
                     "artifact (no site column); use the default "
                     "bm25 ranker with --site")
        root = args.index.rstrip("/")
        if not fsutil.exists(root + "/" + IMPACTS_META, spark):
            ap.error(f"no impacts artifact under {root} — rebuild "
                     "with jobs/build_index.py --impacts")
        if args.ranker == "impact":
            result = impact_topk_persisted(
                cidx, root, args.query, limit=args.limit,
                offset=args.offset,
                analyzer=cidx_analyzer(spark, args.index),
                min_impact=args.min_impact,
            )
        else:
            result = rescore_topk_persisted(
                cidx, root, args.query, first_k=args.first_k,
                limit=args.limit, offset=args.offset,
                analyzer=cidx_analyzer(spark, args.index),
                min_impact=args.min_impact,
            )
    elif args.ranker == "lm":
        from search_engine_spark.plans.lm import search_lm_compact

        result = search_lm_compact(
            cidx, args.query, mu=args.mu, sites=args.site,
            offset=args.offset, limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
        )
    elif args.ranker == "pl2":
        from search_engine_spark.plans.dfr import search_pl2_compact

        result = search_pl2_compact(
            cidx, args.query, c=args.c, sites=args.site,
            offset=args.offset, limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
        )
    elif args.ranker == "synonyms":
        from search_engine_spark.plans.synonyms import (
            search_synonyms_compact,
        )

        syn = json.loads(args.synonyms) if args.synonyms else None
        result = search_synonyms_compact(
            cidx, args.query, synonyms=syn, sites=args.site,
            offset=args.offset, limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
        )
    elif args.ranker == "prefix":
        from search_engine_spark.plans.prefix import (
            search_prefix_compact,
        )

        result = search_prefix_compact(
            cidx, args.query, sites=args.site, offset=args.offset,
            limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
            max_expansions=args.max_expansions,
        )
    elif args.ranker == "wildcard":
        from search_engine_spark.plans.wildcard import (
            search_wildcard_compact,
        )

        result = search_wildcard_compact(
            cidx, args.query, sites=args.site, offset=args.offset,
            limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
            max_expansions=args.max_expansions,
        )
    elif args.bool_query:
        from search_engine_spark import fsutil
        from search_engine_spark.plans.boolquery import (
            search_boolean_compact,
        )

        # quoted phrases run off the persisted positional index when
        # the build wrote one (jobs/build_index.py --positions)
        pos_dir = args.index.rstrip("/") + "/positions"
        positions = (
            pos_dir if fsutil.exists(pos_dir, spark) else None
        )
        result = search_boolean_compact(
            cidx,
            args.query,
            sites=args.site,
            offset=args.offset,
            limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
            positions_dir=positions,
        )
    else:
        result = search_compact(
            cidx,
            args.query,
            sites=args.site,
            offset=args.offset,
            limit=args.limit,
            analyzer=cidx_analyzer(spark, args.index),
            prune=not args.no_prune,
        )
    if args.snippets:
        if not args.pages:
            ap.error("--snippets requires --pages")
        from search_engine_spark.plans.search import (
            analyze_query,
            query_term_idf,
        )
        from search_engine_spark.plans.snippets import attach_snippets
        from search_engine_spark.sources.pages import read_pages

        analyzer = cidx_analyzer(spark, args.index)
        terms = [
            t
            for t in analyze_query(args.query, analyzer=analyzer)
            if t not in set(cidx.stoplist)
        ]
        lemma_idf = query_term_idf(cidx, terms, args.site)
        result = attach_snippets(
            result, read_pages(spark, args.pages), lemma_idf
        )
    for row in result.collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


def cidx_analyzer(spark, index_dir: str) -> str:
    # scheme-agnostic (hdfs://, s3a://, file://) like the rest of the
    # persisted-index metadata I/O
    from search_engine_spark import fsutil

    # NOT pathlib: Path("hdfs://x") collapses the scheme's "//"
    meta = json.loads(
        fsutil.read_text(index_dir.rstrip("/") + "/stats.json", spark)
    )
    return meta.get("analyzer", "lemma")


if __name__ == "__main__":
    main()
