"""spark-submit job: TREC-style relevance evaluation of a run file
against qrels (plans/eval.rank_eval).

    spark-submit --py-files search_engine_spark.zip jobs/eval.py \
        --run /data/run.parquet --qrels /data/qrels.parquet \
        [--k 10] [--per-query]

``--run``   parquet with (query_id, doc_id, rn)    — system ranking
``--qrels`` parquet with (query_id, doc_id, rel)   — graded judgments

Prints ONE JSON line with the corpus summary (n_queries, mrr,
mean_ndcg, mean_recall); ``--per-query`` additionally prints one
JSON line per judged query.  Evaluation is a single distributed job
keyed on query_id, so million-query eval sets run without a driver
loop.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--per-query", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("search_engine_spark-eval")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.plans.eval import (
        rank_eval,
        rank_eval_summary,
    )

    run = spark.read.parquet(args.run)
    qrels = spark.read.parquet(args.qrels)
    if args.per_query:
        for row in (
            rank_eval(run, qrels, k=args.k)
            .orderBy("query_id")
            .collect()
        ):
            print(json.dumps(row.asDict(), default=str))
    summary = rank_eval_summary(run, qrels, k=args.k).collect()[0]
    print(json.dumps(summary.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
