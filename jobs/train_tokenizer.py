"""spark-submit job: train a BPE tokenizer on a corpus (and optionally
encode it), the tokenizer-training mile of an LLM data pipeline.

    spark-submit --py-files search_engine_spark.zip jobs/train_tokenizer.py \
        --input  /data/curated \
        --output /data/tokenizer \
        --merges 32000 [--merges-per-round 64] [--min-pair-count 2] \
        [--mixture en=2.5,code=1.0 --domain-col lang --mixture-salt v1] \
        [--id-col doc_id] [--text-col text | --tokens-col tokens] \
        [--encode-output /data/encoded] [--vocab] [--report path.json]

Stages:
  1. (optional) deterministic mixture up-sampling — domains are
     re-weighted with operators/mixing.upsample_mixture so the learned
     vocabulary reflects the TRAINING mixture, not the raw crawl.
  2. learn_bpe — one corpus shuffle to the distinct-word frequency
     table, then JVM-only merge rounds (operators/bpe.py).
  3. artifacts under --output: merges.parquet (rank, a, b) and, with
     --vocab, vocab.parquet (piece, count).
  4. (optional) --encode-output: corpus re-encoded to subword ids'
     pieces with the Zipf-amortised Arrow encoder.

Prints ONE JSON line: docs, distinct words, merges learned, elapsed
per stage, tokens/sec for the encode pass.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--merges", type=int, required=True)
    ap.add_argument("--merges-per-round", type=int, default=1)
    ap.add_argument("--min-pair-count", type=int, default=2)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--tokens-col", default=None,
                    help="use a pre-tokenized array<string> column "
                         "instead of tokenizing --text-col")
    ap.add_argument("--mixture", default=None,
                    help="domain weights, e.g. en=2.5,de=0.25")
    ap.add_argument("--domain-col", default="lang")
    ap.add_argument("--mixture-salt", default="v1")
    ap.add_argument("--vocab", action="store_true",
                    help="also write vocab.parquet (piece, count)")
    ap.add_argument("--encode-output", default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(
        "search_engine_spark-train-tokenizer"
    )
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from search_engine_spark.functions.textproc import tokens_col
    from search_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_vocab,
        learn_bpe,
        merges_table,
        word_counts,
    )
    from search_engine_spark.operators.mixing import upsample_mixture

    docs = spark.read.parquet(args.input)
    if args.tokens_col:
        toks_name = args.tokens_col
    else:
        toks_name = "tokens"
        docs = docs.withColumn(toks_name, tokens_col(F.col(args.text_col)))

    timings: dict[str, float] = {}
    summary: dict = {"metric": "bpe_training"}

    if args.mixture:
        weights = {
            k: float(v)
            for k, v in (p.split("=") for p in args.mixture.split(","))
        }
        t0 = time.time()
        docs = upsample_mixture(
            docs,
            weights,
            domain_col=args.domain_col,
            id_col=args.id_col,
            salt=args.mixture_salt,
        )
        timings["mixture"] = round(time.time() - t0, 3)
        summary["mixture"] = weights

    n_docs = docs.count()
    n_words = word_counts(docs, toks_name).count()

    t0 = time.time()
    merges = learn_bpe(
        docs.select(toks_name),
        args.merges,
        tokens_col_name=toks_name,
        min_pair_count=args.min_pair_count,
        merges_per_round=args.merges_per_round,
    )
    timings["learn"] = round(time.time() - t0, 3)

    out = Path(args.output)
    merges_table(spark, merges).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out / "merges.parquet"))

    if args.vocab:
        t0 = time.time()
        bpe_vocab(docs, merges, toks_name).write.mode(
            "overwrite"
        ).parquet(str(out / "vocab.parquet"))
        timings["vocab"] = round(time.time() - t0, 3)

    if args.encode_output:
        t0 = time.time()
        enc = bpe_encode(docs, merges, toks_name, out_col="bpe")
        enc.write.mode("overwrite").parquet(args.encode_output)
        el = time.time() - t0
        timings["encode"] = round(el, 3)
        n_tokens = (
            spark.read.parquet(args.encode_output)
            .agg(F.sum(F.size("bpe")))
            .collect()[0][0]
        )
        summary["encoded_pieces"] = int(n_tokens or 0)
        summary["pieces_per_sec"] = (
            round(n_tokens / el, 2) if el and n_tokens else None
        )

    summary.update(
        {
            "docs": n_docs,
            "distinct_words": n_words,
            "merges_requested": args.merges,
            "merges_learned": len(merges),
            "timings_sec": timings,
        }
    )
    line = json.dumps(summary)
    print(line)
    if args.report:
        Path(args.report).write_text(line)
    spark.stop()


if __name__ == "__main__":
    main()
