"""spark-submit job: BM25 top-k queries against a built index.

Usage:
  spark-submit --py-files pears_fruit_fly_spark.zip scripts/query_job.py \
      --index s3://bucket/index/ --vocab /path/spmcc.vocab \
      --query "web search engines" --k 10

Emits one JSON line per query: {"query": ..., "results": [[doc_id, score]...],
"latency_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--query", action="append", required=True,
                    help="repeatable")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-ranges", type=int, default=64)
    args = ap.parse_args(argv)

    from pears_fruit_fly_spark.functions.vocab import load_vocab
    from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
    from pears_fruit_fly_spark.session import get_spark

    spark = get_spark("pears-query")
    vocab = load_vocab(args.vocab)
    for q in args.query:
        t0 = time.time()
        rows = bm25_topk_wand(
            spark, args.index, q, vocab, k=args.k, n_ranges=args.n_ranges
        ).collect()
        print(
            json.dumps(
                {
                    "query": q,
                    "results": [[r["doc_id"], round(r["score"], 6)] for r in rows],
                    "latency_s": round(time.time() - t0, 4),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
