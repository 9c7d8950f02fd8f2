"""spark-submit job: full index build over a web-pages table.

Usage (cluster):
  spark-submit --py-files pears_fruit_fly_spark.zip scripts/build_index_job.py \
      --pages  s3://bucket/web_pages/          (parquet/Iceberg table path) \
      --vocab  /path/spmcc.vocab               (SPM-format vocab file) \
      --index  s3://bucket/index/              (output index root) \
      --partitions 4096 --lang en

Resumable: re-submit with the same --index after any failure; completed
term buckets are skipped via the checkpoint manifest.

Local smoke:
  PYTHONPATH=. python scripts/build_index_job.py --demo
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--vocab")
    ap.add_argument("--index")
    ap.add_argument("--partitions", type=int, default=4096)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-chars", type=int, default=1000)
    ap.add_argument("--skew-df-threshold", type=int, default=100_000)
    ap.add_argument("--demo", action="store_true",
                    help="run on a generated 2k-doc corpus in /tmp")
    args = ap.parse_args(argv)

    from pears_fruit_fly_spark.config import PostingsConfig
    from pears_fruit_fly_spark.functions.vocab import load_vocab, parse_vocab_lines
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.operators.postings import build_postings
    from pears_fruit_fly_spark.session import get_spark
    from pears_fruit_fly_spark.sources.wet import dedup_latest, ingest_filter

    spark = get_spark("pears-index-build")

    if args.demo:
        from pears_fruit_fly_spark.fixtures.webtext import (
            make_vocab_file_lines,
            make_web_pages,
        )

        work = tempfile.mkdtemp(prefix="pears_demo_")
        spark.createDataFrame(make_web_pages(2000, 800)).write.parquet(work + "/pages")
        args.pages, args.index = work + "/pages", work + "/index"
        args.partitions, args.min_chars = 16, 0
        vocab = parse_vocab_lines(make_vocab_file_lines(800))
    else:
        if not (args.pages and args.vocab and args.index):
            ap.error("--pages, --vocab, --index required (or --demo)")
        vocab = load_vocab(args.vocab)

    pages = spark.read.parquet(args.pages)
    clean = dedup_latest(ingest_filter(pages, lang=args.lang, min_chars=args.min_chars))
    pages_ids = clean.join(assign_doc_ids(clean), "url")
    info = build_postings(
        spark, pages_ids, vocab, args.index,
        cfg=PostingsConfig(
            num_partitions=args.partitions,
            skew_df_threshold=args.skew_df_threshold,
        ),
    )
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
