"""Controlled build-time A/B: staging_format="rows" vs "blobs".

The packed-blob staging path (PostingsConfig.staging_format, r5) claims to
cut the per-row cost of the staging leg — Arrow return, bucket exchange and
staging parquet move one binary cell per (batch, bucket) instead of one row
per (doc, term). Outputs are pinned byte-identical (tests/test_blob_staging);
this script measures the TIME claim under the one design that survives a
noisy host: same JVM, same corpus, strictly alternating reps (rows, blobs,
rows, blobs, ...), report per-format median wall + per-stage seconds.

Usage: PYTHONPATH=/root/repo python scripts/ab_staging_format.py [n_docs] [reps]
Prints one JSON line; paste the summary into BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

N_FILES = 256
N_PARTS = 64


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pears_fruit_fly_spark.config import PostingsConfig
    from pears_fruit_fly_spark.fixtures.webtext import (
        make_vocab_file_lines,
        make_web_pages,
    )
    from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.operators.postings import build_postings
    from pears_fruit_fly_spark.session import get_spark
    from pears_fruit_fly_spark.sources.wet import dedup_latest

    corpus_dir = tempfile.mkdtemp(prefix="ab_fmt_corpus_")
    pdf = make_web_pages(n=n_docs, v=2000)
    rows_per_file = (len(pdf) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        chunk = pdf.iloc[i * rows_per_file : (i + 1) * rows_per_file]
        if chunk.empty:
            break
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            f"{corpus_dir}/part{i:03d}.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    spark = get_spark("ab-staging-format", master="local[8]",
                      shuffle_partitions=N_PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus_dir)
    vocab = parse_vocab_lines(make_vocab_file_lines(2000))
    clean = dedup_latest(pages)
    pages_ids = clean.join(assign_doc_ids(clean, num_buckets=N_PARTS), "url")
    pages_ids.count()  # warm workers / broadcasts before either side times

    work = tempfile.mkdtemp(prefix="ab_fmt_idx_")
    walls: dict[str, list[float]] = {"rows": [], "blobs": []}
    stages: dict[str, list[dict]] = {"rows": [], "blobs": []}
    for rep in range(reps):
        for fmt in ("rows", "blobs"):
            shutil.rmtree(work + "/idx", ignore_errors=True)
            cfg = PostingsConfig(num_partitions=N_PARTS,
                                 skew_df_threshold=20000,
                                 max_docs_per_subpartition=20000,
                                 staging_format=fmt)
            t0 = time.time()
            info = build_postings(spark, pages_ids, vocab, work + "/idx",
                                  cfg=cfg)
            walls[fmt].append(time.time() - t0)
            stages[fmt].append(info.get("stage_seconds", {}))

    def med(xs: list[float]) -> float:
        return round(statistics.median(xs), 2)

    out = {
        "n_docs": n_docs,
        "reps_per_format": reps,
        "design": "same JVM local[8], alternating rows/blobs reps",
        "wall_s": {f: [round(x, 2) for x in walls[f]] for f in walls},
        "wall_median_s": {f: med(walls[f]) for f in walls},
        "staging_median_s": {
            f: med([s.get("staging", float("nan")) for s in stages[f]])
            for f in stages
        },
        "encode_median_s": {
            f: med([s.get("encode", float("nan")) for s in stages[f]])
            for f in stages
        },
        "blob_speedup_wall": round(
            statistics.median(walls["rows"])
            / statistics.median(walls["blobs"]), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
