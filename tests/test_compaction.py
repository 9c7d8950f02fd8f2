"""Index compaction: fewer files, identical content, queries unaffected."""

from __future__ import annotations

import os

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
from pears_fruit_fly_spark.operators.docids import assign_doc_ids
from pears_fruit_fly_spark.operators.postings import (
    build_postings,
    compact_postings,
    read_postings,
)
from pears_fruit_fly_spark.sources.wet import dedup_latest


def _dump(spark, d):
    return sorted(
        (r["term_id"], r["salt"], r["block_id"], bytes(r["doc_gaps"]),
         bytes(r["tfs"]), bytes(r["dls"]), r["term_bucket"])
        for r in read_postings(spark, d).collect()
    )


def _parquet_file_count(index_dir):
    from pears_fruit_fly_spark.plans import commitlog as cl

    live_postings = cl.resolve(os.path.join(cl.resolve(index_dir), "postings"))
    n = 0
    for root, _, files in os.walk(live_postings):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compaction_preserves_content_and_queries(
    spark, pages_df, vocab, tmp_path_factory
):
    clean = dedup_latest(pages_df)
    pages_ids = clean.join(assign_doc_ids(clean, "url"), "url")
    d = str(tmp_path_factory.mktemp("compact"))
    build_postings(
        spark, pages_ids, vocab, d,
        cfg=PostingsConfig(num_partitions=4, skew_df_threshold=50,
                           max_docs_per_subpartition=40, bucket_batch_size=2),
    )
    # builds now write ONE file per bucket (post-encode bucket shuffle), so
    # fragment the index artificially to exercise the small-file cleanup:
    # rewrite each bucket as many files via the commit-pointer protocol
    # (doubles as an exercise of commitlog versioning on the postings dir)
    from pears_fruit_fly_spark.plans import commitlog as cl
    from pears_fruit_fly_spark.plans import manifest as mf

    proot = os.path.join(cl.resolve(d), "postings")
    frag = read_postings(spark, d)
    cl.commit_rewrite(
        proot, "frag",
        lambda p: frag.repartition(16).write.mode("overwrite")
        .partitionBy("term_bucket").parquet(p),
    )
    mf.bump_build_id(d)  # files replaced -> evict cached handles
    before_content = _dump(spark, d)
    before_q = [(r["doc_id"], r["score"])
                for r in bm25_topk_wand(spark, d, "t0 t3", vocab, k=10).collect()]
    n_before = _parquet_file_count(d)

    compact_postings(spark, d)

    assert _parquet_file_count(d) < n_before
    assert _dump(spark, d) == before_content
    # compact_postings itself must evict the opened-index cache (ADVICE r1):
    # the pre-compaction query above cached handles to now-DELETED parquet
    # files; this query must succeed WITHOUT any manual cache pop
    after_q = [(r["doc_id"], r["score"])
               for r in bm25_topk_wand(spark, d, "t0 t3", vocab, k=10).collect()]
    assert after_q == before_q
