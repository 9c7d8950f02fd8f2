"""1M-doc composed-feature stress (VERDICT r4 #5).

The 600k round-4 run covered only the plain build; the 100x claim rests on
COMPOSED features, and merge/tombstone interactions are where LSM designs
degrade. This script runs the full lifecycle at 1,000,000 docs, local[32]:

  build (900k, positional) -> append segment (100k) -> delete 10% ->
  merge -> phrase + WAND + boolean + snippets over the merged result

with rank-identity spot-checks at every step: the WAND top-k (block-max
skipping, partition-pruned scatter) must equal the relational scorer
(plain DataFrame algebra over decoded postings) on doc ids AND scores —
two independent execution paths over the same index state, including
tombstone visibility and post-merge recomputed stats.

Usage: PYTHONPATH=/root/repo python scripts/stress_1m.py [n_docs]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 256
N_PARTS = 64
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def write_corpus(n_docs: int, out_dir: str, seed0: int,
                 url_prefix: str = "") -> None:
    """Deterministic corpus in 4 pandas chunks (bounds driver peak mem),
    unique urls across chunks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pears_fruit_fly_spark.fixtures.webtext import make_web_pages

    per_chunk = (n_docs + 3) // 4
    written = 0
    fidx = 0
    for c in range(4):
        take = min(per_chunk, n_docs - written)
        if take <= 0:
            break
        pdf = make_web_pages(n=take, v=2000, seed=seed0 + c)
        pdf["url"] = url_prefix + pdf["url"] + f"?c={c}"
        rows_per_file = (len(pdf) + N_FILES // 4 - 1) // (N_FILES // 4)
        for i in range(0, len(pdf), rows_per_file):
            chunk = pdf.iloc[i : i + rows_per_file]
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                f"{out_dir}/part{fidx:03d}.parquet",
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
            fidx += 1
        written += take
        del pdf


def check_rank_identity(spark, index_dir, vocab, queries, stats_pages,
                        excluded=None, k=10):
    """WAND over the index bytes vs a fully independent path: raw corpus
    text -> tokens_long -> relational BM25 (plain DataFrame algebra, the
    test-suite oracle twin). doc-id sequence identical, scores equal to
    1e-6.

    stats_pages: the corpus whose collection statistics the index is
    currently serving with (the engine's documented stale-stats contract:
    pre-merge, tombstoned docs still count toward N/avgdl/df).
    excluded: DataFrame of tombstoned doc ids — filtered from the
    relational result AFTER scoring, mirroring liveDocs semantics.
    """
    from pyspark.sql import functions as F

    from pears_fruit_fly_spark.operators.bm25 import (
        bm25_scores_relational,
        bm25_topk_wand,
        query_term_counts,
    )
    from pears_fruit_fly_spark.operators.postings import tokens_long

    tokens = tokens_long(stats_pages, vocab).persist()
    n_docs = stats_pages.count()
    sum_dl = (tokens.groupBy("doc_id").agg(F.first("dl").alias("dl"))
              .agg(F.sum("dl")).collect()[0][0])
    avgdl = float(sum_dl) / max(1, n_docs)

    for qtext in queries:
        wand = bm25_topk_wand(spark, index_dir, qtext, vocab, k=k,
                              n_ranges=CPUS).collect()
        q = query_term_counts(qtext, vocab)
        scores = bm25_scores_relational(tokens, q, n_docs, avgdl)
        if excluded is not None:
            scores = scores.join(excluded.select("doc_id"), "doc_id",
                                 "left_anti")
        rel = (scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
               .collect())
        w = [(r["doc_id"], round(r["score"], 6)) for r in wand]
        r_ = [(r["doc_id"], round(r["score"], 6)) for r in rel]
        assert w == r_, (qtext, w[:3], r_[:3])
    tokens.unpersist()
    return len(queries)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_append = n_docs // 10
    n_base = n_docs - n_append

    from pyspark.sql import functions as F

    from pears_fruit_fly_spark.config import PostingsConfig
    from pears_fruit_fly_spark.fixtures.webtext import (
        make_queries,
        make_vocab_file_lines,
    )
    from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
    from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.operators.phrase import (
        phrase_match,
        search_boolean,
    )
    from pears_fruit_fly_spark.operators.postings import (
        append_postings,
        build_postings,
        delete_docs,
        merge_segments,
    )
    from pears_fruit_fly_spark.operators.snippets import snippets
    from pears_fruit_fly_spark.session import get_spark
    from pears_fruit_fly_spark.sources.wet import dedup_latest

    t_all = time.time()
    # STRESS_BASE_DIR / STRESS_EXTRA_DIR: reuse a previously generated
    # corpus (generation is ~10 min of single-threaded pandas at 1M docs;
    # the corpus is deterministic, so reuse is safe for same n_docs)
    base_dir = os.environ.get("STRESS_BASE_DIR")
    extra_dir = os.environ.get("STRESS_EXTRA_DIR")
    reused = bool(base_dir and extra_dir and os.path.isdir(base_dir)
                  and os.path.isdir(extra_dir))  # validate BOTH up front:
    # a stale extra_dir would otherwise fail only after the ~18-min build
    if reused:
        print(f"reusing corpus: {base_dir} + {extra_dir}", flush=True)
    else:
        base_dir = tempfile.mkdtemp(prefix="stress_base_")
        extra_dir = tempfile.mkdtemp(prefix="stress_extra_")
        print(f"generating {n_base}+{n_append} docs ...", flush=True)
        write_corpus(n_base, base_dir, seed0=1000)
        write_corpus(n_append, extra_dir, seed0=2000,
                     url_prefix="https://append.")
    gen_s = time.time() - t_all
    print(f"corpus ready in {gen_s:.0f}s", flush=True)

    spark = get_spark("stress-1m", master=f"local[{CPUS}]",
                      shuffle_partitions=N_PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    vocab = parse_vocab_lines(make_vocab_file_lines(2000))

    work = tempfile.mkdtemp(prefix="stress_idx_")
    base_pages = dedup_latest(spark.read.parquet(base_dir))
    base_ids = base_pages.join(assign_doc_ids(base_pages,
                                              num_buckets=N_PARTS), "url")
    base_ids.write.mode("overwrite").parquet(work + "/base_ids")
    base_ids = spark.read.parquet(work + "/base_ids")
    n_base_live = base_ids.count()

    index_dir = os.path.join(work, "idx")
    cfg = PostingsConfig(num_partitions=N_PARTS, skew_df_threshold=20000,
                         max_docs_per_subpartition=20000,
                         store_positions=True)
    timings: dict[str, float] = {}

    t0 = time.time()
    build_postings(spark, base_ids, vocab, index_dir, cfg=cfg)
    timings["build_900k"] = round(time.time() - t0, 1)
    print(f"base build: {timings['build_900k']}s "
          f"({n_base_live / timings['build_900k']:.0f} docs/s)", flush=True)

    qset = make_queries(v=2000)
    queries = [qset.iloc[i].query_text for i in (0, 17, 44, 81)]
    check_rank_identity(spark, index_dir, vocab, queries, base_ids)
    print("rank identity after build: OK", flush=True)

    extra_pages = dedup_latest(spark.read.parquet(extra_dir))
    max_id = base_ids.agg(F.max("doc_id")).collect()[0][0]
    extra_ids = extra_pages.join(
        assign_doc_ids(extra_pages, num_buckets=N_PARTS).withColumn(
            "doc_id", F.col("doc_id") + F.lit(int(max_id) + 1)
        ),
        "url",
    )
    extra_ids.write.mode("overwrite").parquet(work + "/extra_ids")
    extra_ids = spark.read.parquet(work + "/extra_ids")
    n_extra_live = extra_ids.count()
    all_ids = base_ids.unionByName(extra_ids)
    t0 = time.time()
    append_postings(spark, extra_ids, vocab, index_dir, cfg=cfg)
    timings["append_100k"] = round(time.time() - t0, 1)
    check_rank_identity(spark, index_dir, vocab, queries, all_ids)
    print(f"append {n_extra_live}: {timings['append_100k']}s; "
          "rank identity: OK", flush=True)

    victims = all_ids.filter("doc_id % 10 = 4").select("doc_id")
    t0 = time.time()
    n_tomb = delete_docs(spark, index_dir, victims)
    timings["delete_10pct"] = round(time.time() - t0, 1)
    # stale-stats contract: N/avgdl/df still include the tombstoned docs
    check_rank_identity(spark, index_dir, vocab, queries, all_ids,
                        excluded=victims)
    top = bm25_topk_wand(spark, index_dir, queries[0], vocab, k=100,
                         n_ranges=CPUS).collect()
    assert all(r["doc_id"] % 10 != 4 for r in top), "tombstoned doc served"
    print(f"delete {n_tomb} ids: {timings['delete_10pct']}s; "
          "visibility + rank identity: OK", flush=True)

    t0 = time.time()
    merge_segments(spark, index_dir)
    timings["merge"] = round(time.time() - t0, 1)
    # merge purges tombstones and recomputes global stats over survivors
    survivors = all_ids.filter("doc_id % 10 != 4")
    check_rank_identity(spark, index_dir, vocab, queries, survivors)
    top = bm25_topk_wand(spark, index_dir, queries[0], vocab, k=100,
                         n_ranges=CPUS).collect()
    assert all(r["doc_id"] % 10 != 4 for r in top), "purged doc resurfaced"
    print(f"merge: {timings['merge']}s; rank identity: OK", flush=True)

    # serving over the merged ~1M-doc index
    t0 = time.time()
    hits = 0
    for ph in ("t0 t1", "t2 t0 t1"):
        hits += phrase_match(spark, index_dir, ph, vocab).count()
    timings["phrase_2q"] = round(time.time() - t0, 1)
    t0 = time.time()
    search_boolean(spark, index_dir, '+t3 -t9 "t0 t1" t5', vocab,
                   k=10).collect()
    timings["boolean"] = round(time.time() - t0, 1)
    t0 = time.time()
    snips = snippets(spark, index_dir, queries[1], vocab,
                     all_ids.select("doc_id", "text"), k=10).collect()
    timings["snippets"] = round(time.time() - t0, 1)
    assert len(snips) == 10 and all(r["snippet"] for r in snips)

    lat = []
    for i in (3, 21, 47, 63, 88):
        t0 = time.time()
        bm25_topk_wand(spark, index_dir, qset.iloc[i].query_text, vocab,
                       k=10, n_ranges=CPUS).collect()
        lat.append(time.time() - t0)
    lat.sort()

    out = {
        "n_docs": n_base_live + n_extra_live,
        "phrase_hits": hits,
        "tombstoned": n_tomb,
        "timings_s": timings,
        "build_docs_per_sec": round(n_base_live / timings["build_900k"], 1),
        "wand_p50_s": round(lat[len(lat) // 2], 3),
        "wand_max_s": round(lat[-1], 3),
        "total_wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(out))
    spark.stop()
    # never delete a corpus the caller asked to keep via STRESS_*_DIR
    doomed = (work,) if reused else (work, base_dir, extra_dir)
    for d in doomed:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
