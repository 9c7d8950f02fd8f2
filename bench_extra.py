"""Supplementary benchmarks — NOT the driver's frozen bench.py.

Adds the measurement surface guide §1 calls for and VERDICT r5 asked of
round 6, without touching the frozen harness:

* host self-adjudication (VERDICT r5 #1): a no-Spark multiprocessing run
  of the EXACT shared tokenize kernel (`host_kernel_control_s`) plus a
  fixed-task engine probe (`engine_probe_s`). Comparing either across
  bench runs separates engine regressions from ambient host load — the
  r5 "1.50x slower" headline was adjudicated to be entirely ambient.
* noop-sink isolation (guide §1.4) for the heavy declared queries: the
  computation is timed against the built-in noop sink, so sink and
  collect costs cannot pollute the comparison.
* skew-adversarial WAND (VERDICT r5 #5): a corpus with Zipf doc lengths
  (head docs ~100x the median) + head-term-only queries; reports
  `wand_skew_p95` and the decoded-block count. Rank identity on the same
  fixture is pinned by tests/test_bm25.py::test_wand_skewed_corpus_rank_identity.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VOCAB_V = 2000


def main() -> None:
    import numpy as np

    from pears_fruit_fly_spark.config import FlyConfig, PostingsConfig
    from pears_fruit_fly_spark.fixtures.webtext import (
        make_vocab_file_lines,
        make_web_pages,
    )
    from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
    from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.operators.postings import build_postings
    from pears_fruit_fly_spark.operators.signatures import build_signatures
    from pears_fruit_fly_spark.session import get_spark
    from pears_fruit_fly_spark.sources.wet import dedup_latest
    from scripts.scaling_bench import tokenize_control
    import __spark_entry__ as entrymod

    out: dict = {"metric": "bench_extra", "cpus": CPUS, "sf": SF_DIR}

    # ---- host kernel control (no Spark): shared tokenize kernel ----------
    pdf = make_web_pages(n=8000, v=VOCAB_V)
    vocab = parse_vocab_lines(make_vocab_file_lines(VOCAB_V))
    out["host_kernel_control_s"] = round(
        tokenize_control(pdf, list(vocab.terms), procs=CPUS), 3
    )

    spark = get_spark("pears-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pears_bx_")

    # ---- fixed-task engine probe: signature pass over a pinned corpus ----
    probe_path = os.path.join(work, "probe_pages")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(probe_path)
    probe_pages = spark.read.parquet(probe_path)
    fly_cfg = FlyConfig(pn_size=VOCAB_V, kc_size=512, proj_size=8,
                       top_words=250, wta_percent=10.0)
    build_signatures(spark, probe_pages, vocab, fly_cfg).write.format(
        "noop"
    ).mode("overwrite").save()  # warm
    t0 = time.time()
    build_signatures(spark, probe_pages, vocab, fly_cfg).write.format(
        "noop"
    ).mode("overwrite").save()
    out["engine_probe_s"] = round(time.time() - t0, 3)

    # ---- noop-isolated declared queries (guide §1.4) ---------------------
    qmap = entrymod.queries()
    for name in ("q_bm25_topk", "q_token_counts", "q_jaccard_pairs",
                 "q_minhash_rankdict", "q_simhash_rankdict",
                 "q_lang_id_multi", "q_quality"):
        sc.setJobDescription(f"noop:{name}")
        t0 = time.time()
        qmap[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"noop_{name}_s"] = round(time.time() - t0, 3)
        sc.setJobDescription(None)

    # ---- skew-adversarial WAND (VERDICT r5 #5) ---------------------------
    # Zipf doc lengths: doc i gets round(L / (1+i mod 1000)**0.7) repeats
    # of its text — head docs ~100x the median length; queries use only
    # the corpus's HEAD terms (t0..t4), whose posting lists are densest.
    skew_pdf = make_web_pages(n=8000, v=VOCAB_V, seed=77)
    reps = np.maximum(
        1, (40 / (1 + np.arange(len(skew_pdf)) % 1000) ** 0.7)
    ).astype(int)
    skew_pdf["text"] = [
        " ".join([t] * int(r)) if r > 1 else t
        for t, r in zip(skew_pdf["text"].str.slice(0, 2000), reps)
    ]
    skew_path = os.path.join(work, "skew_pages")
    spark.createDataFrame(skew_pdf).write.mode("overwrite").parquet(skew_path)
    sp = dedup_latest(spark.read.parquet(skew_path))
    sids = assign_doc_ids(sp)
    sp_ids = sp.join(sids, "url")
    skew_idx = os.path.join(work, "skew_idx")
    build_postings(
        spark, sp_ids, vocab, skew_idx,
        cfg=PostingsConfig(num_partitions=2 * CPUS, skew_df_threshold=5000,
                           max_docs_per_subpartition=5000),
    )
    head_queries = ["t0 t1", "t1 t2", "t0 t2 t3", "t3 t4", "t0 t1 t2 t3 t4",
                    "t2 t4", "t0 t4", "t1 t3", "t0 t3", "t1 t4"]
    lat = []
    inst: dict = {}
    for q in head_queries:
        t0 = time.time()
        bm25_topk_wand(spark, skew_idx, q, vocab, k=10, n_ranges=CPUS,
                       instrument=inst).collect()
        lat.append(time.time() - t0)
    lat.sort()
    out["wand_skew_p50"] = round(lat[len(lat) // 2], 4)
    out["wand_skew_p95"] = round(lat[int(0.95 * (len(lat) - 1))], 4)
    out["wand_skew_decoded_blocks_last"] = int(inst["decoded_blocks"].value)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
