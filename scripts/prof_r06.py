"""Round-6 profiling harness: replicate bench.py's heavy legs with job
labels + Spark event logging, then decompose wall time per stage.

NOT part of the frozen bench — measurement only (guide §1.1/§1.5).
Usage: python scripts/prof_r06.py [legs...]   (default: all)
Event log lands in /tmp/spark-events-r06; parse with prof_r06_parse.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CORPUS = int(os.environ.get("BENCH_CORPUS_DOCS", "20000"))
VOCAB_V = 2000
EVDIR = "/tmp/spark-events-r06"


def main() -> None:
    legs = set(sys.argv[1:]) or {
        "sig", "index", "pos", "phrase", "boolean", "append", "wand",
        "queries", "piece",
    }
    os.makedirs(EVDIR, exist_ok=True)
    from pears_fruit_fly_spark.config import FlyConfig, PostingsConfig
    from pears_fruit_fly_spark.fixtures.webtext import (
        make_queries, make_vocab_file_lines, make_web_pages,
    )
    from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
    from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.operators.postings import build_postings
    from pears_fruit_fly_spark.operators.signatures import build_signatures
    from pears_fruit_fly_spark.session import get_spark
    from pears_fruit_fly_spark.sources.wet import dedup_latest
    import __spark_entry__ as entrymod

    spark = get_spark(
        "pears-prof-r06", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="pears_prof_")

    pdf = make_web_pages(n=N_CORPUS, v=VOCAB_V)
    corpus_path = os.path.join(work, "web_pages")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(corpus_path)
    pages = spark.read.parquet(corpus_path)
    vocab = parse_vocab_lines(make_vocab_file_lines(VOCAB_V))
    fly_cfg = FlyConfig(pn_size=VOCAB_V, kc_size=512, proj_size=8,
                        top_words=250, wta_percent=10.0)
    pages.count()
    sc.setJobDescription("warmup sig limit2000")
    build_signatures(spark, pages.limit(2000), vocab, fly_cfg).count()

    def leg(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(f"LEG {name}: {timings[name]}", flush=True)
        return out

    if "sig" in legs:
        sig_path = os.path.join(work, "signatures")
        leg("sig_build", lambda: build_signatures(
            spark, pages, vocab, fly_cfg).write.mode("overwrite").parquet(sig_path))

    clean = dedup_latest(pages)
    ids = assign_doc_ids(clean)
    pages_ids = clean.join(ids, "url")
    index_dir = os.path.join(work, "index")
    if "index" in legs or "wand" in legs or "append" in legs:
        info = leg("index_build", lambda: build_postings(
            spark, pages_ids, vocab, index_dir,
            cfg=PostingsConfig(num_partitions=2 * CPUS, skew_df_threshold=5000,
                               max_docs_per_subpartition=5000)))
        print("index stage_seconds:", info["stage_seconds"], flush=True)

    if "pos" in legs or "phrase" in legs or "boolean" in legs:
        from pears_fruit_fly_spark.operators.phrase import (
            phrase_match, search_boolean,
        )
        pos_dir = os.path.join(work, "pos_index")
        info = leg("index_build_positional", lambda: build_postings(
            spark, pages_ids, vocab, pos_dir,
            cfg=PostingsConfig(num_partitions=2 * CPUS, skew_df_threshold=5000,
                               max_docs_per_subpartition=5000,
                               store_positions=True)))
        print("pos stage_seconds:", info["stage_seconds"], flush=True)
        if "phrase" in legs:
            for ph in ("t0 t1", "t1 t0", "t2 t0 t1"):
                leg(f"phrase[{ph}]",
                    lambda ph=ph: phrase_match(spark, pos_dir, ph, vocab).count())
        if "boolean" in legs:
            leg("boolean_search", lambda: search_boolean(
                spark, pos_dir, '+t3 -t9 "t0 t1" t5', vocab, k=10).collect())
            leg("boolean_search_2nd", lambda: search_boolean(
                spark, pos_dir, '+t3 -t9 "t0 t1" t5', vocab, k=10).collect())

    if "wand" in legs:
        qset = make_queries(v=VOCAB_V)
        for qid in (0, 2, 4, 6):
            leg(f"wand[q{qid}]", lambda qid=qid: bm25_topk_wand(
                spark, index_dir, qset.iloc[qid].query_text, vocab, k=10,
                n_ranges=CPUS).collect())

    if "append" in legs:
        from pyspark.sql import functions as F
        from pears_fruit_fly_spark.operators.postings import append_postings
        extra_pdf = make_web_pages(n=4000, v=VOCAB_V, seed=999)
        extra_pdf["url"] = "https://append." + extra_pdf["url"].str.removeprefix("https://")
        extra_path = os.path.join(work, "extra_pages")
        spark.createDataFrame(extra_pdf).write.mode("overwrite").parquet(extra_path)
        clean_x = dedup_latest(spark.read.parquet(extra_path))
        max_id = pages_ids.agg(F.max("doc_id")).collect()[0][0]
        ids_x = assign_doc_ids(clean_x, "url").withColumn(
            "doc_id", F.col("doc_id") + F.lit(int(max_id) + 1))
        extra_ids = clean_x.join(ids_x, "url")
        info = leg("index_append", lambda: append_postings(
            spark, extra_ids, vocab, index_dir,
            cfg=PostingsConfig(num_partitions=2 * CPUS, skew_df_threshold=5000,
                               max_docs_per_subpartition=5000)))
        print("append stage_seconds:", info["stage_seconds"], flush=True)

    if "piece" in legs:
        from pyspark.sql import functions as F
        from pears_fruit_fly_spark.operators.pieces import piece_encode
        spm_scores = {"▁" + t: float(lp)
                      for t, lp in zip(vocab.terms, vocab.logprobs)}
        for ch in "t0123456789":
            spm_scores[ch] = -12.0
        sample = spark.read.parquet(corpus_path).limit(4000)
        sample.count()
        leg("piece_encode", lambda: piece_encode(sample, spm_scores).agg(
            F.sum(F.length("text"))).collect())

    if "queries" in legs:
        qmap = entrymod.queries()
        for name in ("q_bm25_topk", "q_token_counts", "q_doc_freq",
                     "q_jaccard_pairs", "q_minhash_rankdict",
                     "q_simhash_rankdict", "q_lang_id", "q_lang_id_multi",
                     "q_quality", "q_pricing_summary"):
            leg(name, lambda name=name: qmap[name](spark, SF_DIR).collect())

    print(json.dumps(timings))
    app_id = sc.applicationId
    spark.stop()
    print("APP", app_id)


if __name__ == "__main__":
    main()
