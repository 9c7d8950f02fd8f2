"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per driver instruction the same
jobs run at two parallelism levels — local[8] (N) and local[32] (4N) — on the
SAME input, each in a FRESH JVM (subprocess) so executor-thread count is the
only variable. Reports docs/sec at both levels and
efficiency = (T_N / T_4N) / 4 for the two heavyweight paths:

  * sig_build   — zero-shuffle fruit-fly featurize+hash pass
  * index_build — full postings build (shuffle + sort + encode)

Usage: PYTHONPATH=/root/repo python scripts/scaling_bench.py [n_docs]
Writes BENCH_SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pears_fruit_fly_spark.config import FlyConfig, PostingsConfig
from pears_fruit_fly_spark.fixtures.webtext import make_vocab_file_lines, make_web_pages
from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
from pears_fruit_fly_spark.operators.docids import assign_doc_ids
from pears_fruit_fly_spark.operators.postings import build_postings
from pears_fruit_fly_spark.operators.signatures import build_signatures
from pears_fruit_fly_spark.session import get_spark
from pears_fruit_fly_spark.sources.wet import dedup_latest

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); corpus = sys.argv[3]
spark = get_spark("scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(corpus)
vocab = parse_vocab_lines(make_vocab_file_lines(2000))
cfg = FlyConfig(pn_size=2000, kc_size=512, proj_size=8, top_words=250,
                wta_percent=10.0)
work = tempfile.mkdtemp()

t0 = time.time()
build_signatures(spark, pages, vocab, cfg).write.mode("overwrite").parquet(
    work + "/sigs")
sig_s = time.time() - t0

clean = dedup_latest(pages)
pages_ids = clean.join(assign_doc_ids(clean), "url")
t0 = time.time()
build_postings(spark, pages_ids, vocab, work + "/idx",
               cfg=PostingsConfig(num_partitions=2 * cpus,
                                  skew_df_threshold=5000,
                                  max_docs_per_subpartition=5000))
idx_s = time.time() - t0
print(json.dumps({{"cpus": cpus, "sig_s": sig_s, "idx_s": idx_s}}))
spark.stop()
"""


def run_level(cpus: int, n_docs: int, corpus: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_docs), corpus],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    # build the shared corpus once (driver-side pandas, no Spark needed)
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from pears_fruit_fly_spark.fixtures.webtext import make_web_pages

    corpus_dir = tempfile.mkdtemp(prefix="scaling_corpus_")
    pdf = make_web_pages(n=n_docs, v=2000)
    pq.write_table(pa.Table.from_pandas(pdf), corpus_dir + "/part0.parquet")

    results = {}
    for cpus in (8, 32):
        r = run_level(cpus, n_docs, corpus_dir)
        results[cpus] = r
        print(f"local[{cpus}]: sig {r['sig_s']:.1f}s "
              f"({n_docs / r['sig_s']:.0f} docs/s), "
              f"index {r['idx_s']:.1f}s ({n_docs / r['idx_s']:.0f} docs/s)")

    eff_sig = (results[8]["sig_s"] / results[32]["sig_s"]) / 4
    eff_idx = (results[8]["idx_s"] / results[32]["idx_s"]) / 4
    out = {
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "sig_docs_per_sec": {
            "local8": round(n_docs / results[8]["sig_s"], 1),
            "local32": round(n_docs / results[32]["sig_s"], 1),
        },
        "index_docs_per_sec": {
            "local8": round(n_docs / results[8]["idx_s"], 1),
            "local32": round(n_docs / results[32]["idx_s"], 1),
        },
        "scaling_efficiency_sig": round(eff_sig, 3),
        "scaling_efficiency_index": round(eff_idx, 3),
        "note": "N vs 4N executors evidenced as local[8] vs local[32] per "
                "driver instruction; fresh JVM per level; identical input",
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
