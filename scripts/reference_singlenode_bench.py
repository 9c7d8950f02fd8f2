"""Single-node throughput comparison anchor.

The reference publishes no throughput numbers (BASELINE.md), so the
'matches-or-beats the reference's single-node throughput' check is anchored
by measuring the REFERENCE'S PIPELINE SHAPE on this machine: one process,
one thread, documents hashed through tokenize → count-vectorize → weight →
doc-WTA → projection matmul → KC-WTA → binarize in 2,000-doc matrix chunks
(the exact structure of fruit_fly/hash.py:121,136 + utils.py:25-45,
re-expressed with the same NumPy kernel the engine uses — so the comparison
isolates orchestration, not kernel implementation).

Prints one JSON line: single-process docs/sec for the same corpus/config the
engine bench (bench.py) and scaling bench use. Compare with
BENCH_SCALING.json sig_docs_per_sec.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.fixtures.webtext import (
    make_vocab_file_lines,
    make_web_pages,
)
from pears_fruit_fly_spark.functions.fly import (
    featurize_batch,
    make_projection_matrix,
)
from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
from pears_fruit_fly_spark.functions.tokenizer import whitespace_tokenize

CHUNK = 2000  # the reference's batch size (fruit_fly/hash.py:121)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    vocab = parse_vocab_lines(make_vocab_file_lines(2000))
    cfg = FlyConfig(pn_size=2000, kc_size=512, proj_size=8, top_words=250,
                    wta_percent=10.0)
    pdf = make_web_pages(n=n_docs, v=2000)
    proj = make_projection_matrix(vocab.size, cfg.kc_size, cfg.proj_size,
                                  cfg.seed).astype(np.float32)
    weights = vocab.weights.astype(np.float32)
    t2i = vocab.term_to_id

    texts = list(pdf["text"])
    t0 = time.time()
    n_done = 0
    for start in range(0, len(texts), CHUNK):
        chunk = texts[start : start + CHUNK]
        tokens = [
            [t2i[t] for t in whitespace_tokenize(x.replace("\n", " ")) if t in t2i]
            for x in chunk
        ]
        featurize_batch(tokens, weights, proj, cfg.top_words, cfg.wta_percent)
        n_done += len(chunk)
    wall = time.time() - t0
    print(json.dumps({
        "mode": "single-process-reference-shape",
        "n_docs": n_done,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_done / wall, 1),
        "config": {"pn": 2000, "kc": 512, "chunk": CHUNK},
    }))


if __name__ == "__main__":
    main()
