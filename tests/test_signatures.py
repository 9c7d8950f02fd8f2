"""Spark signature build vs driver-side NumPy — partition independence and
Hamming top-k parity (ref query semantics: web_map/umap/utils.py:139-142)."""

from __future__ import annotations

import numpy as np

from pears_fruit_fly_spark.functions.fly import (
    featurize_batch,
    hamming_distance,
    make_projection_matrix,
)
from pears_fruit_fly_spark.functions.tokenizer import whitespace_tokenize
from pears_fruit_fly_spark.operators.signatures import (
    build_signatures,
    featurize_query,
    hamming_topk,
)


def _numpy_signatures(pages_pdf, vocab, cfg):
    proj = make_projection_matrix(vocab.size, cfg.kc_size, cfg.proj_size, cfg.seed)
    tokens = [
        vocab.encode(whitespace_tokenize(t.replace("\n", " ")))
        for t in pages_pdf["text"].fillna("")
    ]
    sigs, _ = featurize_batch(
        tokens, vocab.weights.astype(np.float32), proj.astype(np.float32),
        cfg.top_words, cfg.wta_percent,
    )
    return {
        (u, ts): (s.tolist(), len(tk))
        for u, ts, s, tk in zip(pages_pdf["url"], pages_pdf["warc_ts"], sigs, tokens)
    }


def test_signatures_match_numpy(spark, pages_df, pages_pdf, vocab, fly_cfg):
    got_rows = build_signatures(
        spark, pages_df.repartition(7), vocab, fly_cfg
    ).collect()
    want = _numpy_signatures(pages_pdf, vocab, fly_cfg)
    # urls recur (re-crawls with different text) → compare by url+doclen+sig set
    want_by_url: dict[str, set] = {}
    for (u, _), (s, dl) in want.items():
        want_by_url.setdefault(u, set()).add((tuple(s), dl))
    assert len(got_rows) == len(pages_pdf)
    for r in got_rows:
        assert (tuple(r["sig"]), r["doclen"]) in want_by_url[r["url"]], r["url"]


def test_hamming_topk_matches_numpy(spark, pages_df, pages_pdf, vocab, fly_cfg):
    sig_df = build_signatures(spark, pages_df, vocab, fly_cfg).persist()
    qtext = str(pages_pdf["text"].iloc[10])
    qsig = featurize_query(qtext, vocab, fly_cfg)

    got = hamming_topk(sig_df, qsig, k=15).collect()

    # NumPy oracle over the same rows
    rows = sig_df.collect()
    sigs = np.array([r["sig"] for r in rows], dtype=np.int64)
    urls = [r["url"] for r in rows]
    d = hamming_distance(sigs, qsig.reshape(1, -1))
    order = sorted(range(len(urls)), key=lambda i: (d[i], urls[i]))[:15]
    want = [(urls[i], int(d[i])) for i in order]
    assert [(r["url"], r["hamming"]) for r in got] == want
    # self-match: the query doc itself must rank at distance 0-ish top
    assert got[0]["hamming"] == min(d)
    sig_df.unpersist()


def test_signature_plan_is_shuffle_free(spark, pages_df, vocab, fly_cfg):
    """The featurize path must contain no Exchange (SURVEY.md §4.3)."""
    sig_df = build_signatures(spark, pages_df, vocab, fly_cfg)
    plan = sig_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
