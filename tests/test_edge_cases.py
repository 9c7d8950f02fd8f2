"""Degenerate-input robustness: empty corpora, missing indexes, null text."""

from __future__ import annotations

import pytest

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
from pears_fruit_fly_spark.operators.postings import build_postings, read_postings
from pears_fruit_fly_spark.operators.signatures import build_signatures


def test_empty_corpus_build_and_query(spark, vocab, tmp_path):
    empty = spark.createDataFrame([], "url string, doc_id long, text string")
    d = str(tmp_path / "emptyidx")
    info = build_postings(spark, empty, vocab, d,
                          cfg=PostingsConfig(num_partitions=4))
    assert info["n_docs"] == 0
    assert bm25_topk_wand(spark, d, "t0 t1", vocab, k=5).count() == 0


def test_null_and_whitespace_text_docs(spark, vocab, fly_cfg, tmp_path):
    rows = [("u0", 0, None), ("u1", 1, ""), ("u2", 2, "   "), ("u3", 3, "t0 t1 t0")]
    df = spark.createDataFrame(rows, "url string, doc_id long, text string")
    sigs = build_signatures(spark, df, vocab, fly_cfg).collect()
    assert len(sigs) == 4
    by_url = {r["url"]: r for r in sigs}
    assert by_url["u0"]["doclen"] == 0 and by_url["u3"]["doclen"] == 3

    d = str(tmp_path / "nullidx")
    info = build_postings(spark, df, vocab, d, cfg=PostingsConfig(num_partitions=4))
    assert info["n_docs"] == 4
    got = bm25_topk_wand(spark, d, "t0", vocab, k=5).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_missing_index_raises_cleanly(spark, vocab, tmp_path):
    with pytest.raises(FileNotFoundError):
        bm25_topk_wand(spark, str(tmp_path / "nope"), "t0", vocab, k=5).count()
