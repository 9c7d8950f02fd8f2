"""Tombstone deletes: immediate exclusion, Lucene-style stale-stats
contract, physical purge at merge, API round-trip incl. re-adding a
deleted url after merge."""

from __future__ import annotations

import os

import pytest

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import (
    bm25_topk_wand,
    bm25_topk_wand_batch,
)
from pears_fruit_fly_spark.operators.postings import (
    TOMBSTONES_DIRNAME,
    build_postings,
    delete_docs,
    merge_segments,
)
from pears_fruit_fly_spark.oracle.bm25_numpy import BM25Oracle


DOCS = [(i, f"t{i % 9} t{(i * 3) % 13} t1 t2 t{i % 5}") for i in range(80)]


@pytest.fixture()
def index_with_deletes(spark, vocab, tmp_path):
    d = str(tmp_path / "idx")
    build_postings(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"),
        vocab, d, cfg=PostingsConfig(num_partitions=4),
    )
    return d


def _topk(spark, d, vocab, q="t1 t2", k=10):
    return [
        (r["doc_id"], r["score"])
        for r in bm25_topk_wand(spark, d, q, vocab, k=k, n_ranges=3).collect()
    ]


def test_deletes_visible_immediately_stats_stale(spark, vocab,
                                                 index_with_deletes):
    d = index_with_deletes
    before = _topk(spark, d, vocab, k=len(DOCS))  # full ranking baseline
    victims = [doc for doc, _ in before[:3]]
    assert delete_docs(spark, d, victims) == 3
    after = _topk(spark, d, vocab, k=20)
    got_ids = [doc for doc, _ in after]
    assert not set(victims) & set(got_ids)
    # Lucene contract: survivors keep their PRE-delete scores until merge
    pre = dict(before)
    for doc, score in after:
        assert abs(score - pre[doc]) < 1e-12
    # batch path excludes too
    rows = bm25_topk_wand_batch(spark, d, {0: "t1 t2"}, vocab, k=20,
                                n_ranges=3).collect()
    assert not set(victims) & {r["doc_id"] for r in rows}
    # repeated delete is idempotent at the id level
    assert delete_docs(spark, d, victims) == 3


def test_merge_purges_tombstones_and_recomputes_stats(spark, vocab,
                                                      index_with_deletes):
    d = index_with_deletes
    before = _topk(spark, d, vocab, k=20)
    victims = [doc for doc, _ in before[:3]]
    delete_docs(spark, d, victims)
    info = merge_segments(spark, d)
    assert info["n_docs"] == len(DOCS) - 3
    assert not os.path.isdir(os.path.join(d, TOMBSTONES_DIRNAME))
    # post-merge: rank-identical to the oracle over the SURVIVING corpus
    survivors = [(i, t) for i, t in DOCS if i not in set(victims)]
    oracle = BM25Oracle(survivors, vocab)
    for q in ("t1 t2", "t3 t4", "t0"):
        got = _topk(spark, d, vocab, q=q, k=10)
        want = oracle.topk(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


def test_engine_delete_search_merge_readd(spark, vocab, fly_cfg, pages_pdf,
                                          tmp_path):
    from pears_fruit_fly_spark.api import SearchEngine
    from pears_fruit_fly_spark.operators.postings import read_tombstones

    eng = SearchEngine(spark, str(tmp_path / "eng"), vocab, fly_cfg,
                       PostingsConfig(num_partitions=4))
    eng.index(spark.createDataFrame(pages_pdf.iloc[:120]))
    hit_urls = [r["url"] for r in eng.search("t1 t3", k=5).collect()]
    assert hit_urls
    victim = hit_urls[0]
    assert eng.delete([victim]) == 1
    # excluded from BM25 and hamming immediately
    assert victim not in {r["url"] for r in eng.search("t1 t3", k=50).collect()}
    assert victim not in {
        r["url"] for r in eng.search("t1 t3", k=50, mode="hamming").collect()
    }
    # merge physically purges docmap + signatures + postings
    eng.merge()
    assert read_tombstones(spark, eng.index_dir) is None
    docmap = spark.read.parquet(eng.docmap_path)
    assert docmap.filter(docmap.url == victim).count() == 0
    sigs = spark.read.parquet(eng.sig_path)
    assert sigs.filter(sigs.url == victim).count() == 0
    assert victim not in {r["url"] for r in eng.search("t1 t3", k=50).collect()}
    # the deleted url is re-addable as fresh content after merge
    import pandas as pd

    row = pages_pdf[pages_pdf.url == victim].iloc[:1]
    info = eng.append(spark.createDataFrame(pd.DataFrame(row)))
    assert info.get("n_docs") == 1
    docmap2 = spark.read.parquet(eng.docmap_path)
    assert docmap2.filter(docmap2.url == victim).count() == 1
