"""Legacy linear-doc source round-trip + SearchEngine facade tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pears_fruit_fly_spark.functions.fly import (
    make_projection_matrix,
    read_projections_text,
    write_projections_text,
)
from pears_fruit_fly_spark.sources.linear_doc import (
    parse_linear_doc_text,
    read_linear_docs,
    write_linear_docs,
)


def test_parse_linear_doc_text_reference_shapes():
    # wet-writer shape (cc_process_wet.py:81-83)
    content = (
        "<doc url=https://a.example/1 title=Some_Page lang=en>\n"
        "line one\nline two\n</doc>\n"
        "<doc id=42 class=Sports|News url=https://b.example/2>\n"
        "body\n</doc>\n"
    )
    docs = parse_linear_doc_text(content, "f.xml")
    assert len(docs) == 2
    assert docs[0]["url"] == "https://a.example/1"
    assert docs[0]["title"] == "Some_Page"
    assert docs[0]["lang"] == "en"
    assert docs[0]["text"] == "line one\nline two"
    assert docs[1]["doc_ref"] == "42"
    assert docs[1]["cls"] == "Sports|News"  # multi-label preserved (ref
    # semantics: dense_fruit_fly/utils.py:75 splits on '|')
    assert docs[1]["attrs"]["url"] == "https://b.example/2"


def test_linear_doc_roundtrip(spark, tmp_path):
    rows = [
        ("https://x/1", "Title One", "en", "alpha beta\ngamma"),
        ("https://x/2", "Title Two", "de", "delta"),
    ]
    df = spark.createDataFrame(rows, "url string, title string, lang string, text string")
    out = str(tmp_path / "legacy")
    write_linear_docs(df, out)
    back = read_linear_docs(spark, out)
    got = {r["url"]: (r["title"], r["lang"], r["text"]) for r in back.collect()}
    assert got["https://x/1"] == ("Title_One", "en", "alpha beta\ngamma")
    assert got["https://x/2"] == ("Title_Two", "de", "delta")


def test_projections_text_roundtrip(tmp_path):
    proj = make_projection_matrix(50, 17, 3, seed=9)
    p = str(tmp_path / "fly.projs")
    write_projections_text(proj, p)
    back = read_projections_text(p, 50)
    np.testing.assert_array_equal(back, proj)


def test_search_engine_facade(spark, pages_df, vocab, fly_cfg, tmp_path_factory):
    from pears_fruit_fly_spark.api import SearchEngine
    from pears_fruit_fly_spark.config import PostingsConfig
    from pears_fruit_fly_spark.oracle.bm25_numpy import BM25Oracle

    d = str(tmp_path_factory.mktemp("engine"))
    eng = SearchEngine(
        spark, d, vocab, fly_cfg,
        postings_cfg=PostingsConfig(num_partitions=8, skew_df_threshold=1 << 30),
    )
    eng.index(pages_df)

    # bm25 mode matches the numpy oracle through the whole facade
    docmap = {r["url"]: r["doc_id"] for r in spark.read.parquet(eng.docmap_path).collect()}
    from pears_fruit_fly_spark.sources.wet import dedup_latest

    clean = dedup_latest(pages_df)
    oracle = BM25Oracle(
        [(docmap[r["url"]], r["text"]) for r in clean.select("url", "text").collect()],
        vocab,
    )
    qtext = "t1 t5 t9"
    got = [(r["doc_id"], round(r["score"], 9)) for r in eng.search(qtext, k=10).collect()]
    want = [(d_, round(s, 9)) for d_, s in oracle.topk(qtext, 10)]
    assert got == want

    # hamming mode returns k rows with distances
    h = eng.search(qtext, k=7, mode="hamming").collect()
    assert len(h) == 7 and all(r["hamming"] >= 0 for r in h)

    # hybrid mode: results are a subset of the prefilter candidate set,
    # scored identically to pure BM25 on those docs
    hy = [(r["doc_id"], round(r["score"], 9)) for r in eng.search(qtext, k=10, mode="hybrid", prefilter_k=50).collect()]
    assert len(hy) <= 10
    full = dict(want)
    assert all(s == full.get(d_, s) for d_, s in hy)

    with pytest.raises(ValueError):
        eng.search("x", mode="bogus")
