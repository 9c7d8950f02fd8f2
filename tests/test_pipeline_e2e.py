"""One end-to-end run of the production pipeline a reference user would
switch to: raw WET shard → extract → language ID → ingest filter →
dedup-latest → SearchEngine (signatures + positional index) → BM25 /
hamming / hybrid / phrase / boolean search → snippets → SQL sugar →
incremental append. Every stage is unit-tested elsewhere; this pins the
SEAMS — schemas, id alignment, and config flowing between stages."""

from __future__ import annotations

import gzip

import pytest

from pears_fruit_fly_spark.api import SearchEngine
from pears_fruit_fly_spark.config import FlyConfig, PostingsConfig


def _wet_record(rec_type, uri, date, payload: bytes) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head += [
        b"WARC-Date: " + date.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


@pytest.fixture(scope="module")
def wet_shard(tmp_path_factory):
    docs = [
        ("http://en.example/solar", "Solar Power Guide\n"
         + "the solar panel converts sunlight into power and the panel "
           "is on the roof of the house " * 40),
        ("http://en.example/wind", "Wind Energy\n"
         + "the wind turbine makes power from moving air and it is "
           "placed on a hill for this reason " * 40),
        ("http://en.example/solar2", "Solar Again\n"
         + "solar panel power " + "this text is about energy from the "
           "sun and panels on roofs " * 40),
        # German page: must be dropped by the lang filter
        ("http://de.example/sonne", "Sonnenkraft\n"
         + "der strom ist nicht auf dem dach und ich bin hier mit der "
           "sonne und dem wind " * 40),
        # too short: must be dropped by min_chars
        ("http://en.example/short", "Short\nway too short"),
    ]
    shard = b"".join(
        _wet_record("conversion", url, "2024-02-03T04:05:06Z",
                    text.encode())
        for url, text in docs
    )
    # re-crawl of /solar with a NEWER date: dedup_latest must keep this one
    shard += _wet_record(
        "conversion", "http://en.example/solar", "2024-06-01T00:00:00Z",
        docs[0][1].encode(),
    )
    d = tmp_path_factory.mktemp("wet")
    p = d / "shard.wet.gz"
    p.write_bytes(b"".join(
        gzip.compress(m + b"\r\n\r\n")
        for m in shard.split(b"\r\n\r\n") if m
    ))
    return str(p)


def test_full_pipeline_wet_to_search(spark, tmp_path, wet_shard):
    from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
    from pears_fruit_fly_spark.operators.snippets import snippets
    from pears_fruit_fly_spark.plans.sql_sugar import Bm25Sql
    from pears_fruit_fly_spark.sources.wet import (
        extract_pages,
        ingest_filter,
        read_wet_files,
        with_detected_lang,
    )

    # ---- ingest: WET shard -> (url, warc_ts, text, lang) ----
    raw = read_wet_files(spark, wet_shard)
    pages = with_detected_lang(extract_pages(raw))
    clean = ingest_filter(pages, lang="en", min_chars=500)
    urls = {r["url"] for r in clean.select("url").distinct().collect()}
    assert urls == {"http://en.example/solar", "http://en.example/wind",
                    "http://en.example/solar2"}

    # ---- engine build: dedup-latest + signatures + positional index ----
    words = ["the", "solar", "panel", "power", "wind", "turbine", "energy",
             "sunlight", "roof", "house", "air", "hill", "sun", "converts",
             "makes", "moving", "placed", "into", "from", "and"]
    vocab = parse_vocab_lines([f"{w}\t{-(i + 1) / 2}" for i, w in
                               enumerate(words)])
    eng = SearchEngine(
        spark, str(tmp_path / "engine"), vocab,
        fly_cfg=FlyConfig(pn_size=vocab.size, kc_size=64, proj_size=4,
                          top_words=10, wta_percent=20.0),
        postings_cfg=PostingsConfig(num_partitions=4, store_positions=True),
    )
    info = eng.index(clean)
    assert info["n_docs"] == 3  # dedup-latest collapsed the re-crawl

    # the re-crawled /solar kept the NEWER timestamp (dedup-latest)
    from pears_fruit_fly_spark.sources.wet import dedup_latest

    kept_ts = {r["url"]: r["warc_ts"] for r in
               dedup_latest(clean).select("url", "warc_ts").collect()}
    assert kept_ts["http://en.example/solar"].year == 2024
    assert kept_ts["http://en.example/solar"].month == 6
    docmap = spark.read.parquet(eng.docmap_path)

    # ---- search modes ----
    bm = eng.search("solar panel", k=3).collect()
    assert bm[0]["url"] in ("http://en.example/solar",
                            "http://en.example/solar2")
    assert {r["url"] for r in bm} >= {"http://en.example/solar",
                                      "http://en.example/solar2"}
    hm = eng.search("solar panel", k=2, mode="hamming").collect()
    assert len(hm) == 2
    hy = eng.search("solar panel", k=2, mode="hybrid").collect()
    assert len(hy) == 2
    ph = eng.search_phrase("solar panel", k=3).collect()
    assert len(ph) >= 1
    bl = eng.search_boolean('+solar -turbine "solar panel"', k=3).collect()
    assert all(r["url"] != "http://en.example/wind" for r in bl)

    # ---- snippets over the positional index ----
    docs_ids = docmap.join(dedup_latest(clean), "url").select("doc_id", "text")
    snips = snippets(spark, eng.index_dir, "solar panel", vocab, docs_ids,
                     k=2, window=6).collect()
    assert len(snips) == 2
    assert all("solar" in r["snippet"] or "panel" in r["snippet"]
               for r in snips)

    # ---- SQL sugar over the same index ----
    sqlf = Bm25Sql(spark)
    sqlf.register_index("web", eng.index_dir, vocab)
    docmap.createOrReplaceTempView("e2e_docs")
    top = sqlf.sql(
        "SELECT url, bm25(web, 'solar panel') AS score FROM e2e_docs "
        "ORDER BY bm25(web, 'solar panel') DESC LIMIT 2"
    ).collect()
    assert [r["url"] for r in top] == [r["url"] for r in bm[:2]]

    # ---- incremental append: new page becomes searchable ----
    import pandas as pd

    new_pages = spark.createDataFrame(pd.DataFrame({
        "url": ["http://en.example/hydro"],
        "warc_ts": [pd.Timestamp("2024-07-01")],
        "html": [None],
        "text": ["Hydro Dam\n" + "the dam makes power from moving "
                 "water and the turbine is placed below " * 40],
        "lang": ["en"],
    }))
    eng.append(new_pages)
    after = eng.search("turbine power", k=4).collect()
    assert "http://en.example/hydro" in {r["url"] for r in after}
