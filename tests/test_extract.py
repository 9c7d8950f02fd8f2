"""Byte-identity tests for WET extraction (the per-row invariant).

Oracle = a ~10-line inline restatement of read_doc_wet semantics
(ref: common_crawl_processor/cc_process_wet.py:36-54): strict utf-8 decode,
title = first '\\n'-split element, text = '\\n'.join(rest); decode failure
=> record skipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pears_fruit_fly_spark.sources.wet import dedup_latest, extract_pages, ingest_filter


def oracle_extract(payload: bytes):
    try:
        decoded = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None, None
    lines = decoded.split("\n")
    return lines[0], "\n".join(lines[1:])


def test_extract_byte_identity(spark, pages_df, pages_pdf):
    got = {
        (r["url"], r["warc_ts"]): (r["title"], r["text_x"])
        for r in extract_pages(pages_df)
        .select("url", "warc_ts", "title", F.col("text").alias("text_orig"),
                F.col("text").alias("text_x"))
        .collect()
    }
    # compare against the oracle on every row, including edge cases
    n_checked = 0
    for row in pages_pdf.itertuples(index=False):
        title, text = oracle_extract(bytes(row.html))
        key = (row.url, row.warc_ts.to_pydatetime().replace(tzinfo=None))
        assert key in got
        gt, gx = got[key]
        assert gt == title, f"title mismatch for {row.url}"
        assert gx == text, f"text mismatch for {row.url}"
        if text is not None:
            # byte identity, not just str equality
            assert gx.encode("utf-8") == text.encode("utf-8")
        n_checked += 1
    assert n_checked == len(pages_pdf)


def test_extract_handles_decode_failure(spark, pages_df):
    bad = (
        extract_pages(pages_df)
        .filter(F.col("text").isNull() & F.col("html").isNotNull())
        .count()
    )
    assert bad >= 1  # the injected non-UTF-8 payload yields nulls


def test_extract_edge_cases(spark):
    rows = [
        ("u-crlf", bytearray("Title\r\nline1\r\nline2".encode("utf-8"))),
        ("u-empty", bytearray(b"TitleOnly")),
        ("u-trailnl", bytearray(b"T\nbody\n")),
        ("u-multibyte", bytearray("T\n日本語 😀 ümlaut".encode("utf-8"))),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["title"], r["text"]) for r in extract_pages(df).collect()}
    assert got["u-crlf"] == ("Title\r", "line1\r\nline2")  # \r survives: split on \n only
    assert got["u-empty"] == ("TitleOnly", "")
    assert got["u-trailnl"] == ("T", "body\n")
    assert got["u-multibyte"] == ("T", "日本語 😀 ümlaut")


def test_ingest_filter_semantics(spark, pages_df):
    kept = ingest_filter(pages_df, lang="en", min_chars=1000)
    rows = kept.select("text", "lang").collect()
    assert all(len(r["text"]) >= 1000 and r["lang"] == "en" for r in rows)
    # filter must be pushdown-eligible: plain predicates, no UDF in the plan
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan.lower()


def test_dedup_latest(spark, pages_df):
    deduped = dedup_latest(pages_df)
    assert deduped.count() == pages_df.select("url").distinct().count()
    # for a known re-crawled url, the later warc_ts must win
    dup_urls = [
        r["url"]
        for r in pages_df.groupBy("url").count().filter("count > 1").collect()
    ]
    assert dup_urls
    u = dup_urls[0]
    max_ts = pages_df.filter(F.col("url") == u).agg(F.max("warc_ts")).first()[0]
    got_ts = deduped.filter(F.col("url") == u).first()["warc_ts"]
    assert got_ts == max_ts


def _wet_record(rtype: str, uri: str | None, date: str, payload: bytes) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if uri is not None:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head += [
        b"WARC-Date: " + date.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_wet_file_ingest_byte_identity(spark, tmp_path):
    """VERDICT r1 #7: raw .wet/.wet.gz shard -> rows -> extract_text must be
    byte-identical to read_doc_wet semantics (cc_process_wet.py:36-54),
    including the decode-failure skip and non-conversion record filtering."""
    import gzip

    from pears_fruit_fly_spark.sources.wet import read_wet_files

    body1 = "Title One\nline a\nline b é".encode()
    body2 = "Second title\nbody text".encode()
    bad_utf8 = b"Bad\n\xff\xfe broken"
    shard = (
        _wet_record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: x")
        + _wet_record("conversion", "http://a.example/1",
                      "2024-02-03T04:05:06Z", body1)
        + _wet_record("request", "http://a.example/1",
                      "2024-02-03T04:05:06Z", b"GET /")
        + _wet_record("conversion", "http://a.example/2",
                      "2024-02-03T04:05:07Z", body2)
        + _wet_record("conversion", "http://a.example/bad",
                      "2024-02-03T04:05:08Z", bad_utf8)
        + _wet_record("conversion", None, "2024-02-03T04:05:09Z", b"no uri\nx")
    )
    plain = tmp_path / "shard.wet"
    plain.write_bytes(shard)
    # multi-member gzip (the real CC layout: one member per record)
    gz = tmp_path / "shard2.wet.gz"
    gz.write_bytes(b"".join(gzip.compress(m + b"\r\n\r\n")
                            for m in shard.split(b"\r\n\r\n") if m))

    for p in (str(plain), str(gz)):
        rows = read_wet_files(spark, p).collect()
        assert [r["url"] for r in rows] == [
            "http://a.example/1", "http://a.example/2", "http://a.example/bad"
        ]
        assert bytes(rows[0]["html"]) == body1  # payload bytes untouched
        assert rows[0]["warc_ts"].isoformat() == "2024-02-03T04:05:06"

        pages = extract_pages(read_wet_files(spark, p))
        got = {r["url"]: (r["title"], r["text"]) for r in pages.collect()}
        # read_doc_wet: title = line 0, text = '\n'.join(rest) — byte-identical
        assert got["http://a.example/1"] == ("Title One", "line a\nline b é")
        assert got["http://a.example/2"] == ("Second title", "body text")
        # decode failure => record yields null text (reference swallows it)
        assert got["http://a.example/bad"] == (None, None)


def test_wet_parser_resyncs_on_garbage(spark, tmp_path):
    from pears_fruit_fly_spark.sources.wet import parse_wet_records

    good = _wet_record("conversion", "http://x/1", "2024-01-01T00:00:00Z",
                       b"T\nbody")
    raw = b"garbage bytes without magic\r\n\r\n" + good + b"trailing junk"
    recs = list(parse_wet_records(raw))
    assert len(recs) == 1
    assert recs[0][0]["warc-target-uri"] == "http://x/1"


def test_with_detected_lang_ingest_pipeline(spark):
    """Reference ingest parity (cc_process_wet.py:36-54 + 26-33): extract
    title/text from the payload, DETECT lang over title + ' ' + text[:1000],
    then gate on it — the full read_doc_wet record shape."""
    import datetime as dt

    from pears_fruit_fly_spark.sources.wet import with_detected_lang

    ts = dt.datetime(2024, 1, 1)

    def payload(title, body):
        return bytearray((title + "\n" + body).encode("utf-8"))

    rows = [
        ("u_en", ts, payload("A Title", "the cat is on the mat and it was "
                             "there for the evening with all of this")),
        ("u_de", ts, payload("Ein Titel", "der hund ist nicht auf der "
                             "straße und ich bin mit dem auto gefahren")),
        ("u_ru", ts, payload("Заголовок", "это русский текст про погоду и "
                             "природу в деревне зимой")),
        # language signal ONLY in the title (reference slice catches it)
        ("u_zh", ts, payload("這是標題 這是標題 這是標題 這是標題", "12345 67890")),
        ("u_unk", ts, payload("", "zz qq 123")),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    pages = with_detected_lang(extract_pages(df))
    langs = {r["url"]: r["lang"] for r in pages.collect()}
    assert langs == {"u_en": "en", "u_de": "de", "u_ru": "ru",
                     "u_zh": "zh", "u_unk": "unk"}
    kept = {r["url"] for r in ingest_filter(pages, lang="de", min_chars=10)
            .collect()}
    assert kept == {"u_de"}
