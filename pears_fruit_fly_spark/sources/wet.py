"""WET-style extraction source — the byte-identity invariant lives here.

The per-row invariant checked against the reference
(BASELINE.json input_hint): extracted text per url must be byte-identical to
the semantics of read_doc_wet (ref: common_crawl_processor/cc_process_wet.py:36-54):

    payload.decode('utf-8')           # strict; failure => record skipped
    lines = decoded.split('\\n')
    title = lines[0]
    text  = '\\n'.join(lines[1:])

Decode-failure semantics pinned per SURVEY.md §7: the reference wraps the
record read in a try that swallows the UnicodeDecodeError together with the
record, so a non-UTF-8 payload yields no output row (title/text null here,
filtered by the ingest filter).

Everything is vectorized: one Arrow batch in, one pandas apply over bytes —
no per-row Python UDFs registered with Spark (input_hint mandate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pears_fruit_fly_spark.config import INGEST_MIN_CHARS

_EXTRACT_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("text", StringType()),
    ]
)


def _extract_one(payload) -> tuple[str | None, str | None]:
    if payload is None:
        return None, None
    try:
        decoded = bytes(payload).decode("utf-8")
    except (UnicodeDecodeError, ValueError):
        return None, None  # record skipped on decode failure (pinned)
    lines = decoded.split("\n")
    return lines[0], "\n".join(lines[1:])


@pandas_udf(_EXTRACT_SCHEMA)
def extract_text(html: pd.Series) -> pd.DataFrame:
    """html binary → struct(title, text), byte-identical per cc_process_wet.py:51-52."""
    pairs = [_extract_one(p) for p in html]
    return pd.DataFrame(pairs, columns=["title", "text"])


def extract_pages(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add title/text columns extracted from the raw WET payload bytes."""
    extracted = df.withColumn("_ex", extract_text(F.col(html_col)))
    return extracted.withColumns(
        {"title": F.col("_ex.title"), "text": F.col("_ex.text")}
    ).drop("_ex")


def with_detected_lang(
    df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    title_col: str | None = "title",
    lang_col: str = "lang",
) -> DataFrame:
    """Add/replace the lang column by running the engine's langdetect-parity
    detector over the reference's exact input slice — title + ' ' +
    text[:1000] (cc_process_wet.py:26-33/53 feeds exactly that to
    langdetect). The ingest pipeline becomes:

        read_wet_files → extract_pages → with_detected_lang → ingest_filter

    matching the reference's read_doc_wet record shape (url, title, text,
    lang). Dependency-free (textstats.lang_id_multi: unicode-script counts
    + 22-language stopword vote, Column algebra + one vote aggregation)."""
    from pears_fruit_fly_spark.operators.textstats import lang_id_multi

    pred = lang_id_multi(
        df, key_col, text_col,
        title_col=title_col if title_col in df.columns else None,
    ).select(F.col("id").alias(key_col), F.col("pred_lang"))
    return (
        df.drop(lang_col)
        .join(pred, key_col, "left")
        .withColumnRenamed("pred_lang", lang_col)
    )


def ingest_filter(
    df: DataFrame,
    lang: str | None = "en",
    min_chars: int = INGEST_MIN_CHARS,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The reference's ingest predicates (cc_process_wet.py:77-80):
    keep iff text non-null, len(text) >= min_chars, and lang matches.

    Expressed as plain Column predicates BEFORE any UDF in the plan so
    Catalyst pushes them into the parquet/Iceberg scan (SURVEY.md §4.1
    'early input filtering').
    """
    cond: Column = F.col(text_col).isNotNull() & (F.length(text_col) >= min_chars)
    if lang is not None:
        cond = cond & (F.col(lang_col) == F.lit(lang))
    return df.filter(cond)


def dedup_latest(
    df: DataFrame, key: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Keep the latest crawl per url (re-crawl dedup, SURVEY.md P7).

    row_number over (partitionBy key orderBy ts desc) — one shuffle on the
    key; at scale the key is high-cardinality so the shuffle is well spread.
    Tie on ts broken by nothing further (url unique per ts in practice).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.desc(ts_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def parse_wet_records(raw: bytes):
    """No-dependency WARC/WET record splitter over raw shard bytes.

    The WARC format is line-delimited headers terminated by an empty line,
    then exactly Content-Length payload bytes, then a blank-line separator
    (what warcio's ArchiveIterator walks in the reference,
    cc_process_wet.py:62,76). Yields (headers: dict lower-cased, payload
    bytes) per record; tolerates missing/invalid Content-Length by skipping
    to the next 'WARC/' magic. Pure bytes — payload is NOT decoded here, so
    the byte-identity contract of extract_text is preserved downstream.
    """
    pos, n = 0, len(raw)
    while pos < n:
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        header_block = raw[pos:head_end]
        lines = header_block.split(b"\r\n")
        if not lines or not lines[0].startswith(b"WARC/"):
            nxt = raw.find(b"WARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("utf-8", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            nxt = raw.find(b"WARC/", head_end)
            if nxt < 0:
                return
            pos = nxt
            continue
        body_start = head_end + 4
        payload = raw[body_start : body_start + clen]
        yield headers, payload
        pos = body_start + clen
        # skip the inter-record blank lines (spec: two CRLFs)
        while raw.startswith(b"\r\n", pos):
            pos += 2


WET_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
    ]
)


def read_wet_files(spark, paths: str | list[str]) -> DataFrame:
    """WET shard ingest → (url, warc_ts, html) rows, no external libs.

    Plan: binaryFile scan (one row per shard — the natural Common-Crawl
    granularity, ~150 MB each, so task = shard exactly like the reference's
    per-file loop, cc_process_wet.py:58-88) → mapInPandas record splitter.
    `.gz` shards are decompressed member-by-member (WET files are
    multi-member gzip). Record filter mirrors read_doc_wet + the rec_type
    check (cc_process_wet.py:41-54,80): keep `conversion` records carrying a
    WARC-Target-URI. Payload bytes land UNdecoded in `html`; run
    extract_pages for the byte-identical (title, text) and ingest_filter /
    lang-id downstream.
    """
    import gzip
    import io
    from collections.abc import Iterator

    files = spark.read.format("binaryFile").load(paths)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if path.endswith(".gz"):
                    # GzipFile consumes ALL members of a multi-member stream
                    with gzip.GzipFile(fileobj=io.BytesIO(raw)) as g:
                        raw = g.read()
                urls, tss, payloads = [], [], []
                for headers, payload in parse_wet_records(raw):
                    if headers.get("warc-type") != "conversion":
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    urls.append(url)
                    tss.append(headers.get("warc-date"))
                    payloads.append(payload)
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "warc_ts": pd.to_datetime(
                                tss, errors="coerce", utc=True
                            ).tz_localize(None),
                            "html": payloads,
                        }
                    )

    return files.select("path", "content").mapInPandas(_parse, WET_PAGES_SCHEMA)
