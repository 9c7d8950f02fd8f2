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
from pyspark.sql.types import StringType, StructField, StructType

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


def read_wet_files(spark, paths: str) -> DataFrame:
    """Production WET ingest: binaryFile scan + warcio inside mapInPandas.

    Gated: warcio is not installed in this sandbox; the extraction semantics
    it would feed are fully covered by extract_pages over the (url, warc_ts,
    html, ...) table shape (BASELINE.json input_hint).
    """
    try:
        import warcio  # noqa: F401, PLC0415
    except ImportError as e:  # pragma: no cover - sandbox has no warcio
        raise NotImplementedError(
            "warcio not available in this environment; ingest from the "
            "(url, warc_ts, html, text, lang) table instead"
        ) from e
    raise NotImplementedError("WET file ingest wired in production builds only")
