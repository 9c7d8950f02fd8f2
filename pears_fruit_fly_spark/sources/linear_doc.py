"""Legacy linear-doc (pseudo-XML) source — migration path for reference users.

The reference stores corpora as line-oriented pseudo-XML:

    <doc id=123 url=https://x class=Sports>      (attrs vary by pipeline)
    body line 1
    body line 2
    </doc>

writers: common_crawl_processor/cc_process_wet.py:81-83 (url/title/lang),
readers: fruit_fly/hyperparam_search.py:46-68 (id/class),
web_map/umap/utils.py:74-99 (title/categories),
dense_fruit_fly/utils.py:65-89 (multi-label `|`-separated class).

This source parses those files distributed (one task per file via wholetext
read + mapInPandas regex parsing) into the engine's row-per-document shape,
so existing corpora drop straight into the new table layout. Attribute
regexes mirror the reference readers; unknown attrs are preserved in a map.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_ref", StringType()),   # id attr if present else None
        StructField("url", StringType()),
        StructField("cls", StringType()),        # class attr (may be a|b|c)
        StructField("title", StringType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("attrs", MapType(StringType(), StringType())),
        StructField("source_file", StringType()),
    ]
)

_HEADER_RE = re.compile(r"<doc\b([^>]*)>")
# attr regex semantics follow the reference readers: values run to the next
# space (hyperparam_search.py:53-56: `.*id=([^ ]*) `, `.*class=([^ ]*)>`)
_ATTR_RE = re.compile(r"(\w+)=([^ >]*)")


def parse_linear_doc_text(content: str, source_file: str = "") -> list[dict]:
    """Parse one file's content into doc dicts (pure function, unit-testable)."""
    docs: list[dict] = []
    cur: dict | None = None
    body: list[str] = []
    for line in content.split("\n"):
        if line.startswith("<doc"):
            m = _HEADER_RE.match(line)
            attrs = dict(_ATTR_RE.findall(m.group(1))) if m else {}
            cur = {
                "doc_ref": attrs.get("id"),
                "url": attrs.get("url"),
                "cls": attrs.get("class"),
                "title": attrs.get("title"),
                "lang": attrs.get("lang"),
                "attrs": attrs,
                "source_file": source_file,
            }
            body = []
        elif line.startswith("</doc"):
            if cur is not None:
                cur["text"] = "\n".join(body)
                docs.append(cur)
                cur = None
        elif cur is not None:
            body.append(line)
    return docs


def read_linear_docs(spark: SparkSession, path: str) -> DataFrame:
    """Distributed read of a directory/glob of linear-doc files.

    wholetext=True gives one row per file (doc blocks never split across
    tasks); parsing fans out via mapInPandas. Compressed .gz files are
    decompressed by the text source automatically.
    """
    files = spark.read.text(path, wholetext=True).withColumn(
        "path", F.input_file_name()
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for content, p in zip(pdf["value"], pdf["path"]):
                rows.extend(parse_linear_doc_text(content, p))
            if rows:
                out = pd.DataFrame(rows)
                for f in DOC_SCHEMA.fields:
                    if f.name not in out.columns:
                        out[f.name] = None
                yield out[[f.name for f in DOC_SCHEMA.fields]]

    return files.mapInPandas(_parse, DOC_SCHEMA)


def write_linear_docs(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    title_col: str = "title",
    lang_col: str = "lang",
    text_col: str = "text",
) -> None:
    """Write the reference's pseudo-XML format (cc_process_wet.py:81-83:
    title spaces become underscores) — for round-tripping corpora back to
    tools that still consume it. One text file per partition."""
    framed = df.select(
        F.concat(
            F.lit("<doc url="), F.col(url_col),
            F.lit(" title="),
            F.regexp_replace(F.coalesce(F.col(title_col), F.lit("")), " ", "_"),
            F.lit(" lang="), F.coalesce(F.col(lang_col), F.lit("unk")),
            F.lit(">\n"),
            F.coalesce(F.col(text_col), F.lit("")),
            F.lit("\n</doc>"),
        ).alias("value")
    )
    framed.write.mode("overwrite").text(path)
