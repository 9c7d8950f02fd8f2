"""Web-pages table source: the BASELINE.json input shape behind one call.

The north rule's steady-state input is "an Iceberg table of
Common-Crawl-style web pages with columns (url:string,
warc_ts:timestamp, html:binary, text:string, lang:string)"
(BASELINE.json input_hint; SURVEY.md S1 steady state). This adapter
resolves a table reference to that DataFrame:

* ``iceberg:<catalog.db.table>`` → ``spark.read.format("iceberg")`` —
  the real production branch. Catalyst treats an Iceberg scan like any
  V2 source: the same predicate pushdown / column pruning the rest of
  the engine plan-asserts over parquet applies unchanged, and every
  downstream operator is source-agnostic (they take DataFrames). This
  sandbox ships NO Iceberg runtime jar (offline, 286 stock Spark jars),
  so the branch is exercised up to Spark's "failed to find data source"
  error in tests and for real on any cluster with
  iceberg-spark-runtime on the classpath.
* ``<path>`` (or ``parquet:<path>``) → ``spark.read.parquet`` — the
  sandbox/test branch; all fixtures and benches use it.

``columns`` (optional) trims the scan up front — passing
``["url", "text"]`` keeps the (huge) html binary out of ReadSchema on
either branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages_table(
    spark: SparkSession,
    ref: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Resolve a pages-table reference (see module doc) to a DataFrame."""
    if ref.startswith("iceberg:"):
        df = spark.read.format("iceberg").load(ref[len("iceberg:"):])
    elif ref.startswith("parquet:"):
        df = spark.read.parquet(ref[len("parquet:"):])
    else:
        df = spark.read.parquet(ref)
    return df.select(*columns) if columns else df
