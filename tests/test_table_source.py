"""Pages-table adapter (sources/table.py): the BASELINE.json input shape."""

from __future__ import annotations

import os

import pytest

from pears_fruit_fly_spark.sources.table import PAGES_COLUMNS, read_pages_table


@pytest.fixture(scope="module")
def pages_path(spark, pages_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tbl") / "pages")
    spark.createDataFrame(pages_pdf).write.parquet(d)
    return d


def test_parquet_branch_and_schema(spark, pages_path):
    df = read_pages_table(spark, pages_path)
    assert set(PAGES_COLUMNS) <= set(df.columns)
    assert df.count() > 0
    # explicit scheme spelling reads the same table
    assert read_pages_table(spark, "parquet:" + pages_path).count() == df.count()


def test_column_trim_prunes_html_from_scan(spark, pages_path):
    df = read_pages_table(spark, pages_path, columns=["url", "text"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = [l for l in plan.split("\n") if "FileScan" in l][0]
    assert "html" not in scan_line


def test_iceberg_branch_reaches_format_resolution(spark):
    # the sandbox ships no iceberg runtime jar: the branch must get as far
    # as Spark's data-source lookup (proving we hand Spark the real format
    # call), not fail earlier in our code
    with pytest.raises(Exception, match="(?i)iceberg|data.?source|table"):
        read_pages_table(spark, "iceberg:web.pages").count()


@pytest.mark.skipif(
    not os.environ.get("ICEBERG_JAR"),
    reason="ICEBERG_JAR not set (sandbox ships no Iceberg runtime)",
)
def test_iceberg_roundtrip_and_ingest_filter(tmp_path):
    """VERDICT r5 #6: with a real Iceberg runtime on the classpath, write
    a pages table into a local hadoop catalog via writeTo().append(),
    read it back through read_pages_table, and run the ingest filter
    over it — the full production branch, not just source resolution."""
    import datetime

    from pyspark.sql import SparkSession

    from pears_fruit_fly_spark.sources.wet import ingest_filter

    warehouse = str(tmp_path / "icewh")
    spark = (
        SparkSession.builder.appName("iceberg-gate")
        .master("local[2]")
        .config("spark.jars", os.environ["ICEBERG_JAR"])
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .getOrCreate()
    )
    try:
        ts = datetime.datetime(2024, 1, 1)
        rows = [
            ("https://a.example/x", ts, None, "en " + "tok " * 400, "en"),
            ("https://b.example/y", ts, None, "short", "en"),
            ("https://c.example/z", ts, None, "de " + "tok " * 400, "de"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string"
        )
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.web")
        df.writeTo("local.web.pages").createOrReplace()
        back = read_pages_table(spark, "iceberg:local.web.pages")
        assert back.count() == 3
        kept = ingest_filter(back, lang="en").collect()
        assert [r["url"] for r in kept] == ["https://a.example/x"]
    finally:
        spark.stop()
