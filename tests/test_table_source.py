"""Pages-table adapter (sources/table.py): the BASELINE.json input shape."""

from __future__ import annotations

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
