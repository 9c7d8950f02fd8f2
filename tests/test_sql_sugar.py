"""SQL sugar: ORDER BY bm25(...) DESC LIMIT k -> WAND plan
(plans/sql_sugar.py, SURVEY.md §4.2 stretch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
from pears_fruit_fly_spark.operators.docids import assign_doc_ids
from pears_fruit_fly_spark.operators.postings import build_postings
from pears_fruit_fly_spark.plans.sql_sugar import Bm25Sql
from pears_fruit_fly_spark.sources.wet import dedup_latest


@pytest.fixture(scope="module")
def sugar(spark, pages_df, vocab, tmp_path_factory):
    clean = dedup_latest(pages_df)
    ids = clean.join(assign_doc_ids(clean, "url"), "url")
    d = str(tmp_path_factory.mktemp("sqlidx") / "idx")
    build_postings(spark, ids, vocab, d,
                   cfg=PostingsConfig(num_partitions=4))
    ids.createOrReplaceTempView("sql_docs")
    s = Bm25Sql(spark)
    s.register_index("web", d, vocab)
    return s, d


def test_bm25_sql_matches_wand(spark, vocab, sugar):
    s, d = sugar
    got = s.sql(
        "SELECT url, doc_id, bm25(web, 't1 t2') AS score FROM sql_docs "
        "ORDER BY bm25(web, 't1 t2') DESC LIMIT 5"
    ).collect()
    want = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_wand(spark, d, "t1 t2", vocab, k=5).collect()
    }
    assert len(got) == 5
    assert [r["doc_id"] for r in got] == sorted(
        want, key=lambda i: (-want[i], i)
    )
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]])
        assert r["url"]  # projection columns came from the table side


def test_non_bm25_sql_passes_through(spark, sugar):
    s, _ = sugar
    n = s.sql("SELECT count(*) AS n FROM sql_docs").collect()[0]["n"]
    assert n == spark.table("sql_docs").count()


def test_bm25_sql_rejects_bad_shapes(sugar):
    s, _ = sugar
    with pytest.raises(ValueError, match="ASC"):
        s.sql("SELECT doc_id FROM sql_docs "
              "ORDER BY bm25(web, 't1') ASC LIMIT 5")
    with pytest.raises(ValueError, match="unknown bm25 index"):
        s.sql("SELECT doc_id FROM sql_docs "
              "ORDER BY bm25(nope, 't1') DESC LIMIT 5")
    with pytest.raises(ValueError, match="only supported"):
        s.sql("SELECT bm25(web, 't1') FROM sql_docs")
    with pytest.raises(ValueError, match="same"):
        s.sql("SELECT bm25(web, 'other') AS sc FROM sql_docs "
              "ORDER BY bm25(web, 't1') DESC LIMIT 5")


def test_bm25_sql_rejects_clause_between_from_and_order_by(sugar):
    """A WHERE/JOIN/GROUP BY between FROM <table> and ORDER BY bm25(...)
    must fail loud, not be silently dropped by the rewrite (ADVICE r4)."""
    s, _ = sugar
    with pytest.raises(ValueError, match="between FROM and ORDER BY"):
        s.sql("SELECT url FROM sql_docs WHERE url LIKE 'a%' "
              "ORDER BY bm25(web, 't1') DESC LIMIT 5")
    with pytest.raises(ValueError, match="between FROM and ORDER BY"):
        s.sql("SELECT url FROM sql_docs GROUP BY url "
              "ORDER BY bm25(web, 't1') DESC LIMIT 5")
