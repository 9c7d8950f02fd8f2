"""tokens_long_jvm must be row-identical to the Python tokens_long path."""

from __future__ import annotations

from pears_fruit_fly_spark.operators.docids import assign_doc_ids
from pears_fruit_fly_spark.operators.postings import tokens_long, tokens_long_jvm
from pears_fruit_fly_spark.sources.wet import dedup_latest


def test_jvm_tokens_identical_to_python(spark, pages_df, vocab):
    clean = dedup_latest(pages_df)
    pages_ids = clean.join(assign_doc_ids(clean, "url"), "url")
    py = {
        (r["doc_id"], r["term_id"]): (r["tf"], r["dl"])
        for r in tokens_long(pages_ids, vocab).collect()
    }
    jvm = {
        (r["doc_id"], r["term_id"]): (r["tf"], r["dl"])
        for r in tokens_long_jvm(pages_ids, vocab).collect()
    }
    assert py == jvm


def test_jvm_tokens_edge_cases(spark, vocab):
    rows = [
        (0, ""),                     # empty text
        (1, "   "),                  # spaces only
        (2, "t0\nt1 t0\n\nt2"),      # newlines as separators
        (3, "zzz_oov t0 zzz_oov"),   # OOV dropped but dl counts in-vocab only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    py = {(r["doc_id"], r["term_id"]): (r["tf"], r["dl"])
          for r in tokens_long(df, vocab).collect()}
    jvm = {(r["doc_id"], r["term_id"]): (r["tf"], r["dl"])
           for r in tokens_long_jvm(df, vocab).collect()}
    assert py == jvm
    assert all(k[0] in (2, 3) for k in jvm)  # docs 0,1 produce no rows
