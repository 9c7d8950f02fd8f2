"""Skew plan for Zipf head terms (SURVEY.md §4.2 custom item 1).

At 10^12 docs a stopword's posting list has ~10^11 entries — no single task
can sort or encode it. The build therefore splits any term whose df exceeds
a threshold into n_subparts sub-partitions, salting by doc_id so each
sub-list stays doc-id-sorted and globally disjoint ranges are NOT required:
the query-side reader treats (term, salt) sub-lists as independent posting
runs and merges block streams (cheap: block metadata is sorted by first_doc).

The plan itself is tiny — only head terms appear in it — so it broadcasts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_salt_plan(
    term_stats: DataFrame,
    skew_df_threshold: int,
    max_docs_per_subpartition: int,
) -> DataFrame:
    """term_stats(term_id, df, ...) → (term_id, n_salts int) for skewed terms.

    n_salts = ceil(df / max_docs_per_subpartition), capped at 1024.
    """
    return (
        term_stats.filter(F.col("df") > skew_df_threshold)
        .select(
            "term_id",
            F.least(
                F.lit(1024),
                F.ceil(F.col("df") / F.lit(float(max_docs_per_subpartition))),
            )
            .cast("int")
            .alias("n_salts"),
        )
    )


def n_salts_for_df(df: int, max_docs_per_subpartition: int) -> int:
    return min(1024, max(1, math.ceil(df / max_docs_per_subpartition)))
