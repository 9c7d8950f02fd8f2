"""Deterministic sequence packing for LLM training pipelines.

Training consumes fixed-size token windows; feeding one short web doc per
window wastes most of it, so pipelines PACK documents into token-budget
bins (sequences) ahead of tokenizer sharding. The packing must be
deterministic (reproducible shards, exact resume) and distributed without
a global sequential scan.

Two-level next-fit, both levels deterministic:

* Level 1 — ranges: ``range_id = doc_id // range_width``. Ranges pack
  INDEPENDENTLY (bins never span ranges), so the whole job is one shuffle
  on range_id and each range is one task — at 10^12 docs pick range_width
  so a range's (id, n_tokens) pairs fit a task (the packing state is two
  int64 arrays, ~16 MB per million docs).
* Level 2 — next-fit within the range, docs in doc_id order: a bin takes
  the maximal run of docs whose token sum stays <= budget; a doc longer
  than the budget occupies its own (oversized) bin. Next-fit (not
  first-fit/best-fit) is chosen deliberately: its decisions depend only on
  the PREFIX, so the result is stable under appends of higher doc ids and
  is exactly reproducible by a sequential oracle (DuckDB recursive CTE).

Returns (doc_id, range_id, bin_in_range, n_tokens); (range_id,
bin_in_range) is the globally unique bin key. The per-range kernel is
O(bins log docs) NumPy (searchsorted jumps over the cumulative sum), not a
per-doc Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    range_width: int = 1 << 20,
) -> DataFrame:
    """Assign every doc to a (range_id, bin_in_range) training-sequence bin
    (module doc for semantics). budget and range_width must be positive."""
    if budget <= 0 or range_width <= 0:
        raise ValueError("budget and range_width must be positive")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        dl = pdf[len_col].to_numpy(np.int64)
        if dl.size and int(dl.min()) < 0:
            # a negative length breaks cumsum monotonicity and searchsorted
            # would return garbage bins silently (review finding — e.g.
            # F.size(NULL) = -1 in non-ANSI Spark)
            raise ValueError(
                f"pack_sequences: negative {len_col} (min {int(dl.min())}) — "
                "coalesce null token counts to 0 upstream"
            )
        cum = np.cumsum(dl)
        bins = np.zeros(dl.size, np.int64)
        b, i = 0, 0
        start_cum = 0
        while i < dl.size:
            # maximal j with cum[j-1] - start_cum <= budget; an oversized
            # doc forces j = i + 1 (its own bin)
            j = int(np.searchsorted(cum, start_cum + budget, side="right"))
            j = max(j, i + 1)
            bins[i:j] = b
            b += 1
            start_cum = int(cum[j - 1])
            i = j
        return pd.DataFrame({
            "doc_id": pdf[id_col].to_numpy(np.int64),
            "range_id": pdf["range_id"].to_numpy(np.int64),
            "bin_in_range": bins,
            "n_tokens": dl,
        })

    ranged = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(len_col).cast("long").alias(len_col),
        # exact integer FLOOR division ((x - pmod(x, w)) div w — pmod is
        # always non-negative, so the quotient floors like Python/DuckDB
        # `//`): plain `div` truncates toward zero and double `/` + cast
        # both diverge for negative ids, and doubles lose exactness past
        # 2^53 (review finding)
        F.expr(
            f"CAST((CAST({id_col} AS BIGINT) - pmod(CAST({id_col} AS BIGINT),"
            f" {int(range_width)})) div {int(range_width)} AS BIGINT)"
        ).alias("range_id"),
    )
    return ranged.groupBy("range_id").applyInPandas(
        _pack, "doc_id long, range_id long, bin_in_range long, n_tokens long"
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row efficiency summary: bins, docs, tokens, fill ratio (packed
    tokens / bin capacity), oversized-bin count."""
    per_bin = packed.groupBy("range_id", "bin_in_range").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("docs")
    )
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("docs").cast("long").alias("n_docs"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.round(
            F.sum("fill") / (F.count("*") * F.lit(float(budget))), 4
        ).alias("fill_ratio"),
        F.sum((F.col("fill") > budget).cast("long")).alias("oversized_bins"),
    )
