"""Deterministic dense doc-id assignment at scale.

BM25 rank identity needs a total order on documents (ties broken by doc_id
asc — SURVEY.md §7 hard parts), so ids must be deterministic across runs and
cluster sizes. monotonically_increasing_id() is partition-layout-dependent —
unusable. A single-partition row_number() window is correct but serializes
10^12 rows through one task — unusable at scale.

This is the classic two-pass scheme instead (the DataFrame equivalent of
zipWithIndex):

  1. range-repartition by key + sort within partitions  → global key order
  2. job 1: count rows per physical partition (tiny driver collect)
  3. job 2: id = cumulative_offset[partition] + local position

Both passes are narrow after the one range-exchange; the driver handles only
P integers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_doc_ids(
    df: DataFrame, key: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Return (key, doc_id long) with doc_id = dense rank of key, 0-based.

    Requires key values unique (dedup first — sources.wet.dedup_latest).
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    keyed = (
        df.select(key)
        .repartitionByRange(n_part, F.col(key))
        .sortWithinPartitions(key)
    )

    counts_schema = StructType(
        [StructField("pid", LongType()), StructField("cnt", LongType())]
    )

    def _count(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        total = sum(len(p) for p in it)
        yield pd.DataFrame({"pid": [pid], "cnt": [total]})

    counts = {r["pid"]: r["cnt"] for r in keyed.mapInPandas(_count, counts_schema).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [StructField(key, df.schema[key].dataType), StructField("doc_id", LongType())]
    )

    def _assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = b_offsets.value.get(pid, 0)
        for pdf in it:
            n = len(pdf)
            out = pd.DataFrame({key: pdf[key].values, "doc_id": range(pos, pos + n)})
            pos += n
            yield out

    return keyed.mapInPandas(_assign, out_schema)
