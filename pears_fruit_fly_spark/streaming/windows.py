"""Structured Streaming operators beyond the append path: event-time
windowed aggregation with watermark (late-data handling) and a custom
stateful operator via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.11); these cover the streaming
surface a production ingest pipeline needs: crawl-rate rollups over event
time with bounded lateness, and per-key running state (e.g. per-host crawl
counters) that survives across micro-batches via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def start_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Tumbling event-time window counts with a watermark.

    Append output mode: a window row is emitted exactly once, when the
    watermark passes its end — i.e. late events within the watermark are
    incorporated, later ones dropped (the documented lateness contract).
    """
    events = spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("last_ts", LongType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("batch_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_counter(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running event counter — custom stateful logic the built-in
    aggs can't express (emits per-batch deltas alongside the running total).
    """
    (user_id,) = key
    if state.exists:
        n_prev, last_ts = state.get
    else:
        n_prev, last_ts = 0, 0
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts"].astype("int64").max()))
    state.update((n_prev + batch_n, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events_total": [n_prev + batch_n],
            "batch_events": [batch_n],
            "last_ts": [pd.Timestamp(last_ts)],
        }
    )


def start_stateful_user_counter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """applyInPandasWithState: per-user totals that persist across
    micro-batches and restarts (state lives in the checkpoint)."""
    events = spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
    updated = events.groupBy("user_id").applyInPandasWithState(
        _update_user_counter,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    writer = (
        updated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
