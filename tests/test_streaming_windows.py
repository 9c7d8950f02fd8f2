"""Streaming windowed agg (watermark semantics) + stateful counter tests."""

from __future__ import annotations

import datetime as dt

import pytest

from pears_fruit_fly_spark.streaming.windows import (
    start_stateful_user_counter,
    start_windowed_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def test_windowed_counts_with_watermark(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / p) for p in ("in", "out", "ck"))
    batch1 = [
        (1, T0 + dt.timedelta(minutes=5), 1, "view", 1.0),
        (2, T0 + dt.timedelta(minutes=20), 1, "view", 1.0),
        (3, T0 + dt.timedelta(minutes=61), 2, "click", 2.0),
    ]
    _events(spark, batch1).write.mode("append").parquet(inp)
    q = start_windowed_counts(spark, inp, outp, ckpt, window="1 hour",
                              watermark="30 minutes")
    q.awaitTermination(120)
    # nothing finalized yet (watermark has not passed any window end)
    try:
        n1 = spark.read.parquet(outp).count()
    except Exception:
        n1 = 0
    assert n1 == 0

    # batch 2 pushes the watermark past hour-0's end -> hour-0 emitted once
    batch2 = [(4, T0 + dt.timedelta(hours=3), 2, "click", 1.0)]
    _events(spark, batch2).write.mode("append").parquet(inp)
    q2 = start_windowed_counts(spark, inp, outp, ckpt, window="1 hour",
                               watermark="30 minutes")
    q2.awaitTermination(120)
    rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(outp).collect()
    }
    assert rows[(T0, "view")] == (2, 2.0)
    assert (T0 + dt.timedelta(hours=1), "click") in rows


def test_stateful_user_counter_across_batches(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / p) for p in ("in2", "out2", "ck2"))
    _events(spark, [
        (1, T0, 7, "view", 1.0),
        (2, T0 + dt.timedelta(seconds=10), 7, "view", 1.0),
        (3, T0, 8, "click", 1.0),
    ]).write.mode("append").parquet(inp)
    q = start_stateful_user_counter(spark, inp, outp, ckpt)
    q.awaitTermination(120)
    first = {r["user_id"]: r["n_events_total"] for r in spark.read.parquet(outp).collect()}
    assert first == {7: 2, 8: 1}

    # second run: state restored from checkpoint, totals accumulate
    _events(spark, [(4, T0 + dt.timedelta(minutes=1), 7, "view", 1.0)]).write.mode(
        "append"
    ).parquet(inp)
    q2 = start_stateful_user_counter(spark, inp, outp, ckpt)
    q2.awaitTermination(120)
    rows = spark.read.parquet(outp).collect()
    totals = {}
    for r in rows:
        totals[r["user_id"]] = max(totals.get(r["user_id"], 0), r["n_events_total"])
    assert totals[7] == 3  # 2 from batch 1 + 1 from batch 2, via state
    deltas = [r["batch_events"] for r in rows if r["user_id"] == 7]
    assert sorted(deltas) == [1, 2]
