"""Continuous indexing: Structured Streaming → incremental index segments.

The full streaming analog of the reference's "crawl more pages, grow the
pod" loop (web_map/pod_starter/hash_pod.py:88-113), but against the real
inverted index: each micro-batch of new pages becomes one append segment
(postings.append_postings) plus its signature partition and docmap rows,
queryable immediately via the merged-on-read view. merge_segments runs as a
separate maintenance job (the LSM compaction).

Delivery semantics: foreachBatch is at-least-once; SearchEngine.append is
IDEMPOTENT under replay — urls already in the docmap are skipped entirely,
a half-built segment resumes by fingerprint, and the signature write
overwrites its own seg partition — so a replayed batch converges to exactly
the same on-disk state (tested).

Requires the engine's base index to exist (call SearchEngine.index on the
seed corpus first): segments inherit the base layout parameters.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pears_fruit_fly_spark.api import SearchEngine
from pears_fruit_fly_spark.streaming.append import PAGES_DDL


def start_index_append_stream(
    spark: SparkSession,
    input_dir: str,
    engine: SearchEngine,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream parquet page files → index segments on a built SearchEngine.

    available_now=True drains current files then stops (test/batch-catchup
    mode); False runs continuously.
    """
    pages = spark.readStream.schema(PAGES_DDL).parquet(input_dir)

    def _per_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.append(batch_df)

    writer = (
        pages.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
