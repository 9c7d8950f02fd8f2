"""Continuous ingest: Structured Streaming signature append.

The reference's incremental pod append is read-modify-write over pickles
(web_map/pod_starter/hash_pod.py:88-113). Here it becomes a streaming
pipeline: new page files land in a directory (prod: Iceberg snapshots /
Kafka), each micro-batch runs the SAME zero-shuffle featurize path and
writes to the signatures table, no read-modify-write anywhere.

Delivery semantics (ADVICE r1): foreachBatch is at-least-once — a batch
that fails mid-write IS replayed. The write is therefore made idempotent:
output is partitioned by batch_id and each batch dynamically OVERWRITES its
own partition, so a replay replaces the partial partition instead of
duplicating rows (the plain-parquet equivalent of a transactional-table
MERGE; on Iceberg this would be a replace-partition commit).

Late/re-crawled urls are NOT resolved at append time; compaction runs
dedup-latest (sources/wet.py) on read or in a maintenance job — mirroring
SURVEY.md §2.11's warc_ts-latest semantics.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.vocab import Vocab
from pears_fruit_fly_spark.operators.signatures import build_signatures

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def start_signature_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    vocab: Vocab,
    cfg: FlyConfig,
    projection: np.ndarray | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream parquet page files → signatures parquet, checkpointed.

    available_now=True drains current files then stops (test/batch-catchup
    mode); False runs continuously.
    """
    from pyspark.sql import functions as F

    pages = spark.readStream.schema(PAGES_DDL).parquet(input_dir)

    def _per_batch(batch_df, batch_id: int) -> None:
        sigs = build_signatures(
            spark, batch_df, vocab, cfg, projection=projection
        ).withColumn("batch_id", F.lit(batch_id))
        # idempotent under foreachBatch replay: overwrite THIS batch's
        # partition only (per-write option, session conf untouched)
        (
            sigs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = (
        pages.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
