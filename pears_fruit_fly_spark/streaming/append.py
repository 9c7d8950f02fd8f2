"""Continuous ingest: Structured Streaming signature append.

The reference's incremental pod append is read-modify-write over pickles
(web_map/pod_starter/hash_pod.py:88-113). Here it becomes a streaming
pipeline: new page files land in a directory (prod: Iceberg snapshots /
Kafka), each micro-batch runs the SAME zero-shuffle featurize path and
appends to the signatures table — checkpointed, exactly-once per batch,
no read-modify-write anywhere.

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
    pages = spark.readStream.schema(PAGES_DDL).parquet(input_dir)

    def _per_batch(batch_df, batch_id: int) -> None:
        sigs = build_signatures(spark, batch_df, vocab, cfg, projection=projection)
        sigs.write.mode("append").parquet(output_dir)

    writer = (
        pages.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
