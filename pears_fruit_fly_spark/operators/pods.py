"""Pods: topic-keyed partitions of the signature index.

The reference groups its hash index into per-label 'pods' — one pickled
matrix per topic, appended by unpickle+vstack (web_map/pod_starter/
hash_pod.py:84-119; grouped build fruit_fly/hash_with_best_proj.py:44-86).
Here a pod is simply a partition column on the signatures table:

  * build: one zero-shuffle featurize pass; write partitionBy("pod")
  * append: Iceberg/parquet append — a metadata operation, no read-modify-write
  * query: Hamming top-k restricted to a pod = partition-pruned scan

which turns the reference's O(pod-size) re-pickling into O(new-rows) appends.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.vocab import Vocab
from pears_fruit_fly_spark.operators.signatures import build_signatures, hamming_topk


def build_pod_signatures(
    spark: SparkSession,
    pages: DataFrame,
    vocab: Vocab,
    cfg: FlyConfig,
    pod_dir: str,
    pod_col: str = "pod",
    projection: np.ndarray | None = None,
) -> None:
    """pages(url, text, <pod_col>) → signatures parquet partitioned by pod."""
    sigs = build_signatures(spark, pages, vocab, cfg, projection=projection)
    with_pod = sigs.join(pages.select("url", pod_col), "url")
    with_pod.write.mode("overwrite").partitionBy(pod_col).parquet(pod_dir)


def append_pod_signatures(
    spark: SparkSession,
    new_pages: DataFrame,
    vocab: Vocab,
    cfg: FlyConfig,
    pod_dir: str,
    pod_col: str = "pod",
    projection: np.ndarray | None = None,
) -> None:
    """Incremental pod append — the Spark-native replacement for the
    reference's unpickle+vstack merge (hash_pod.py:88-113)."""
    sigs = build_signatures(spark, new_pages, vocab, cfg, projection=projection)
    with_pod = sigs.join(new_pages.select("url", pod_col), "url")
    with_pod.write.mode("append").partitionBy(pod_col).parquet(pod_dir)


def read_pods(spark: SparkSession, pod_dir: str) -> DataFrame:
    return spark.read.parquet(pod_dir)


def pod_hamming_topk(
    spark: SparkSession,
    pod_dir: str,
    query_sig: np.ndarray,
    k: int = 10,
    pods: list[str] | None = None,
    pod_col: str = "pod",
) -> DataFrame:
    """Hamming top-k over selected pods only. The pod filter is a partition
    filter on the parquet scan (directory pruning — only the requested topic
    partitions are read), mirroring the reference's 'load only the relevant
    pod pickle' behavior as a pure plan property."""
    sigs = read_pods(spark, pod_dir)
    if pods is not None:
        sigs = sigs.filter(F.col(pod_col).isin(pods))
    return hamming_topk(sigs, query_sig, k)


def pod_stats(spark: SparkSession, pod_dir: str, pod_col: str = "pod") -> DataFrame:
    """Per-pod doc counts + mean signature popcount (observability; the
    reference prints pod sizes at append time)."""
    sigs = read_pods(spark, pod_dir)
    popcount = F.aggregate(
        F.transform(F.col("sig"), lambda w: F.bit_count(w)),
        F.lit(0),
        lambda a, x: a + x,
    )
    return (
        sigs.withColumn("_pc", popcount)
        .groupBy(pod_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("_pc"), 3).alias("avg_bits_set"),
        )
    )


def pod_keyword_stats(
    spark: SparkSession, pod_dir: str, top_n: int = 5, pod_col: str = "pod"
) -> DataFrame:
    """Top-N keyword term-ids per pod (ref: apply_umap_fly.py:144-153 —
    Counter(keywords).most_common(5) per cluster): explode the keywords
    column, count per (pod, keyword), ranking window top-N."""
    from pyspark.sql.window import Window

    sigs = read_pods(spark, pod_dir)
    counts = (
        sigs.select(pod_col, F.explode("keywords").alias("kw"))
        .groupBy(pod_col, "kw")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(pod_col).orderBy(F.desc("cnt"), F.asc("kw"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def kc_usage(signatures: DataFrame, kc_size: int) -> DataFrame:
    """KC usage statistics (ref: web_map/umap/fly_utils.py:56-68): how often
    each Kenyon cell fires across the corpus. (kc_id, n_used), sorted desc.

    Pure Spark: explode bit positions of the packed words — one narrow pass
    + one small agg keyed by kc_id (<= kc_size rows)."""
    # SQL `>>` accepts a column shift amount (the Python F.shiftright wrapper
    # does not), so the bit unpack stays a codegen expression.
    exploded = signatures.select(
        F.posexplode("sig").alias("word_idx", "word")
    ).select(
        F.explode(
            F.expr(
                "filter(transform(sequence(0, 63), "
                "i -> CASE WHEN ((word >> i) & 1) = 1 "
                "THEN word_idx * 64 + i END), x -> x IS NOT NULL)"
            )
        ).alias("kc_id")
    )
    return (
        exploded.filter(F.col("kc_id") < kc_size)
        .groupBy("kc_id")
        .agg(F.count("*").alias("n_used"))
        .orderBy(F.desc("n_used"), F.asc("kc_id"))
    )
