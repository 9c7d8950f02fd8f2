"""Checkpoint manifest: per-partition lineage + metrics, exact resume.

north_rule requirement: every build partition emits (partition_key, rows_in,
rows_out, bytes_out, wall_ms, input_fingerprint, attempt) to a manifest
table; resume anti-joins completed partitions so an interrupted build redoes
only pending work and the final output is byte-identical to an uninterrupted
run (tested in tests/test_postings.py::test_resume).

With Iceberg in production the input_fingerprint is the snapshot id; on plain
parquet here it is a content-count fingerprint of the partition's input.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_COLUMNS = [
    "partition_key",   # e.g. term bucket id
    "rows_in",
    "rows_out",
    "bytes_out",
    "wall_ms",
    "input_fingerprint",
    "attempt",
    "finished_at",
]


def manifest_path(index_dir: str) -> str:
    from pears_fruit_fly_spark.plans import commitlog as cl

    return os.path.join(cl.resolve(index_dir), "_manifest")


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame | None:
    path = manifest_path(index_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_partitions(spark: SparkSession, index_dir: str) -> set[int]:
    m = read_manifest(spark, index_dir)
    if m is None:
        return set()
    return {int(r["partition_key"]) for r in m.select("partition_key").distinct().collect()}


def append_manifest_rows(spark: SparkSession, index_dir: str, rows: list[dict]) -> None:
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=MANIFEST_COLUMNS)
    spark.createDataFrame(pdf).write.mode("append").parquet(manifest_path(index_dir))


def manifest_row(
    partition_key: int,
    rows_in: int,
    rows_out: int,
    bytes_out: int,
    wall_ms: float,
    input_fingerprint: str,
    attempt: int = 1,
) -> dict:
    return {
        "partition_key": partition_key,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "bytes_out": bytes_out,
        "wall_ms": float(wall_ms),
        "input_fingerprint": input_fingerprint,
        "attempt": attempt,
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def write_build_info(index_dir: str, info: dict) -> None:
    import uuid

    # build_id: content-independent token regenerated on every write; the
    # query-side index cache keys on it instead of file mtimes, so rebuilds
    # landing within filesystem timestamp granularity (or from another
    # process) still evict stale handles (ADVICE r2).
    info.setdefault("build_id", uuid.uuid4().hex)
    from pears_fruit_fly_spark.plans import commitlog as cl

    live = cl.resolve(index_dir)
    os.makedirs(live, exist_ok=True)
    with open(os.path.join(live, "_build_info.json"), "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)


def bump_build_id(index_dir: str) -> None:
    """Regenerate build_id after a file-level rewrite that leaves logical
    content unchanged (compaction): cached DataFrames reference the replaced
    parquet files and must be evicted."""
    import uuid

    from pears_fruit_fly_spark.plans import commitlog as cl

    live = cl.resolve(index_dir)
    info = read_build_info(live)
    info["build_id"] = uuid.uuid4().hex
    with open(os.path.join(live, "_build_info.json"), "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)


def read_build_info(index_dir: str) -> dict:
    from pears_fruit_fly_spark.plans import commitlog as cl

    with open(os.path.join(cl.resolve(index_dir), "_build_info.json")) as f:
        return json.load(f)
