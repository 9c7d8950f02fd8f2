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
    """Driver-side pyarrow read (r4): the manifest is KB-sized — a Spark
    job (scan + distinct + collect) cost ~0.3-0.5 s of pure scheduling on
    EVERY build/append/resume for data that fits in one footer read. The
    `spark` arg stays for signature stability (tests monkeypatch here).
    Listing/reads resolve through plans/fsio, so non-local index trees
    (s3://, hdfs://) see the real manifest instead of an empty glob that
    silently re-encodes every bucket (ADVICE r4)."""
    from pears_fruit_fly_spark.plans import fsio

    path = manifest_path(index_dir)
    done: set[int] = set()
    for name in fsio.listdir(path):
        if not name.endswith(".parquet"):
            continue
        try:
            col = fsio.read_parquet_table(
                os.path.join(path, name), columns=["partition_key"]
            )
        except Exception:
            continue  # half-written file from a crashed appender: redo
        done.update(int(x) for x in col["partition_key"].to_pylist())
    return done


def append_manifest_rows(spark: SparkSession, index_dir: str, rows: list[dict]) -> None:
    """Driver-side pyarrow append (r4, same rationale as
    completed_partitions): appending = adding one uniquely-named parquet
    file to the manifest dir — exactly what Spark's append mode did,
    minus the job. Readers (spark.read.parquet in read_manifest, the
    pyarrow loop above) see the union of files either way."""
    if not rows:
        return
    import uuid

    import pyarrow as pa

    from pears_fruit_fly_spark.plans import fsio

    pdf = pd.DataFrame(rows, columns=MANIFEST_COLUMNS)
    path = manifest_path(index_dir)
    fsio.makedirs(path)
    fsio.write_parquet_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(path, f"part-{uuid.uuid4().hex}.parquet"),
    )


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
    from pears_fruit_fly_spark.plans import fsio

    live = cl.resolve(index_dir)
    fsio.makedirs(live)
    fsio.write_text(
        os.path.join(live, "_build_info.json"),
        json.dumps(info, indent=2, sort_keys=True),
    )


def bump_build_id(index_dir: str) -> None:
    """Regenerate build_id after a file-level rewrite that leaves logical
    content unchanged (compaction): cached DataFrames reference the replaced
    parquet files and must be evicted."""
    import uuid

    from pears_fruit_fly_spark.plans import commitlog as cl
    from pears_fruit_fly_spark.plans import fsio

    live = cl.resolve(index_dir)
    info = read_build_info(live)
    info["build_id"] = uuid.uuid4().hex
    fsio.write_text(
        os.path.join(live, "_build_info.json"),
        json.dumps(info, indent=2, sort_keys=True),
    )


def read_build_info(index_dir: str) -> dict:
    from pears_fruit_fly_spark.plans import commitlog as cl
    from pears_fruit_fly_spark.plans import fsio

    return json.loads(
        fsio.read_text(
            os.path.join(cl.resolve(index_dir), "_build_info.json")
        )
    )
