"""SparkSession factory with the engine's standard tuning.

Settings are chosen for the 100 TB design point but parameterized so tests run
on local[4] and the bench harness can pin local[8] vs local[32] for the
two-cluster-size scaling evidence (BASELINE.json north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One BLAS thread per task: Spark already runs one task per core, so
# multi-threaded NumPy inside pandas UDF workers oversubscribes the box
# (32 tasks x N BLAS threads). Set before the JVM forks python workers.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def get_spark(
    app_name: str = "pears-fruit-fly-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on: post-shuffle coalesce + skew-join splitting are load-bearing at
      scale (Zipf head terms, see plans/salt.py for the explicit handling).
    - Arrow on with 512-row batches: same vectorized-batch idea as the
      reference's 2000-doc matrix chunks (ref: fruit_fly/hash.py:121,136);
      512 measured faster under full-core occupancy here (smaller per-batch
      arrays -> less memory churn), identical results either way.
    - shuffle partitions default to 2x cores locally; on a real cluster this
      is set to ~2-3x total executor cores via spark-submit conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Driver-side file listing up to 256 dirs (default 32): the index
        # keeps P=64-4096 term_bucket directories, and the default made
        # EVERY staging/postings open schedule a "listing leaf files" Spark
        # job (~0.3-0.6 s of pure scheduling for 64 local dirs). 256 keeps
        # moderate trees on the driver; bigger-P production trees still get
        # the distributed listing. Override via SPARK_GRAFT_LIST_THRESHOLD.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "256"),
        )
    )
    # Shuffle/spill to tmpfs when available: this sandbox's disk does
    # ~650 MB/s shared across all tasks, which flatlines shuffle-heavy
    # stages; real clusters provision NVMe per executor. Override with
    # SPARK_LOCAL_DIRS / spark.local.dir for disk-backed runs.
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm_dir = "/dev/shm/spark-local"
        os.makedirs(shm_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", shm_dir)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        # 2x parallelism: good default for local; cluster jobs override.
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", str(os.cpu_count())))
        except Exception:
            n = os.cpu_count() or 8
        builder = builder.config("spark.sql.shuffle.partitions", str(max(8, 2 * n)))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Fork one reusable Python worker per core and import the numeric
    stack in each, once per session (skip with SPARK_GRAFT_NO_WARMUP=1).

    Local-mode sessions pay ~2-3 s of interpreter spin-up + numpy/pandas/
    pyarrow imports in EVERY worker the first time a Python stage touches
    it — a cluster amortizes this across the application lifetime (and
    bench.py's own warm-up comment documents exactly that intent, but a
    .limit() warm-up plans one partition and therefore warms ONE worker;
    the other cores' workers then cold-start inside the first timed
    stage). spark.python.worker.reuse (default true) keeps these workers
    pooled for all later pandas/Arrow stages."""
    if os.environ.get("SPARK_GRAFT_NO_WARMUP") == "1":
        return
    if getattr(spark, "_pears_workers_warm", False):
        return

    def _imp(_i: int) -> int:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        return 0

    try:
        n = 2 * (spark.sparkContext.defaultParallelism or 1)
        spark.sparkContext.parallelize(range(n), n).map(_imp).count()
        spark._pears_workers_warm = True
    except Exception:
        pass  # warm-up is best-effort; never block session creation
