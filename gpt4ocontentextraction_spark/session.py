"""SparkSession factory with the engine's tuned defaults.

Scale posture: these configs are what we would ship to a 1000-executor
cluster (AQE on, skew join on, Arrow on, shuffle partitions sized
explicitly); in the sandbox they run on local[N] where N is the
parallelism under test (BASELINE.md two-level scaling measurement).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_package_path() -> None:
    """Make this package importable in Spark's Python workers.

    Local mode forks workers from the driver JVM's environment; on a real
    cluster the same job ships the package via ``spark-submit --py-files``
    (see bench.py / README). Without this, any driver not launched from the
    repo root fails in the worker with ModuleNotFoundError.
    """
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{current}" if current else pkg_parent
        )


def get_spark(
    app_name: str = "gpt4ocontentextraction_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    task_retries: int = 1,
) -> SparkSession:
    """task_retries > 1 enables task re-execution in local mode
    (local[N, R]); the cluster analog is spark.task.maxFailures — the
    engine's replacement for the reference's tenacity retry loops
    (doc2md_utils.py:180, docker/main.py:289-319): extraction is
    deterministic + idempotent, so retries are safe at the task level."""
    _export_package_path()
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    master = (
        f"local[{cores}]" if task_retries <= 1 else f"local[{cores}, {task_retries}]"
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # The engine's bounded global windows (top-k cumulative sums, block-
    # total prefix sums — see tests/test_plans.py's window sweep, which
    # pins every unpartitioned WindowExec input to k/blocked rows by
    # construction) each emit a "No Partition Defined ... may cause
    # serious performance degradation" WARN; across a 68-query bench
    # tail that flood drowns real signal (VERDICT r5 #7). Raise just
    # that operator's logger to ERROR — the plan-pin test remains the
    # actual guard against a corpus-scale unpartitioned window.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.log4j.LogManager.getLogger(
            "org.apache.spark.sql.execution.window.WindowExec"
        ).setLevel(jvm.org.apache.log4j.Level.ERROR)
    except Exception:
        pass  # logging backend unavailable/renamed: cosmetic only
    return spark
