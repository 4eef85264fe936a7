"""Scan-parallelism floor for narrow relations feeding Python kernels.

Gate-scale inputs are single-row-group parquet files: Spark cannot split
them, so a scan arrives as 1-2 partitions and every Arrow kernel above
it runs on 1-2 cores of a 32-core session (measured at sf0.1: the
MinHash encoder spent 3.0 s on 2 tasks; spread, 0.4 s on 32). The fix is
the guide's "repartition immediately after the read" for unsplittable
inputs (§2.5), made SCALE-ADAPTIVE: when the plan already carries at
least the session's parallelism (any realistically sized input — at
100 TB a scan has thousands of row-group splits), no exchange is added
at all, so this never shuffles a production corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition `df` up to the session's parallelism when
    its plan has fewer partitions — a no-op (no exchange) otherwise.
    Use on NARROW relations (ids + text) before per-row kernels; the
    exchange moves only the rows the kernel reads anyway, once."""
    spark = df.sparkSession
    target = min_parts or max(8, spark.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
