"""Co-located (bucketed) joins — the SCALE.md shuffle-elimination layout.

At 100 TB the dominant cost of every doc_id-keyed join (spans x chunks,
resume anti-join, retrieval hit x content) is the shuffle of both sides.
The lakehouse answer is a bucketed/storage-partitioned layout: write
each table hash-bucketed by the join key ONCE, and every subsequent
equi-join on that key reads bucket i against bucket i with ZERO
Exchange — the shuffle is paid at write time, amortized over every
downstream join. The production target is Iceberg's storage-partitioned
joins (sources/tables.py documents the catalog gap in this sandbox);
Spark's native bucketed tables express the identical plan shape through
the session catalog, so the layout and its plan guarantee are REAL and
test-pinned here, not deferred with the Iceberg jar.

Reference analog: the doc_id-keyed join of extracted pages back to
documents (/root/reference/docker/main.py:318-344 merges per-page
results per source file); the reference does it in-process per doc, a
cluster does it as a co-located join.

Usage shape (and what the test pins):
    write_bucketed(spans, "spans_b", "doc_id", buckets=16)
    write_bucketed(docs, "docs_b", "doc_id", buckets=16)
    joined = bucketed_join(spark, "spans_b", "docs_b", "doc_id")
    # physical plan: SortMergeJoin over two bucketed FileScans,
    # NO Exchange on either side
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist df into the session catalog hash-bucketed (and sorted)
    by `key`. Every future equi-join between tables sharing (key,
    buckets) is co-located. Bucket count is a LAYOUT contract: pick it
    once per key domain (power of two, sized so a bucket of the largest
    table fits an executor core's working set) and reuse it everywhere —
    mismatched counts put an Exchange right back."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    if mode == "overwrite":
        # a managed-table LOCATION can outlive its catalog entry (the
        # in-memory catalog forgets tables across sessions; the
        # warehouse files don't disappear) — clear both or saveAsTable
        # refuses with LOCATION_ALREADY_EXISTS.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if wh:
            shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key.
    With matching bucket specs Catalyst plans bucket-i-vs-bucket-i reads
    and elides BOTH shuffles (and with sortBy metadata, usually both
    sorts). The plan assertion lives in tests/test_bucketed.py — a
    silent layout regression (e.g. someone rewrites one side unbucketed)
    shows up as an Exchange, not as a slow mystery at scale."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
