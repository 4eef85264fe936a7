"""Table-maintenance operators: compaction planning + snapshot CDC diff.

The operational side of running the extraction pipeline against a
10^12-document Iceberg table (north rule): continuous appends produce
small files that must be periodically rewritten into target-size bins
(Iceberg's rewrite_data_files / bin-pack strategy), and incremental
re-extraction needs the CHANGE SET between two table versions — insert/
update/delete per doc_id — so only changed documents re-enter the
pipeline. Reference analog: the repo re-runs the whole container per
job (docker/main.py) and overwrites blobs in place; at 10^12 docs both
maintenance tasks must be explicit, planned, and incremental.

Both operators are pure relational plans (windows + joins + integer
arithmetic only — no floats, no UDFs), so the DuckDB oracles are
arithmetic-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Compaction defaults: sized so the synthetic corpus (~300 B/doc, 500
# docs) yields several bins per partition at every SF; at production
# scale target_bytes is the table's write.target-file-size (512 MB).
COMPACT_N_PARTS = 8
COMPACT_TARGET_BYTES = 4096


def compaction_bins(
    docs: DataFrame,
    n_parts: int = COMPACT_N_PARTS,
    target_bytes: int = COMPACT_TARGET_BYTES,
) -> DataFrame:
    """Bin-packing compaction plan: group each partition's files into
    contiguous target-size rewrite bins (Iceberg rewrite_data_files
    bin-pack strategy, planned relationally).

    Each document stands in for one data file of size length(text)
    (coalesced to 0 for null text, as a zero-length file). Files are
    packed in doc_id order by START OFFSET within their partition's
    concatenated byte stream: bin = (running_sum - size) div target —
    a single-pass first-fit equivalent that both engines express as a
    window + integer division, with NO sequential driver loop.

    Scale shape: the only window is partitioned by the table partition
    key (here doc_id % n_parts, the hash-partition stand-in), so state
    is bounded per partition and the plan is one shuffle (the window's
    hash exchange) + one hash aggregate — compaction planning over a
    10^12-row manifest is embarrassingly parallel per partition. The
    output is the rewrite task list: one row per (partition, bin) with
    file count, byte total, and the contiguous doc_id range to rewrite.
    """
    f = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % F.lit(n_parts)).cast("long").alias("part"),
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("sz"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = f.select(
        "doc_id",
        "part",
        "sz",
        F.sum("sz").over(w).alias("cum"),
    ).select(
        "doc_id",
        "part",
        "sz",
        F.expr(f"(cum - sz) div {int(target_bytes)}").alias("bin"),
    )
    return (
        c.groupBy("part", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("sz").cast("long").alias("bin_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .select("part", "bin", "n_files", "bin_bytes", "min_doc", "max_doc")
    )


COMPACTION_BINS_SQL = f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % {COMPACT_N_PARTS} AS BIGINT) AS part,
         CAST(coalesce(length(text), 0) AS BIGINT) AS sz
  FROM documents
),
c AS (
  SELECT doc_id, part, sz,
         SUM(sz) OVER (PARTITION BY part ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM f
)
SELECT part, (cum - sz) // {COMPACT_TARGET_BYTES} AS bin,
       COUNT(*) AS n_files, SUM(sz) AS bin_bytes,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM c
GROUP BY part, (cum - sz) // {COMPACT_TARGET_BYTES}
"""


def _v1(docs: DataFrame) -> DataFrame:
    """Deterministic 'previous version' of the documents table: doc_id
    % 11 == 3 rows do not exist yet (inserts in v2), and doc_id % 7 ==
    2 rows carry a 10-char text prefix (updates in v2). Pure doc_id
    arithmetic so the DuckDB twin is identical (SNAPSHOT_DIFF_SQL)."""
    return docs.filter(F.col("doc_id") % 11 != 3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 7 == 2, F.substring("text", 1, 10)
        ).otherwise(F.col("text")).alias("text"),
    )


def _v2(docs: DataFrame) -> DataFrame:
    """Deterministic 'current version': doc_id % 13 == 5 rows were
    deleted; everything else carries the current text."""
    return docs.filter(F.col("doc_id") % 13 != 5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
    )


def snapshot_diff(docs: DataFrame) -> DataFrame:
    """CDC change set between two versions of the documents table:
    (doc_id, change_type in {insert, delete, update}, old_len, new_len)
    — the incremental-extraction driver at 10^12 docs: only doc_ids in
    this relation re-enter the pipeline (insert/update) or get their
    derived rows retired (delete); unchanged documents never move.

    The versions are derived deterministically from the corpus (_v1 /
    _v2) so the gate asserts all three change classes on real rows.
    Change detection is a single full-outer sort-merge join on doc_id
    (the snapshot key) with NULL-SAFE text comparison (`<=>` — a doc
    with null text in both versions is unchanged, not an update). One
    shuffle per side on the join key; at Iceberg scale the file-level
    manifest diff prunes unchanged files before this row-level join,
    leaving the same plan over the touched partitions only.
    """
    a = _v1(docs).select(
        F.col("doc_id").alias("id1"), F.col("text").alias("t1")
    )
    b = _v2(docs).select(
        F.col("doc_id").alias("id2"), F.col("text").alias("t2")
    )
    j = a.join(b, F.col("id1") == F.col("id2"), "full_outer")
    change = (
        F.when(F.col("id1").isNull(), F.lit("insert"))
        .when(F.col("id2").isNull(), F.lit("delete"))
        .when(~F.col("t1").eqNullSafe(F.col("t2")), F.lit("update"))
    )
    return (
        j.select(
            F.coalesce("id1", "id2").cast("long").alias("doc_id"),
            change.alias("change_type"),
            F.length("t1").cast("long").alias("old_len"),
            F.length("t2").cast("long").alias("new_len"),
        )
        .filter(F.col("change_type").isNotNull())
    )


SNAPSHOT_DIFF_SQL = """
WITH v1 AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN doc_id % 7 = 2 THEN substr(text, 1, 10) ELSE text END
           AS text
  FROM documents WHERE doc_id % 11 <> 3
),
v2 AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text
  FROM documents WHERE doc_id % 13 <> 5
),
j AS (
  SELECT v1.doc_id AS id1, v1.text AS t1, v2.doc_id AS id2, v2.text AS t2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT coalesce(id1, id2) AS doc_id,
       CASE WHEN id1 IS NULL THEN 'insert'
            WHEN id2 IS NULL THEN 'delete'
            WHEN t1 IS DISTINCT FROM t2 THEN 'update'
       END AS change_type,
       CAST(length(t1) AS BIGINT) AS old_len,
       CAST(length(t2) AS BIGINT) AS new_len
FROM j
WHERE (CASE WHEN id1 IS NULL THEN 'insert'
            WHEN id2 IS NULL THEN 'delete'
            WHEN t1 IS DISTINCT FROM t2 THEN 'update' END) IS NOT NULL
"""


def incremental_extract_ids(docs: DataFrame) -> DataFrame:
    """The change set reduced to the re-extraction WORK LIST: doc_ids
    whose documents must (re-)run extraction — inserts and updates,
    deletes excluded (their derived rows are retired, not recomputed).
    Composes snapshot_diff; the downstream job is a broadcast/bucketed
    semi-join of this id list against the document bytes, so the
    10^12-doc pipeline touches exactly the changed documents."""
    return (
        snapshot_diff(docs)
        .filter(F.col("change_type") != "delete")
        .select("doc_id", "change_type", "new_len")
    )


INCREMENTAL_EXTRACT_IDS_SQL = f"""
WITH d AS ({SNAPSHOT_DIFF_SQL.strip()})
SELECT doc_id, change_type, new_len FROM d WHERE change_type <> 'delete'
"""
