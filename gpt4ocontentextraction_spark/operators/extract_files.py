"""File-granular extraction job: the 100-TB execution shape.

The composable operator (operators/extract.py) flows data through the
JVM: scan -> Arrow -> kernel -> Arrow -> sink. For a pure extraction pass
over an immutable table that double conversion is avoidable: this operator
distributes FILE PATHS, and each task reads its parquet file with pyarrow,
runs the same `_extract_batch` kernel, and writes the output file directly
— Spark provides scheduling, retries and locality; bytes never cross the
JVM boundary (only paths and per-file metrics do). This is the pattern
native-engine vendors use to push whole stages out of the JVM, expressed
with plain mapInArrow over a paths DataFrame.

The composable counterpart is ``sources/pyscan.py``: a Spark 4 Python
Data Source whose fused scan+extract output feeds downstream DataFrame
operators through Catalyst (this module terminates in files; that one
returns a DataFrame).

Fault tolerance — the CORRECTNESS mechanism is the snapshot manifest, not
rename: callers route visibility through :func:`run_file_extraction`,
which writes into an uncommitted SnapshotTable commit dir and publishes
the manifest only after every file reports back, so a crashed or torn run
is never visible to readers (object-store safe: no rename in the commit
path). Within the uncommitted dir, each task attempt additionally writes
to a unique ``.inprogress-*`` temp and renames into place — POSIX-only
hygiene that stops two racing attempts of the same task from interleaving
bytes into one file; on object stores (where PUT is already atomic per
object) the rename degrades to copy+delete but correctness never depended
on it.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

METRICS_DDL = (
    "path string, n_docs long, n_spans_out long,"
    " n_tables_built long, n_media_emitted long"
)


def extract_parquet_files(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    batch_rows: int = 8192,
) -> DataFrame:
    """Extract every parquet file under input_dir into output_dir
    (same file names). Returns per-file lineage metrics; the caller
    commits via SnapshotTable after collecting them."""
    files = sorted(
        f for f in os.listdir(input_dir) if f.endswith(".parquet")
    )
    os.makedirs(output_dir, exist_ok=True)
    paths = spark.createDataFrame(
        [(f,) for f in files], "name string"
    ).repartition(max(len(files), 1))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from gpt4ocontentextraction_spark.operators.extract import (
            _OUT_SCHEMA,
            _extract_batch,
        )

        for b in batches:
            for name in b.column("name").to_pylist():
                src = os.path.join(input_dir, name)
                dst = os.path.join(output_dir, name)
                tmp = f"{dst}.inprogress-{uuid.uuid4().hex}"
                table = pq.read_table(src)
                out_batches = [
                    _extract_batch(x)
                    for x in table.to_batches(max_chunksize=batch_rows)
                ]
                out = pa.Table.from_batches(out_batches, schema=_OUT_SCHEMA)
                pq.write_table(out, tmp)
                os.rename(tmp, dst)  # attempt-race hygiene only (see module doc)
                kinds = [
                    x.column("spans").flatten().field("kind")
                    for x in out_batches
                ]
                n_spans = sum(len(k) for k in kinds)
                n_tables = sum(
                    pc.sum(pc.equal(k, "table")).as_py() or 0 for k in kinds
                )
                n_media = sum(
                    pc.sum(pc.equal(k, "media")).as_py() or 0 for k in kinds
                )
                yield pa.RecordBatch.from_pylist(
                    [
                        {
                            "path": name,
                            "n_docs": table.num_rows,
                            "n_spans_out": n_spans,
                            "n_tables_built": n_tables,
                            "n_media_emitted": n_media,
                        }
                    ],
                    schema=pa.schema(
                        [
                            pa.field("path", pa.string()),
                            pa.field("n_docs", pa.int64()),
                            pa.field("n_spans_out", pa.int64()),
                            pa.field("n_tables_built", pa.int64()),
                            pa.field("n_media_emitted", pa.int64()),
                        ]
                    ),
                )

    return paths.mapInArrow(run, METRICS_DDL)


def run_file_extraction(
    spark: SparkSession,
    input_dir: str,
    table,
    run_id: str | None = None,
    batch_rows: int = 8192,
) -> str:
    """Object-store-safe commit wrapper: extract every file into an
    UNCOMMITTED SnapshotTable commit dir, then publish the manifest once
    all per-file metrics have reported back. Readers resolve the manifest
    (table.read()), so a crash mid-run leaves nothing visible and a re-run
    under a new run_id replaces nothing — rename atomicity is not part of
    the correctness argument.

    ``table`` is a sources.snapshots.SnapshotTable.
    """
    run_id = run_id or uuid.uuid4().hex
    commit_id = f"c-{run_id}"
    out_dir = table.prepare_commit_dir(commit_id)
    metrics = extract_parquet_files(
        spark, input_dir, out_dir, batch_rows=batch_rows
    ).collect()
    # per-file lineage in the same shape append() writes, so
    # table.metrics() covers file-granular commits too (the file is this
    # job's partition)
    spark.createDataFrame(
        [
            (
                run_id,
                i,
                m["n_docs"],
                m["n_spans_out"],
                m["n_tables_built"],
                m["n_media_emitted"],
            )
            for i, m in enumerate(metrics)
        ],
        "run_id string, partition_id int, n_docs long, n_spans_out long,"
        " n_tables_built long, n_media_emitted long",
    ).write.mode("overwrite").parquet(
        os.path.join(table.metrics_dir, commit_id)
    )
    n_docs = sum(m["n_docs"] for m in metrics)
    table._publish(
        commit_id,
        {"run_id": run_id, "n_docs": n_docs, "n_files": len(metrics)},
    )
    return commit_id
