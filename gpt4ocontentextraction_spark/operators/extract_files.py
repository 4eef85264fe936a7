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

Fault tolerance: output files are written to `<name>.inprogress` and
renamed on completion, so a retried task never exposes a torn file; the
snapshot commit (sources/snapshots.py) publishes the directory only after
every file reports back.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

METRICS_DDL = "path string, n_docs long, n_spans_out long"


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
        import pyarrow.parquet as pq

        from gpt4ocontentextraction_spark.operators.extract import (
            _extract_batch,
        )

        for b in batches:
            for name in b.column("name").to_pylist():
                src = os.path.join(input_dir, name)
                dst = os.path.join(output_dir, name)
                tmp = dst + ".inprogress"
                table = pq.read_table(src)
                out_batches = [
                    _extract_batch(x)
                    for x in table.to_batches(max_chunksize=batch_rows)
                ]
                out = pa.Table.from_batches(
                    out_batches,
                    schema=out_batches[0].schema if out_batches else None,
                )
                pq.write_table(out, tmp)
                os.rename(tmp, dst)
                n_spans = sum(
                    len(x.column("spans").flatten()) for x in out_batches
                )
                yield pa.RecordBatch.from_pylist(
                    [
                        {
                            "path": name,
                            "n_docs": table.num_rows,
                            "n_spans_out": n_spans,
                        }
                    ],
                    schema=pa.schema(
                        [
                            pa.field("path", pa.string()),
                            pa.field("n_docs", pa.int64()),
                            pa.field("n_spans_out", pa.int64()),
                        ]
                    ),
                )

    return paths.mapInArrow(run, METRICS_DDL)
