"""Structured Streaming incremental ingest (optional extension — the
reference is batch-per-job, SURVEY.md §2.7; north_rule requires
checkpoint-resumable BATCH, which sources/snapshots.py provides. This
module adds the incremental path for continuously-arriving documents).

Design: a file-source stream over the documents table directory; the same
extraction operator (mapInArrow works unchanged on streaming DataFrames);
``foreachBatch`` writes each micro-batch through the snapshot table so the
batch and streaming paths share one sink with exactly-once visibility
(epoch-id-keyed commit ids make retried micro-batches idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract
from ..schema import DOCUMENTS_SCHEMA
from ..sources.snapshots import SnapshotTable


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    table: SnapshotTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start the incremental extraction stream; returns the query handle."""
    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    extracted = extract(docs)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # epoch-keyed commit id: a retried epoch overwrites nothing and
        # re-publishing the same commit id is rejected by errorifexists,
        # keeping the sink effectively exactly-once.
        todo = table.pending(batch_df, batch_df.sparkSession)
        if todo.take(1):
            table.append(todo, batch_df.sparkSession, run_id=f"epoch-{epoch_id}")

    return (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
