"""Snapshot-committed table: atomic appends + resume + lineage metrics.

The reference checkpoints by writing ``status.json`` to blob storage after
every pipeline stage (docker/main.py:253-257) and resumes by skipping pages
whose output file exists (doc2md_utils.py:212-217). The Spark-native
equivalent is a table format with atomic commit snapshots — Iceberg in
production. The Iceberg runtime jar is not in this sandbox, so this module
implements the same contract on plain parquet:

- data files land in ``{root}/data/{commit_id}/`` (invisible until committed)
- a commit atomically publishes a new manifest version
  ``{root}/_manifest/v{N}.json`` (write-temp + rename) listing all committed
  commit dirs — readers resolve the highest version, so a crashed writer
  leaves no partial state visible (snapshot isolation)
- each commit also writes per-partition lineage + extraction metrics to
  ``{root}/_metrics/{commit_id}.parquet`` (north_rule: "per-partition
  lineage and extraction metrics ... alongside commit snapshots")
- resume = left-anti join of the input against committed doc_ids
  (broadcast when small), so re-running after an interrupt processes only
  missing documents and never duplicates (M6).

Write granularity is the document (one row), so a failed partition never
commits partial documents (SURVEY.md §7 hard point 3).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifest")
        self.metrics_dir = os.path.join(root, "_metrics")
        for d in (self.data_dir, self.manifest_dir, self.metrics_dir):
            os.makedirs(d, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def committed_dirs(self) -> list[str]:
        v = self.current_version()
        if v == 0:
            return []
        with open(os.path.join(self.manifest_dir, f"v{v}.json")) as f:
            manifest = json.load(f)
        return [os.path.join(self.data_dir, c) for c in manifest["commits"]]

    def _publish(self, new_commit: str, meta: dict) -> int:
        """Optimistic-concurrency publish: os.link fails with EEXIST if
        another writer took the version first (os.rename would silently
        overwrite and LOSE their commit) — on conflict, re-read and retry
        on top of the winner, like Iceberg's commit loop."""
        while True:
            v = self.current_version()
            commits = []
            if v:
                with open(os.path.join(self.manifest_dir, f"v{v}.json")) as f:
                    commits = json.load(f)["commits"]
            manifest = {
                "version": v + 1,
                "commits": commits + [new_commit],
                "commit_meta": meta,
            }
            tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            target = os.path.join(self.manifest_dir, f"v{v + 1}.json")
            try:
                os.link(tmp, target)
                return v + 1
            except FileExistsError:
                continue  # lost the race; rebase on the new manifest
            finally:
                os.unlink(tmp)

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        dirs = self.committed_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def committed_doc_ids(self, spark: SparkSession) -> DataFrame | None:
        df = self.read(spark)
        return None if df is None else df.select("doc_id").distinct()

    def pending(
        self,
        input_df: DataFrame,
        spark: SparkSession,
        broadcast_done: bool | None = None,
    ) -> DataFrame:
        """Resume anti-join: input docs not yet committed (M6).

        Broadcast is decided from the committed data SIZE, not assumed:
        after many commits the distinct doc_id set can exceed executor
        memory, so the hint is applied only while the committed files stay
        under spark.sql.autoBroadcastJoinThreshold (callers can force
        either way via ``broadcast_done``). Past the threshold the plan
        falls back to a shuffled anti-join, which is the correct shape for
        a huge committed set.
        """
        done = self.committed_doc_ids(spark)
        if done is None:
            return input_df
        if broadcast_done is None:
            raw = spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
            units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
            s = raw.strip().lower().removesuffix("b")
            mult = units.get(s[-1:], 1)
            try:
                threshold = int(s.rstrip("kmg") or "0") * mult
            except ValueError:
                threshold = 10 << 20
            # estimate the BROADCAST side (the distinct doc_id projection),
            # not the whole committed files: whole-file bytes include the
            # heavy spans column and overshoot by orders of magnitude,
            # dropping to a shuffled anti-join long before the id set is
            # actually too big. Parquet footers give the doc_id column
            # chunk sizes directly.
            broadcast_done = 0 <= self._doc_id_bytes() <= max(threshold, 0)
        if broadcast_done:
            done = F.broadcast(done)
        return input_df.join(done, "doc_id", "left_anti")

    def _doc_id_bytes(self) -> int:
        """Uncompressed size of the doc_id column across committed files,
        from parquet footer column-chunk stats — the size that actually
        drives the resume anti-join's broadcast side."""
        import pyarrow.parquet as pq

        total = 0
        for d in self.committed_dirs():
            for root, _, fs in os.walk(d):
                for f in fs:
                    if not f.endswith(".parquet"):
                        continue
                    meta = pq.ParquetFile(os.path.join(root, f)).metadata
                    for rg in range(meta.num_row_groups):
                        g = meta.row_group(rg)
                        for ci in range(g.num_columns):
                            col = g.column(ci)
                            if col.path_in_schema == "doc_id":
                                total += col.total_uncompressed_size
        return total

    # -- write path --------------------------------------------------------

    def prepare_commit_dir(self, commit_id: str) -> str:
        """Resolve (and clear, if it's a crashed uncommitted leftover) the
        data dir for commit_id; refuse to reuse an already-committed id."""
        out = os.path.join(self.data_dir, commit_id)
        if os.path.exists(out):
            if commit_id in {
                os.path.basename(d) for d in self.committed_dirs()
            }:
                raise ValueError(f"{commit_id} is already committed")
            # leftover from a crashed attempt with the same run_id
            # (e.g. a retried streaming epoch): uncommitted, safe to clear
            import shutil

            shutil.rmtree(out)
        return out

    def append(
        self,
        df: DataFrame,
        spark: SparkSession,
        run_id: str | None = None,
    ) -> str:
        """Write df + per-partition metrics, then atomically commit.

        The metrics aggregation shares the scan with the data write via
        a localCheckpoint-free design: we write data first (uncommitted),
        then derive metrics FROM THE WRITTEN FILES — so metrics describe
        exactly what was committed, not what was planned.
        """
        run_id = run_id or uuid.uuid4().hex
        commit_id = f"c-{run_id}"
        out = self.prepare_commit_dir(commit_id)
        df.write.mode("errorifexists").parquet(out)

        written = spark.read.parquet(out)
        metrics = (
            written.select(
                F.lit(run_id).alias("run_id"),
                F.spark_partition_id().alias("partition_id"),
                F.col("doc_id"),
                F.size("spans").alias("n_spans"),
                F.size(
                    F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("table"))
                ).alias("n_tables"),
                F.size(
                    F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
                ).alias("n_media"),
            )
            .groupBy("run_id", "partition_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_spans").alias("n_spans_out"),
                F.sum("n_tables").alias("n_tables_built"),
                F.sum("n_media").alias("n_media_emitted"),
            )
        )
        # ONE read of the committed files: the per-partition metric rows
        # (bounded by the partition count) come back to the driver, get
        # written as the metrics file, and their n_docs sum replaces what
        # used to be a second full written.count() scan.
        metric_rows = metrics.collect()
        spark.createDataFrame(metric_rows, metrics.schema).coalesce(1) \
            .write.mode("overwrite").parquet(
                os.path.join(self.metrics_dir, commit_id)
            )
        n_docs = sum(r["n_docs"] for r in metric_rows)
        self._publish(commit_id, {"run_id": run_id, "n_docs": n_docs})
        return commit_id

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        dirs = [
            os.path.join(self.metrics_dir, c)
            for c in (os.path.basename(d) for d in self.committed_dirs())
        ]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)


def run_resumable_extraction(
    spark: SparkSession,
    documents: DataFrame,
    table: SnapshotTable,
    run_id: str | None = None,
) -> str | None:
    """One checkpoint-resumable extraction increment: pending docs ->
    extract -> atomic append. Returns the commit id (None if up to date)."""
    from ..operators.extract import extract

    todo = table.pending(documents, spark)
    if not todo.take(1):
        return None
    return table.append(extract(todo), spark, run_id=run_id)
