"""File-granular extraction job: output must equal the in-JVM operator's,
metrics must add up, and torn files must never be visible."""

from __future__ import annotations

import os

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.extract import extract
from gpt4ocontentextraction_spark.operators.extract_files import (
    extract_parquet_files,
)
from gpt4ocontentextraction_spark.spanify import spanify


def test_file_job_equals_operator(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spanify(flat).repartition(4).write.parquet(in_dir)

    metrics = extract_parquet_files(spark, in_dir, out_dir).collect()
    data_files = [f for f in os.listdir(in_dir) if f.endswith(".parquet")]
    assert len(metrics) == len(data_files)
    assert sum(m["n_docs"] for m in metrics) == 500
    assert not any(f.endswith(".inprogress") for f in os.listdir(out_dir))

    via_files = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in spark.read.parquet(out_dir).collect()
    }
    via_operator = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in extract(spark.read.parquet(in_dir)).collect()
    }
    assert via_files == via_operator
    assert sum(m["n_spans_out"] for m in metrics) == sum(
        len(v) for v in via_operator.values()
    )


def test_file_job_manifest_visibility(spark, tmp_path):
    """Visibility flows through the snapshot manifest only: an uncommitted
    output dir (crashed run) is invisible; after run_file_extraction the
    table reads exactly the extracted rows — rename atomicity is not part
    of the correctness argument."""
    from gpt4ocontentextraction_spark.operators.extract_files import (
        run_file_extraction,
    )
    from gpt4ocontentextraction_spark.sources.snapshots import SnapshotTable

    in_dir = str(tmp_path / "in")
    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spanify(flat).repartition(3).write.parquet(in_dir)

    table = SnapshotTable(str(tmp_path / "table"))
    # simulate a crashed earlier run: data landed, manifest never published
    extract_parquet_files(
        spark, in_dir, os.path.join(table.data_dir, "c-crashed")
    ).collect()
    assert table.read(spark) is None  # invisible without a manifest

    commit_id = run_file_extraction(spark, in_dir, table, run_id="r1")
    got = table.read(spark)
    assert got is not None and got.count() == 500
    assert commit_id == "c-r1"
    via_operator = extract(spark.read.parquet(in_dir))
    assert got.select("doc_id").distinct().count() == via_operator.count()
    # per-file lineage lands in the shared metrics table
    m = table.metrics(spark)
    assert m is not None
    rows = m.filter(m.run_id == "r1").collect()
    assert rows and sum(r["n_docs"] for r in rows) == 500
    assert sum(r["n_spans_out"] for r in rows) > 0


def test_file_job_with_fixture_corpus(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    pdf, exp = make_corpus(seed=8, docs_per_class=2, include_giant=False)
    corpus_to_spark(spark, pdf).repartition(2).write.parquet(in_dir)
    extract_parquet_files(spark, in_dir, out_dir).collect()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for _, r in exp.iterrows()
    }
    assert got == want
