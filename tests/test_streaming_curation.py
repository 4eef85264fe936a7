"""The curation family on a STREAM: c4_filters and pii_redact are
stateless per-document projections, so they apply unchanged to a
readStream micro-batch pipeline — the shape an always-on ingest+clean
deployment runs (new crawl shards land, get filtered, get appended).
Streamed output must equal the batch operator on the same rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import curation


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "append"
    ).parquet(path)


def test_streaming_c4_filters_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    good = "one two three four five six."
    rows1 = [(1, "\n".join([good] * 4)), (2, "short.")]
    rows2 = [(3, "\n".join([good] * 3 + ["has a { brace."])), (4, None)]
    _write_docs(spark, in_dir, rows1)

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir
    )
    q = (
        curation.c4_filters(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # late-arriving shard, same checkpoint: only the new rows process
    _write_docs(spark, in_dir, rows2)
    q2 = (
        curation.c4_filters(
            spark.readStream.schema("doc_id long, text string").parquet(
                in_dir
            )
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    streamed = {
        r["doc_id"]: tuple(r)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_df = spark.createDataFrame(
        rows1 + rows2, "doc_id long, text string"
    )
    batch = {
        r["doc_id"]: tuple(r)
        for r in curation.c4_filters(batch_df).collect()
    }
    assert streamed == batch
    assert set(streamed) == {1, 2, 3}  # NULL text dropped on both paths
    assert streamed[1][-1] == 1 and streamed[3][-1] == 0  # brace poison


def test_streaming_pii_redact_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    rows = [(1, "mail a@b.co now"), (2, "host 10.0.0.1 up")]
    _write_docs(spark, in_dir, rows)
    q = (
        curation.pii_redact(
            spark.readStream.schema("doc_id long, text string").parquet(
                in_dir
            )
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: tuple(r)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["doc_id"]: tuple(r)
        for r in curation.pii_redact(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert streamed == batch
    assert "<EMAIL>" in streamed[1][1] and "<IP>" in streamed[2][1]
