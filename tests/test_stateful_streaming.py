"""applyInPandasWithState: streaming dedup must suppress duplicates that
arrive in LATER micro-batches (state persists across batches/restarts)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.streaming.stateful import (
    stream_dedup_first_seen,
)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [("d1", "k1"), ("d2", "k2"), ("d3", "k1")], "doc_id string, dup_key string"
    )
    batch1.coalesce(1).write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "out")

    def start():
        stream = (
            spark.readStream.schema("doc_id string, dup_key string")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        return (
            stream_dedup_first_seen(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(120)
    got1 = {
        r["dup_key"]: (r["doc_id"], r["n_suppressed"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert set(got1) == {"k1", "k2"}
    assert got1["k1"][1] == 1  # d3 suppressed within the batch

    # second micro-batch: k1 again (must be suppressed via state),
    # k3 is new (must be emitted)
    batch2 = spark.createDataFrame(
        [("d4", "k1"), ("d5", "k3")], "doc_id string, dup_key string"
    )
    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = start()
    q2.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    keys = [r["dup_key"] for r in rows]
    assert keys.count("k1") == 1  # no re-emission for k1
    assert "k3" in keys
    d4_rows = [r for r in rows if r["doc_id"] == "d4"]
    assert d4_rows == []  # the duplicate doc never surfaced
    # first-seen is the MIN doc_id, not arrival order
    assert got1["k1"][0] == "d1"


def test_streaming_dedup_deterministic_under_repartition(spark, tmp_path):
    """Same-batch duplicates must resolve to the same doc regardless of
    partition arrival order (min-doc_id rule, not row order)."""
    rows = [(f"d{i}", f"k{i % 5}") for i in range(40, 0, -1)]
    results = []
    for n_parts, tag in ((1, "a"), (7, "b"), (13, "c")):
        in_dir = str(tmp_path / f"in{tag}")
        os.makedirs(in_dir)
        df = spark.createDataFrame(rows, "doc_id string, dup_key string")
        df.repartition(n_parts).write.mode("append").parquet(in_dir)
        out_dir = str(tmp_path / f"out{tag}")
        q = (
            stream_dedup_first_seen(
                spark.readStream.schema("doc_id string, dup_key string")
                .parquet(in_dir)
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"ckpt{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results.append(
            sorted(
                (r["dup_key"], r["doc_id"], r["n_suppressed"])
                for r in spark.read.parquet(out_dir).collect()
            )
        )
    assert results[0] == results[1] == results[2]
    # min doc_id per key: k0 -> d10 (lexicographic min of d10,d15,...)
    k0 = [r for r in results[0] if r[0] == "k0"]
    assert k0 == [("k0", min(d for d, k in rows if k == "k0"), 7)]
