"""Streaming ingest: the same extraction operator over a file-source
stream, micro-batches committed through the snapshot table, resumable via
checkpoint (drives availableNow to completion, then adds more files)."""

from __future__ import annotations

import os

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.extract import extract
from gpt4ocontentextraction_spark.sources.snapshots import SnapshotTable
from gpt4ocontentextraction_spark.streaming.ingest import stream_extract


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = SnapshotTable(str(tmp_path / "out"))
    ckpt = str(tmp_path / "ckpt")

    pdf, _ = make_corpus(seed=21, docs_per_class=2, include_giant=False)
    docs = corpus_to_spark(spark, pdf)
    first, second = docs.limit(6), docs.subtract(docs.limit(6))
    first.write.parquet(in_dir, mode="append")

    q = stream_extract(spark, in_dir, table, ckpt)
    q.awaitTermination(120)
    got1 = table.read(spark)
    assert got1.count() == 6

    # late-arriving files: restart from the same checkpoint
    second.write.mode("append").parquet(in_dir)
    q2 = stream_extract(spark, in_dir, table, ckpt)
    q2.awaitTermination(120)
    final = table.read(spark)
    assert final.count() == docs.count()
    assert final.select("doc_id").distinct().count() == docs.count()

    # streamed result == batch result
    batch = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in extract(docs).collect()
    }
    streamed = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in final.collect()
    }
    assert batch == streamed
