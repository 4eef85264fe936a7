"""Kernel-batch memory bounding: a tiny span cap must split batches (and
isolate giant rows) without changing any output."""

from __future__ import annotations

import pyarrow as pa

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators import extract as ex


def test_bounded_rechunk_slices_and_preserves(monkeypatch, spark):
    pdf, _ = make_corpus(seed=13, docs_per_class=2, include_giant=True)
    docs = corpus_to_spark(spark, pdf).coalesce(1)

    baseline = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in ex.extract(docs).collect()
    }
    monkeypatch.setattr(ex, "MAX_SPANS_PER_KERNEL_BATCH", 200)
    bounded = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in ex.extract(docs).collect()
    }
    assert bounded == baseline
    # giant fixture really exceeds the cap, so slicing actually happened
    assert any(len(v) > 200 for v in baseline.values())


def test_bounded_iterator_unit():
    span_t = pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
    schema = pa.schema(
        [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(span_t))]
    )

    def doc(i, n):
        return {
            "doc_id": f"d{i}",
            "spans": [
                {"kind": "text", "text": "x", "media_ref": "", "offset": j}
                for j in range(n)
            ],
        }

    batch = pa.RecordBatch.from_pylist(
        [doc(0, 5), doc(1, 50), doc(2, 5), doc(3, 5)], schema=schema
    )
    import gpt4ocontentextraction_spark.operators.extract as ex

    old = ex.MAX_SPANS_PER_KERNEL_BATCH
    ex.MAX_SPANS_PER_KERNEL_BATCH = 10
    try:
        slices = list(ex._bounded(iter([batch])))
    finally:
        ex.MAX_SPANS_PER_KERNEL_BATCH = old
    # giant row isolated in its own slice; row order preserved
    assert [len(s) for s in slices] == [1, 1, 2]
    assert sum(len(s) for s in slices) == 4
    got = [r["doc_id"] for s in slices for r in s.to_pylist()]
    assert got == ["d0", "d1", "d2", "d3"]
