"""Golden span-sequence tests: extract() output must be sequence-equal
(kind, text, media_ref, order) to the generator's ground truth, end-to-end
through Spark (BASELINE.json per-row invariant)."""

from __future__ import annotations

import pytest

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.extract import extract


def _collect_spans(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(seed=42, docs_per_class=4, include_giant=False)


def test_golden_span_sequence_equality(spark, corpus):
    docs_pdf, exp_pdf = corpus
    docs = corpus_to_spark(spark, docs_pdf)
    got = _collect_spans(extract(docs))
    want = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for _, r in exp_pdf.iterrows()
    }
    assert set(got) == set(want)
    for doc_id in sorted(want):
        assert got[doc_id] == want[doc_id], f"span sequence mismatch for {doc_id}"


def test_schema_stable(spark, corpus):
    docs_pdf, _ = corpus
    out = extract(corpus_to_spark(spark, docs_pdf))
    assert [f.name for f in out.schema.fields] == ["doc_id", "spans"]
    span_t = out.schema["spans"].dataType.elementType
    assert [f.name for f in span_t.fields] == ["kind", "text", "media_ref", "offset"]


def test_giant_doc_golden(spark):
    docs_pdf, exp_pdf = make_corpus(
        seed=42, docs_per_class=1, classes=("giant_doc",)
    )
    got = _collect_spans(extract(corpus_to_spark(spark, docs_pdf)))
    want = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for _, r in exp_pdf.iterrows()
    }
    assert got == want
