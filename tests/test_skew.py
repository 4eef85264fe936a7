"""Skew defusal equivalence + distribution (SURVEY.md §5.4): a doc with
~1000x median spans is sharded across many tasks yet produces byte-identical
output to the plain per-doc path."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.extract import extract
from gpt4ocontentextraction_spark.operators.skew import extract_with_skew_defusal


def _spans_map(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in df.collect()
    }


def test_skew_defused_output_identical(spark):
    pdf, _ = make_corpus(seed=5, docs_per_class=3, include_giant=True)
    docs = corpus_to_spark(spark, pdf)
    plain = _spans_map(extract(docs))
    defused = _spans_map(
        extract_with_skew_defusal(
            docs, span_threshold=500, target_spans_per_shard=300
        )
    )
    assert set(plain) == set(defused)
    for d in plain:
        assert plain[d] == defused[d], f"mismatch for {d}"


def test_giant_doc_actually_sharded(spark):
    pdf, _ = make_corpus(seed=5, docs_per_class=1, classes=("giant_doc",))
    docs = corpus_to_spark(spark, pdf)
    n_spans = docs.select(F.size("spans")).collect()[0][0]
    assert n_spans > 4000  # the fixture is actually giant
    # the shard stage splits it into many pseudo-docs: verify shard count
    from gpt4ocontentextraction_spark.operators import skew as sk

    # run just the shard split by reusing the operator with tiny targets
    out = extract_with_skew_defusal(
        docs, span_threshold=500, target_spans_per_shard=300
    )
    # output is still exactly one row per document
    assert out.count() == 1
    spans = out.collect()[0]["spans"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
