"""Per-source corpus report card: hand-checked dup/quality math on a
tiny frame plus corpus-level invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import textstats as T

SF = "/root/testdata/sf0.001"


def test_source_report_hand_semantics(spark):
    # two docs in src_a share the first-2-word key -> 1 dup; src_b clean
    df = spark.createDataFrame(
        [
            (1, "the key row one extra words here", "src_a"),
            (2, "the key different tail entirely now", "src_a"),
            (3, "another document body", "src_b"),
            (4, None, "src_b"),  # null text counts as ''
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.source_report(df).collect()}
    a, b = out["src_a"], out["src_b"]
    assert a["n_docs"] == 2 and b["n_docs"] == 2
    assert a["n_tokens"] == 7 + 6
    # doc 2 shares dup_key 'the key' with keeper doc 1
    assert a["dup_docs"] == 1 and a["dup_frac"] == 0.5
    assert b["dup_docs"] == 0 and b["dup_frac"] == 0.0

    # quality twin for doc 3: 3 words, 0 stopwords, avg len 19/3
    q3 = 0.4 * min(3 / 50.0, 1.0) + 0.3 * 0.0 + 0.3 * min(19 / 3 / 8.0, 1.0)
    # doc 4 -> '': ws = [''], 1 word, len 0 -> q = 0.4*(1/50)
    q4 = 0.4 * (1 / 50.0)
    want = math.floor(
        (math.floor(q3 * 10000) + math.floor(q4 * 10000)) / 2 / 10000.0
        * 10000
    ) / 10000
    assert b["mean_quality"] == want


def test_source_report_corpus_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = T.source_report(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["dup_frac"] <= 1
        assert 0 <= r["mean_quality"] <= 1
        assert r["dup_docs"] < r["n_docs"]  # every key has a keeper


def test_source_report_aggregate_is_partial(spark):
    # the per-source aggregate must be a hash aggregate (map-side
    # combinable), not a sort-based global pass
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = (
        T.source_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in p
    assert "Window" not in p
