"""CCNet head/middle/tail perplexity buckets: hand-computed cutoffs on a
tiny corpus, boundary monotonicity + tercile mass on the real corpus,
and the scale-shape pin (windows run over the bounded histogram, never
over the document stream)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import curation as C

SF = "/root/testdata/sf0.001"


def _fl4(x: float) -> float:
    return math.floor(x * 10000) / 10000


def test_ccnet_hand_cutoffs(spark):
    # corpus LM: counts a=5, b=1, c=1, d=1, total=8
    df = spark.createDataFrame(
        [
            (1, "a a a a", "en"),  # avg_nll = ln(8/5)
            (2, "a b", "en"),  # (ln(8/5) + ln(8)) / 2
            (3, "c d", "en"),  # ln(8)
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in C.ccnet_buckets(df).collect()}
    nll1 = _fl4(math.log(8 / 5))
    nll2 = _fl4((math.log(8 / 5) + math.log(8)) / 2)
    nll3 = _fl4(math.log(8))
    assert out[1]["avg_nll"] == nll1
    assert out[2]["avg_nll"] == nll2
    assert out[3]["avg_nll"] == nll3
    # N=3: t1 = nll at cum >= 1 -> nll1, t2 = cum >= 2 -> nll2
    assert out[1]["bucket"] == "head"
    assert out[2]["bucket"] == "middle"
    assert out[3]["bucket"] == "tail"


def test_ccnet_uniform_corpus_all_head(spark):
    # all-distinct single-token docs: every token has count 1, so every
    # doc has the same avg_nll -> the t1 bin holds everything -> all head
    df = spark.createDataFrame(
        [(i, f"w{i}", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    buckets = {r["bucket"] for r in C.ccnet_buckets(df).collect()}
    assert buckets == {"head"}


def test_ccnet_corpus_boundaries_and_mass(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = C.ccnet_buckets(docs).collect()
    assert len(rows) > 0
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["avg_nll"]
        )
    for lang, bs in by_lang.items():
        n = sum(len(v) for v in bs.values())
        # boundary monotonicity: max(head) <= min(middle) <= ... and the
        # head must reach at least the tercile count (ties only grow it)
        if "middle" in bs:
            assert max(bs["head"]) <= min(bs["middle"]), lang
            assert len(bs["head"]) >= math.ceil(n / 3), lang
        if "tail" in bs and "middle" in bs:
            assert max(bs["middle"]) <= min(bs["tail"]), lang
            assert len(bs["head"]) + len(bs["middle"]) >= math.ceil(
                2 * n / 3
            ), lang


def test_ccnet_windows_only_over_histogram(spark):
    # the two windows must partition by lang over the HISTOGRAM relation
    # (never an unpartitioned window over the document stream); the only
    # SinglePartition exchange allowed is unigram_logprob's 1-row total
    from gpt4ocontentextraction_spark.plans.inspect import (
        assert_no_unpartitioned_window,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = C.ccnet_buckets(docs)
    assert_no_unpartitioned_window(df)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p
    assert "windowspecdefinition(lang" in p
