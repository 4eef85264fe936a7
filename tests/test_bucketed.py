"""Bucketed layout => co-located joins: the doc_id equi-join of two
same-bucketed tables must carry ZERO Exchange (the shuffle is paid once
at write time), and results must match the plain join."""

from __future__ import annotations

import pytest

from gpt4ocontentextraction_spark.plans.inspect import physical_plan
from gpt4ocontentextraction_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bucketed_join_has_no_exchange(spark, corpus):
    """Broadcast is disabled for the assertion: co-located joins are the
    big-x-big regime (a broadcastable side wouldn't need bucketing, and
    at test scale Spark would broadcast everything, hiding the shape)."""
    from pyspark.sql import functions as F

    left = corpus.select("doc_id", F.length("text").alias("n_chars"))
    right = corpus.select("doc_id", F.substring("text", 1, 8).alias("head"))
    write_bucketed(left, "t_bucketed_left", "doc_id", buckets=4)
    write_bucketed(right, "t_bucketed_right", "doc_id", buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "t_bucketed_left", "t_bucketed_right", "doc_id"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

        # same rows as the plain (shuffled) join
        plain = left.join(right, "doc_id")
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_counts_reintroduce_exchange(spark, corpus):
    """The layout is a contract: a 4-bucket x 8-bucket join cannot be
    fully co-located — the plan grows an Exchange again (this is the
    regression the plan pin above exists to catch)."""
    from pyspark.sql import functions as F

    side = corpus.select("doc_id", F.length("text").alias("n_chars"))
    write_bucketed(side, "t_bucketed_4", "doc_id", buckets=4)
    write_bucketed(side, "t_bucketed_8", "doc_id", buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical_plan(
            bucketed_join(spark, "t_bucketed_4", "t_bucketed_8", "doc_id")
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
