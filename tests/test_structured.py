"""Structured table-cell extraction (operators/structured.py) and
readability signals (operators/textstats.py readability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators.structured import table_cells
from gpt4ocontentextraction_spark.operators.textstats import readability
from gpt4ocontentextraction_spark.plans.inspect import assert_no_exchange


def test_table_cells_basic(spark):
    md = "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |"
    spans = spark.createDataFrame(
        [
            ("d0", "table", md, "", 3),
            ("d0", "text", "not a table", "", 4),
            ("d0", "table", "| only | header |\n| --- | --- |", "", 7),
        ],
        "doc_id string, kind string, text string, media_ref string, offset int",
    )
    got = sorted(tuple(r) for r in table_cells(spans).collect())
    assert got == sorted(
        [
            ("d0", 3, 0, 0, "h1"),
            ("d0", 3, 0, 1, "h2"),
            ("d0", 3, 1, 0, "a"),
            ("d0", 3, 1, 1, "b"),
            ("d0", 3, 2, 0, "c"),
            ("d0", 3, 2, 1, "d"),
            ("d0", 7, 0, 0, "only"),
            ("d0", 7, 0, 1, "header"),
        ]
    )


def test_table_cells_no_shuffle(spark):
    spans = spark.createDataFrame(
        [("d0", "table", "| a |\n| --- |", "", 0)],
        "doc_id string, kind string, text string, media_ref string, offset int",
    )
    assert_no_exchange(table_cells(spans))


def test_readability_sentences_and_syllables(spark):
    # "Spark is fast. It scales well!" -> 6 words, 2 sentences,
    # syllable groups: spark(a) is(i) fast(a) it(i) scales(a,e) well(e) = 7
    docs = spark.createDataFrame(
        [(1, "Spark is fast. It scales well!")], "doc_id long, text string"
    )
    row = readability(docs).collect()[0]
    assert (row.n_words, row.n_sents, row.n_syllables) == (6, 2, 7)
    w, s, y = 6.0, 2.0, 7.0
    import math

    assert row.flesch == math.floor(
        (206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 10000
    ) / 10000
    assert row.fk_grade == math.floor(
        (0.39 * (w / s) + 11.8 * (y / w) - 15.59) * 10000
    ) / 10000


def test_readability_no_punctuation_floors_sentences_at_one(spark):
    docs = spark.createDataFrame([(2, "abc xyz")], "doc_id long, text string")
    row = readability(docs).collect()[0]
    assert row.n_sents == 1
    assert row.n_syllables == 2  # abc -> [a], xyz -> [y]


def test_readability_vowel_groups(spark):
    docs = spark.createDataFrame(
        [(3, "abc xyz queue rhythm")], "doc_id long, text string"
    )
    row = readability(docs).collect()[0]
    # abc->[a] xyz->[y] queue->[ueue] rhythm->[y] = 4 maximal runs
    assert row.n_syllables == 4
