"""Coordinate-based column detection (operators/layout.py): detector
decisions on hand-made geometry, reading order, span lowering, and the
zero-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F
import pyspark.sql.types as T

from gpt4ocontentextraction_spark.operators.layout import (
    layout_columns,
    layout_to_spans,
    layoutify,
)
from gpt4ocontentextraction_spark.plans.inspect import assert_no_exchange

_BLOCK = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("x0", T.IntegerType(), False),
        T.StructField("x1", T.IntegerType(), False),
        T.StructField("y0", T.IntegerType(), False),
        T.StructField("y1", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)
_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("blocks", T.ArrayType(_BLOCK, False), False),
    ]
)


def _b(idx, page, x0, x1, y0, text):
    return (idx, page, x0, x1, y0, y0 + 50, text)


def test_detector_and_reading_order(spark):
    # Page 0: header (full width), then right-column block ABOVE a
    # left-column block in y — reading order must still do full, then
    # the whole left column, then right. Page 1: single full block.
    blocks = [
        _b(0, 0, 36, 576, 72, "header"),
        _b(1, 0, 322, 576, 140, "right-top"),
        _b(2, 0, 36, 290, 200, "left-low"),
        _b(3, 0, 36, 290, 140, "left-top"),
        _b(4, 1, 36, 576, 72, "p2"),
    ]
    df = spark.createDataFrame([("d", blocks)], schema=_SCHEMA)
    got = [
        (r.block_idx, r.page, r.column, r.reading_rank)
        for r in layout_columns(df).collect()
    ]
    assert got == [
        (0, 0, "full", 0),
        (3, 0, "left", 1),   # left column in y order...
        (2, 0, "left", 2),
        (1, 0, "right", 3),  # ...then the right column
        (4, 1, "full", 4),
    ]


def test_midline_straddler_is_full_width(spark):
    blocks = [_b(0, 0, 200, 400, 72, "straddles")]
    df = spark.createDataFrame([("d", blocks)], schema=_SCHEMA)
    assert layout_columns(df).collect()[0].column == "full"


def test_layout_to_spans_inserts_page_breaks(spark):
    blocks = [
        _b(0, 0, 36, 290, 72, "L"),
        _b(1, 0, 322, 576, 72, "R"),
        _b(2, 1, 36, 576, 72, "full2"),
    ]
    df = spark.createDataFrame([("d", blocks)], schema=_SCHEMA)
    spans = layout_to_spans(df).select(F.explode("spans").alias("s")).select("s.*")
    got = [tuple(r) for r in spans.collect()]
    assert got == [
        ("column_left", "L", "", 0),
        ("column_right", "R", "", 1),
        ("page_break", "||0||", "", 2),
        ("text", "full2", "", 3),
        ("page_break", "||1||", "", 4),
    ]


def test_layout_pipeline_no_shuffle(spark, tmp_path):
    docs = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h i j").alias("text"),
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    src = spark.read.parquet(str(tmp_path / "docs"))
    out = layout_to_spans(layoutify(src))
    assert_no_exchange(out)
    cols = layout_columns(layoutify(src))
    assert_no_exchange(cols)
