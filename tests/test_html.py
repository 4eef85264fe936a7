"""Raw-HTML front end (operators/html.py): renderer canonical form,
parser tolerance beyond the canonical subset, round-trip equality on
adversarial span content, and the no-shuffle/no-Python plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators.html import (
    html_to_spans,
    spans_to_html,
)
from gpt4ocontentextraction_spark.plans.inspect import (
    assert_no_exchange,
    physical_plan,
)
from gpt4ocontentextraction_spark.schema import SPAN_STRUCT

import pyspark.sql.types as T

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)


def _span(kind, text, media_ref="", offset=0):
    return Row(kind=kind, text=text, media_ref=media_ref, offset=offset)


def _render(spark, spans):
    df = spark.createDataFrame([("d0", spans)], schema=_DOC_SCHEMA)
    return spans_to_html(df)


def test_render_canonical_form(spark):
    """The rendered markup is real HTML, one block element per line, in
    offset order (input deliberately scrambled), entities escaped."""
    spans = [
        _span("table_row", "a\tb & c", offset=2),
        _span("heading1", "Title <1>", offset=0),
        _span("text", 'say "hi"\nline2', offset=1),
        _span("chart", "cap", media_ref="media://7/3", offset=3),
        _span("page_break", "||1||", offset=4),
    ]
    html = _render(spark, spans).select("html").collect()[0].html
    assert html == (
        "<h1>Title &lt;1&gt;</h1>\n"
        '<p>say &quot;hi&quot;&#10;line2</p>\n'
        "<tr><td>a</td><td>b &amp; c</td></tr>\n"
        '<img class="chart" src="media://7/3" alt="cap">\n'
        '<hr data-label="||1||">'
    )


def _parse_lines(spark, html_text):
    df = spark.createDataFrame([("d0", html_text)], "doc_id string, html string")
    out = html_to_spans(df).select(F.explode("spans").alias("s")).select("s.*")
    return [tuple(r) for r in out.collect()]


def test_parser_tolerates_messy_html(spark):
    """Attribute order, extra attributes, whitespace, unknown tags and
    bare text lines — a superset of the canonical renderer output."""
    html = "\n".join(
        [
            '  <h1 id="top">Hello &amp; bye</h1>',
            "",
            '<img alt="pic one" width="40" src="media://1/2" class="big chart">',
            '<div data-x="1" class="nav ad">buy now</div>',
            '<div class="col right">right col</div>',
            "<tr><td>x</td> <td>y &lt;z&gt;</td></tr>",
            "bare text line",
            "<blockquote>quoted</blockquote>",
            '<hr class="pb" data-label="||9||">',
        ]
    )
    rows = _parse_lines(spark, html)
    assert rows == [
        ("heading1", "Hello & bye", "", 0),
        ("chart", "pic one", "media://1/2", 1),
        ("ad", "buy now", "", 2),
        ("column_right", "right col", "", 3),
        ("table_row", "x\ty <z>", "", 4),
        ("text", "bare text line", "", 5),
        ("text", "quoted", "", 6),
        ("page_break", "||9||", "", 7),
    ]


def test_img_without_chart_class_is_figure(spark):
    rows = _parse_lines(spark, '<img src="media://0/0" alt="f">')
    assert rows == [("figure", "f", "media://0/0", 0)]


ADVERSARIAL_TEXTS = [
    "plain words",
    "a & b < c > d",
    'quotes " and \' inside',
    "embedded\nnewline",
    "tab\tinside text",
    "<p>looks like html</p>",
    "&amp; pre-escaped entity",
    "unicode é中文 \U0001f600",
    "",
    " leading and trailing ",
    "</td><td> cell-breaker literal",
    'attr injection " src="evil',
]


def test_roundtrip_adversarial_content(spark):
    """parse(render(spans)) == spans (offsets reindexed 0..n-1) for span
    text drawn from adversarial strings across every kind, including a
    table_row whose CELLS contain the nasty strings."""
    kinds = [
        "heading1", "heading2", "text", "nav", "footer", "ad", "script",
        "column_left", "column_right",
    ]
    spans = []
    off = 0
    for i, txt in enumerate(ADVERSARIAL_TEXTS):
        spans.append(_span_at(kinds[i % len(kinds)], txt, "", off))
        off += 1
    spans.append(_span_at("table_row", "\t".join(ADVERSARIAL_TEXTS[:4]), "", off))
    off += 1
    spans.append(_span_at("chart", ADVERSARIAL_TEXTS[2], "media://9/9", off))
    off += 1
    spans.append(_span_at("page_break", "||3||", "", off))

    df = spark.createDataFrame([("d0", spans)], schema=_DOC_SCHEMA)
    back = html_to_spans(spans_to_html(df))
    got = [
        tuple(r)
        for r in back.select(F.explode("spans").alias("s")).select("s.*").collect()
    ]
    want = [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
    # blank-after-trim TEXT spans ("", " leading...") still render as
    # <p>...</p> lines, so nothing is lost; every span must come back.
    assert got == want


def _span_at(kind, text, media_ref, offset):
    return Row(kind=kind, text=text, media_ref=media_ref, offset=offset)


def test_roundtrip_reorders_scrambled_offsets(spark):
    spans = [
        _span_at("text", "third", "", 7),
        _span_at("text", "first", "", 1),
        _span_at("text", "second", "", 4),
    ]
    df = spark.createDataFrame([("d0", spans)], schema=_DOC_SCHEMA)
    back = html_to_spans(spans_to_html(df))
    got = [
        tuple(r)
        for r in back.select(F.explode("spans").alias("s")).select("s.*").collect()
    ]
    assert got == [
        ("text", "first", "", 0),
        ("text", "second", "", 1),
        ("text", "third", "", 2),
    ]


def test_plan_no_shuffle_no_python(spark, tmp_path):
    """Render+parse over a parquet scan is one narrow projection: no
    Exchange, no Python eval node — the shape a 10^12-doc front end
    needs (parallelism = input partitions, zero data movement)."""
    spans = [_span_at("text", "w", "", 0)]
    spark.createDataFrame(
        [(str(i), spans) for i in range(4)], schema=_DOC_SCHEMA
    ).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    src = spark.read.parquet(str(tmp_path / "docs"))
    out = html_to_spans(spans_to_html(src))
    assert_no_exchange(out)
    plan = physical_plan(out)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert node not in plan, plan
