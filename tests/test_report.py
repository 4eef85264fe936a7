"""Per-document extraction report (operators/report.py): hand-case
metric arithmetic including table-row collapse and boilerplate drops."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators.extract import extract
from gpt4ocontentextraction_spark.operators.report import extraction_report

from pyspark.sql import functions as F

_DDL = (
    "doc_id string, spans array<struct<kind string, text string,"
    " media_ref string, offset int>>"
)


def _spans_out(df):
    return df.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )


def test_extraction_report_hand_case(spark):
    spans = [
        ("heading1", "Title words here", "", 0),
        ("text", "alpha beta gamma delta epsilon zeta", "", 1),
        ("nav", "home about contact", "", 2),          # boilerplate drop
        ("table_row", "a\tb", "", 3),                   # collapse 2 rows
        ("table_row", "c\td", "", 4),                   #   -> 1 table
        ("chart", "cap", "media://d/5", 5),
        ("page_break", "||1||", "", 6),
        ("text", "eta theta iota kappa lambda mu", "", 7),
    ]
    docs = spark.createDataFrame([("d", spans)], _DDL)
    rep = extraction_report(docs, _spans_out(extract(docs))).collect()[0]
    assert rep.n_spans_in == 8
    assert rep.n_pages == 2
    assert rep.n_boiler_in == 1
    # out: heading, text, table(1), media, page_break, text = 6
    assert rep.n_spans_out == 6
    assert (rep.n_tables, rep.n_media, rep.n_headings) == (1, 1, 1)
    # dropped = 8 - 6 - (2 table rows in - 1 table out) = 1 (the nav)
    assert rep.n_dropped == 1


def test_extraction_report_clean_doc_reports_zero_dropped(spark):
    spans = [
        ("text", "one two three four five six", "", 0),
        ("text", "seven eight nine ten eleven twelve", "", 1),
    ]
    docs = spark.createDataFrame([("d", spans)], _DDL)
    rep = extraction_report(docs, _spans_out(extract(docs))).collect()[0]
    assert rep.n_dropped == 0 and rep.n_spans_out == 2
