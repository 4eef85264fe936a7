"""Per-document extraction report: the reference's status logging as a
relation.

The reference writes per-document processing status into its status
container as it converts (docker/main.py:318-344 status updates,
doc2md_utils.py job-status polling); at 10^12 documents the equivalent is
a metrics RELATION computed alongside the extraction pass — per document:
how much came in, how much survived, and what shape the output took —
the dashboard/alerting feed and the skew/quality triage input
(per-partition aggregate lineage already lands in snapshot commits,
sources/snapshots.py; this is the per-document grain).

Spark shape: two aggregates joined on doc_id. The input side is a
zero-shuffle array projection (counts from the spans array, no explode);
the output side aggregates the extracted relation. One equality join on
the natural key — broadcast-eligible under AQE when one side is small,
shuffle-co-partitioned otherwise; at 100 TB both sides are the SAME
partitioning (doc_id) so the join is the cheapest possible exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extraction_report", "EXTRACTION_REPORT_SQL"]


def _n_of(kind: str) -> str:
    return f"size(filter(spans, s -> s.kind = '{kind}'))"


def extraction_report(
    span_documents: DataFrame, extracted_spans: DataFrame
) -> DataFrame:
    """(doc_id, spans) input + exploded extracted relation ->
    per-document extraction metrics:

    - n_spans_in, n_pages (input page_breaks + 1), n_boiler_in (tagged
      boilerplate kinds in the input)
    - n_spans_out, n_tables, n_media, n_headings (output composition)
    - n_dropped = spans_in - spans_out - (table_rows_in - tables_out):
      spans removed by the strip rules (boilerplate kinds, blank, link
      density, text density) — table-row collapse accounted for, so a
      clean document reports 0."""
    inp = span_documents.select(
        "doc_id",
        F.expr("size(spans)").cast("long").alias("n_spans_in"),
        (F.expr(_n_of("page_break")) + 1).cast("long").alias("n_pages"),
        F.expr(
            "size(filter(spans, s -> s.kind IN"
            " ('nav','footer','ad','script')))"
        ).cast("long").alias("n_boiler_in"),
        F.expr(_n_of("table_row")).cast("long").alias("n_table_rows_in"),
    )
    out = extracted_spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans_out"),
        F.sum((F.col("kind") == "table").cast("long")).alias("n_tables"),
        F.sum((F.col("kind") == "media").cast("long")).alias("n_media"),
        F.sum((F.col("kind") == "heading").cast("long")).alias("n_headings"),
    )
    n_out = F.coalesce("n_spans_out", F.lit(0))
    n_tbl = F.coalesce("n_tables", F.lit(0))
    return inp.join(out, "doc_id", "left").select(
        "doc_id",
        "n_spans_in",
        "n_pages",
        "n_boiler_in",
        n_out.alias("n_spans_out"),
        n_tbl.alias("n_tables"),
        F.coalesce("n_media", F.lit(0)).alias("n_media"),
        F.coalesce("n_headings", F.lit(0)).alias("n_headings"),
        (
            F.col("n_spans_in") - n_out - (F.col("n_table_rows_in") - n_tbl)
        ).cast("long").alias("n_dropped"),
    )


# Oracle: consumes `spanified` AND `extracted` CTEs (compose with
# oracles.EXTRACT_SQL, which itself includes SPANIFY_SQL).
EXTRACTION_REPORT_SQL = """
rep_in AS (
  SELECT doc_id,
    COUNT(*) AS n_spans_in,
    SUM(CASE WHEN kind = 'page_break' THEN 1 ELSE 0 END) + 1 AS n_pages,
    SUM(CASE WHEN kind IN ('nav','footer','ad','script') THEN 1 ELSE 0 END)
      AS n_boiler_in,
    SUM(CASE WHEN kind = 'table_row' THEN 1 ELSE 0 END) AS n_table_rows_in
  FROM spanified GROUP BY doc_id
),
rep_out AS (
  SELECT doc_id,
    COUNT(*) AS n_spans_out,
    SUM(CASE WHEN kind = 'table' THEN 1 ELSE 0 END) AS n_tables,
    SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS n_media,
    SUM(CASE WHEN kind = 'heading' THEN 1 ELSE 0 END) AS n_headings
  FROM extracted GROUP BY doc_id
),
extraction_report AS (
  SELECT i.doc_id,
    CAST(i.n_spans_in AS BIGINT) AS n_spans_in,
    CAST(i.n_pages AS BIGINT) AS n_pages,
    CAST(i.n_boiler_in AS BIGINT) AS n_boiler_in,
    CAST(COALESCE(o.n_spans_out, 0) AS BIGINT) AS n_spans_out,
    CAST(COALESCE(o.n_tables, 0) AS BIGINT) AS n_tables,
    CAST(COALESCE(o.n_media, 0) AS BIGINT) AS n_media,
    CAST(COALESCE(o.n_headings, 0) AS BIGINT) AS n_headings,
    CAST(i.n_spans_in - COALESCE(o.n_spans_out, 0)
         - (i.n_table_rows_in - COALESCE(o.n_tables, 0)) AS BIGINT)
      AS n_dropped
  FROM rep_in i LEFT JOIN rep_out o ON i.doc_id = o.doc_id
)
"""
