"""A2: ordered merge of extracted spans into one markdown document.

Reference: merge_markdown_files (docker/main.py:428-445) sorts per-page
files by the first integer in the filename and concatenates them with
``\\n||{pg}||\\n`` prefixes. In the span model the page markers are
explicit ``page_break`` spans and ordering is the ``offset`` field, so the
merge is a pure per-row expression: sort the spans array by offset, join
texts with newlines. No shuffle, no UDF — Catalyst sees one project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sort array<struct> by offset: lift offset to the first struct field,
# sort lexicographically (offset is unique within a doc), then project text.
_MERGE_EXPR = (
    "array_join("
    "  transform("
    "    array_sort(transform(spans, s -> struct(s.offset as o, s.text as t))),"
    "    x -> x.t"
    "  ), '\n')"
)


def merge_markdown(extracted: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, merged_md)."""
    return extracted.select(
        "doc_id", F.expr(_MERGE_EXPR).alias("merged_md")
    )
