"""C1-C4: chunking strategies (reference: docker/main.py:450-539).

Two strategies, as in the reference's `vectorize_markdown` dispatch
(page for PPT/XLS/images, markdown for PDF/DOCX/HTML — docker/main.py:457-463):

- :func:`page_chunks` — one chunk per page, content prefixed ``||pg||``
  (`vectorize_by_page`, docker/main.py:479-500);
- :func:`markdown_chunks` — split at level-1 markdown headings into
  sections, carry the section heading as the chunk title, and split
  oversized sections into CHUNK_SIZE windows advancing by
  CHUNK_SIZE - CHUNK_OVERLAP chars (`vectorize_by_markdown`,
  docker/main.py:502-539: MarkdownHeaderTextSplitter +
  RecursiveCharacterTextSplitter(8192, 820) with carried last_heading at
  511,535-537). The reference's recursive splitter prefers separator
  boundaries; this engine uses a deterministic fixed-stride window — same
  size/overlap contract, fully relational (and therefore oracle-checkable).

Both are pure DataFrame ops (window + groupBy + explode(sequence));
the groupBy shuffles by (doc_id, page/section) which co-partitions with
every later per-chunk stage. At 100 TB the page/markdown chunkers run
fused after extraction in the same stage — the shuffle key doc_id is
already the table's write partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_SIZE = 8192  # docker/main.py:50
CHUNK_OVERLAP = 820  # docker/main.py:51
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def exploded_spans(extracted: DataFrame) -> DataFrame:
    """(doc_id, spans) -> one row per span."""
    return extracted.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def _with_page(e: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return e.withColumn(
        "page",
        F.coalesce(
            F.sum(F.when(F.col("kind") == "page_break", 1).otherwise(0)).over(w),
            F.lit(0),
        ),
    )


def page_chunks(extracted: DataFrame) -> DataFrame:
    """One chunk per page: (chunk_doc_id, chunk_id, pg_number, file_name,
    title=NULL, content='||pg||\\n' + page markdown)."""
    e = _with_page(exploded_spans(extracted))
    grouped = (
        e.filter(F.col("kind") != "page_break")
        .groupBy("doc_id", "page")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(offset as o,"
                " text as t))), x -> x.t), '\n')"
            ).alias("body")
        )
    )
    pg = (F.col("page") + 1).cast("long")
    return grouped.select(
        F.concat_ws("-", "doc_id", pg.cast("string")).alias("chunk_doc_id"),
        pg.alias("chunk_id"),
        pg.alias("pg_number"),
        F.col("doc_id").alias("file_name"),
        F.lit(None).cast("string").alias("title"),
        F.concat(
            F.lit("||"), pg.cast("string"), F.lit("||\n"), F.col("body")
        ).alias("content"),
    )


PAGE_CHUNK_TYPES = ("pptx", "ppt", "xlsx", "xls", "png", "jpg")


def chunk_dispatch(extracted: DataFrame, file_type_col: str = "file_type") -> DataFrame:
    """C1: strategy dispatch — `page` chunking for slide/sheet/image types,
    `markdown` for document types (docker/main.py:457-463). The input must
    carry a file_type column; rows route to the matching chunker and the
    results union (each branch prunes to its docs before chunking, so the
    window/groupBy work only touches its own partition of the corpus)."""
    is_page = F.col(file_type_col).isin(*PAGE_CHUNK_TYPES)
    page_part = page_chunks(
        extracted.filter(is_page).drop(file_type_col)
    ).withColumn("chunk_type", F.lit("page"))
    md_part = markdown_chunks(
        extracted.filter(~is_page).drop(file_type_col)
    ).withColumn("chunk_type", F.lit("markdown"))
    return page_part.unionByName(md_part)


def markdown_chunks(extracted: DataFrame) -> DataFrame:
    """Heading-section chunks with size/overlap splitting and title carry."""
    e = _with_page(exploded_spans(extracted))
    is_h1 = (F.col("kind") == "heading") & F.col("text").startswith("# ")
    w_inc = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = e.withColumn("sec", F.sum(is_h1.cast("int")).over(w_inc))
    sections = e.groupBy("doc_id", "sec").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(offset as o,"
            " text as t))), x -> x.t), '\n')"
        ).alias("content"),
        F.max(F.when(is_h1, F.col("text"))).alias("title"),
        F.min("page").alias("page0"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length("content") - F.lit(CHUNK_OVERLAP)) / F.lit(float(_STRIDE))),
    ).cast("int")
    pieces = sections.select(
        "doc_id",
        "sec",
        "title",
        "page0",
        "content",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    ).select(
        "doc_id",
        "sec",
        "title",
        "page0",
        "k",
        F.col("content")
        .substr(F.col("k") * _STRIDE + 1, F.lit(CHUNK_SIZE))
        .alias("content"),
    )
    w_chunk = Window.partitionBy("doc_id").orderBy("sec", "k")
    chunk_id = (F.row_number().over(w_chunk) - 1).cast("long")
    return pieces.select(
        F.concat_ws("-", "doc_id", chunk_id.cast("string")).alias("chunk_doc_id"),
        chunk_id.alias("chunk_id"),
        (F.col("page0") + 1).cast("long").alias("pg_number"),
        F.col("doc_id").alias("file_name"),
        "title",
        "content",
    )
