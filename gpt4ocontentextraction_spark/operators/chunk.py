"""C1-C4: chunking strategies (reference: docker/main.py:450-539).

Two strategies, as in the reference's `vectorize_markdown` dispatch
(page for PPT/XLS/images, markdown for PDF/DOCX/HTML — docker/main.py:457-463):

- :func:`page_chunks` — one chunk per page, content prefixed ``||pg||``
  (`vectorize_by_page`, docker/main.py:479-500);
- :func:`markdown_chunks` — reference-faithful heading chunking
  (`vectorize_by_markdown`, docker/main.py:502-539): sections split on
  BOTH '# ' and '## ' headings (headers_to_split_on, main.py:53-58,
  strip_headers=False so the heading stays in content), oversized
  sections split into CHUNK_SIZE windows advancing by CHUNK_SIZE -
  CHUNK_OVERLAP chars, then a per-doc sequential carry over chunks:
  pg_number updates from the chunk's first ``||N||`` marker only when the
  chunk doesn't start with ``||`` (main.py:516-518); ``last_heading``
  lags one chunk (title and prefix use the pre-update value,
  main.py:521,535-537); content is prefixed
  ``||{pg-1}||\\n{last_heading}\\n`` (main.py:521). The reference's
  recursive splitter prefers separator boundaries; this engine uses a
  deterministic fixed-stride window — same size/overlap contract, fully
  relational (and therefore oracle-checkable).

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


def _sections(extracted: DataFrame) -> DataFrame:
    """(doc_id, sec, content): heading-delimited sections ('# ' and '## ',
    heading line kept — MarkdownHeaderTextSplitter with strip_headers=False,
    docker/main.py:53-61)."""
    e = exploded_spans(extracted)
    is_sec = (F.col("kind") == "heading") & (
        F.col("text").startswith("# ") | F.col("text").startswith("## ")
    )
    w_inc = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = e.withColumn("sec", F.sum(is_sec.cast("int")).over(w_inc))
    return e.groupBy("doc_id", "sec").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(offset as o,"
            " text as t))), x -> x.t), '\n')"
        ).alias("content"),
    )


def markdown_chunks(extracted: DataFrame) -> DataFrame:
    """Reference-faithful heading-section chunks (see module docstring)."""
    sections = _sections(extracted)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length("content") - F.lit(CHUNK_OVERLAP)) / F.lit(float(_STRIDE))),
    ).cast("int")
    pieces = sections.select(
        "doc_id",
        "sec",
        "content",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    ).select(
        "doc_id",
        "sec",
        F.col("k").cast("long").alias("k"),
        F.col("content")
        .substr(F.col("k") * _STRIDE + 1, F.lit(CHUNK_SIZE))
        .alias("t"),
    )
    return _carry_and_emit(pieces)


def markdown_chunks_separator(extracted: DataFrame) -> DataFrame:
    """C3 separator mode: windows END at the last paragraph break
    ``\\n\\n`` (else last newline, else last space, else hard cut) found
    in the window's 820-char overlap tail — the full separator hierarchy
    of RecursiveCharacterTextSplitter (docker/main.py:63-65: separators
    ``["\\n\\n", "\\n", " "]``), made deterministic and oracle-checkable.
    Overlap stays exactly CHUNK_OVERLAP; non-final chunks span
    (STRIDE, CHUNK_SIZE] chars; a paragraph-break cut ends at the pair's
    SECOND newline so the next chunk starts at a paragraph head.

    The cut recurrence is sequential per section (next start depends on
    the previous cut), which Catalyst cannot express — so splitting runs
    in mapInPandas with a per-SECTION (not per-row-of-text) Python loop;
    the unit of Python work is a whole multi-KB section, a handful of
    iterations each. The carry stage stays relational, shared with the
    default mode."""
    import pandas as pd

    sections = _sections(extracted)

    def split(batches):
        for pdf in batches:
            out = {"doc_id": [], "sec": [], "k": [], "t": []}
            for doc_id, sec, content in zip(
                pdf["doc_id"], pdf["sec"], pdf["content"]
            ):
                start, k = 1, 0  # 1-based, mirrors the SQL oracle
                length = len(content)
                while True:
                    if length - start + 1 <= CHUNK_SIZE:
                        t = content[start - 1:]
                        cut = length
                    else:
                        tail = content[
                            start - 1 + _STRIDE: start - 1 + CHUNK_SIZE
                        ]
                        p2 = tail.rfind("\n\n")
                        if p2 >= 0:
                            pos = p2 + 1  # end at the pair's 2nd newline
                        else:
                            pos = tail.rfind("\n")
                            if pos < 0:
                                pos = tail.rfind(" ")
                            if pos < 0:
                                pos = CHUNK_OVERLAP - 1
                        cut = start + _STRIDE + pos
                        t = content[start - 1: cut]
                    out["doc_id"].append(doc_id)
                    out["sec"].append(sec)
                    out["k"].append(k)
                    out["t"].append(t)
                    if cut >= length:
                        break
                    start = cut - CHUNK_OVERLAP + 1
                    k += 1
            yield pd.DataFrame(out)

    pieces = sections.mapInPandas(
        split, "doc_id string, sec long, k long, t string"
    )
    return _carry_and_emit(pieces)


def _carry_and_emit(pieces: DataFrame) -> DataFrame:
    """The reference's sequential carry loop over chunks (doc_id, sec, k,
    t), as windowed forward-fills; shared by both splitting modes."""
    marked = pieces.select(
        "doc_id",
        "sec",
        "k",
        "t",
        # last '# ' line of the RAW chunk text (find_last_heading_level_1
        # over the prefixed text reduces to this, because the prefix's
        # heading line is the carried value itself)
        F.try_element_at(
            F.filter(
                F.split("t", "\n"), lambda x: x.startswith("# ")
            ),
            F.lit(-1),
        ).alias("h1"),
        F.when(
            F.substring("t", 1, 2) != "||",
            F.nullif(
                F.regexp_extract("t", r"\|\|(\d+)\|\|", 1), F.lit("")
            ).cast("long"),
        ).alias("upd"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("sec", "k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cur = (
        Window.partitionBy("doc_id")
        .orderBy("sec", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = marked.select(
        "doc_id",
        "sec",
        "k",
        "t",
        F.coalesce(F.last("h1", ignorenulls=True).over(w_prev), F.lit("")).alias("lh"),
        F.coalesce(F.last("upd", ignorenulls=True).over(w_cur), F.lit(1)).alias("pg"),
    )
    w_chunk = Window.partitionBy("doc_id").orderBy("sec", "k")
    chunk_id = (F.row_number().over(w_chunk) - 1).cast("long")
    return carried.select(
        F.concat_ws("-", "doc_id", chunk_id.cast("string")).alias("chunk_doc_id"),
        chunk_id.alias("chunk_id"),
        F.col("pg").cast("long").alias("pg_number"),
        F.col("doc_id").alias("file_name"),
        F.col("lh").alias("title"),
        F.concat(
            F.lit("||"),
            (F.col("pg") - 1).cast("string"),
            F.lit("||\n"),
            F.col("lh"),
            F.lit("\n"),
            F.col("t"),
        ).alias("content"),
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking (RAG / embedding-input shape): fixed word window
# with stride overlap. The reference chunks by page or heading+size
# (doc2md_utils.py:207-260); overlapping windows are the standard third
# strategy for dense retrieval, so the dispatcher family carries it too.
# Zero shuffle: one transform(sequence(...)) projection per document.
# ---------------------------------------------------------------------------

WINDOW_WORDS = 64
WINDOW_STRIDE = 32


def window_chunks(
    docs: DataFrame,
    window: int = WINDOW_WORDS,
    stride: int = WINDOW_STRIDE,
) -> DataFrame:
    """documents(doc_id, text) -> overlapping word windows. Window k
    covers words[k*stride .. k*stride+window-1]; the last window starts
    at the smallest multiple of stride reaching the end, so every word
    is covered and short docs yield exactly one window."""
    n_w = (
        f"CASE WHEN size(ws) <= {window} THEN 1 "
        f"ELSE int((size(ws) - {window} + {stride} - 1) div {stride}) + 1 END"
    )
    expr = f"""
    element_at(transform(array(split(text, ' ')), ws ->
      transform(sequence(0, ({n_w}) - 1), k -> named_struct(
        'chunk_id', bigint(k),
        'content', array_join(slice(ws, k * {stride} + 1, {window}), ' '),
        'n_words', bigint(size(slice(ws, k * {stride} + 1, {window})))
      ))
    ), 1)
    """
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.expr(expr)).alias("c"),
        )
        .select("doc_id", "c.*")
    )


WINDOW_CHUNKS_SQL = f"""
WITH w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS ws
  FROM documents
),
idx AS (
  SELECT doc_id, ws,
    UNNEST(range(CASE WHEN len(ws) <= {WINDOW_WORDS} THEN 1
      ELSE (len(ws) - {WINDOW_WORDS} + {WINDOW_STRIDE} - 1)
           // {WINDOW_STRIDE} + 1 END)) AS k
  FROM w
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
  array_to_string(
    ws[k * {WINDOW_STRIDE} + 1 : k * {WINDOW_STRIDE} + {WINDOW_WORDS}], ' ')
    AS content,
  CAST(len(ws[k * {WINDOW_STRIDE} + 1 : k * {WINDOW_STRIDE} + {WINDOW_WORDS}])
    AS BIGINT) AS n_words
FROM idx
"""
