"""Focused unit checks on the chunkers' 8192/820 window math and title
carry (C3 contract, docker/main.py:50-51,502-539 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.chunk import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    markdown_chunks,
    page_chunks,
)
from gpt4ocontentextraction_spark.operators.extract import extract


def _chunks(spark, classes):
    pdf, _ = make_corpus(seed=99, docs_per_class=3, classes=classes)
    return markdown_chunks(extract(corpus_to_spark(spark, pdf))).collect()


def test_markdown_chunk_window_math(spark):
    rows = _chunks(spark, ("docx_headings",))
    assert rows
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["file_name"], []).append(r)
    saw_split = False
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        # ids dense from 0
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert len(c["content"]) <= CHUNK_SIZE
            assert c["chunk_doc_id"] == f"{doc}-{c['chunk_id']}"
        # consecutive chunks of the same section overlap by CHUNK_OVERLAP
        for a, b in zip(chunks, chunks[1:]):
            if a["title"] == b["title"] and len(a["content"]) == CHUNK_SIZE:
                saw_split = True
                assert a["content"][-CHUNK_OVERLAP:] == b["content"][:CHUNK_OVERLAP]
    assert saw_split, "fixture should force at least one 8192/820 split"


def test_title_carry(spark):
    rows = _chunks(spark, ("docx_headings",))
    for r in rows:
        assert r["title"] is None or r["title"].startswith("# ")
        if r["title"]:
            # the carried title is the section's own heading line
            assert r["content"].startswith(r["title"]) or r["chunk_id"] > 0


def test_page_chunks_marker_prefix(spark):
    pdf, _ = make_corpus(seed=17, docs_per_class=3, classes=("pptx_slides",))
    rows = page_chunks(extract(corpus_to_spark(spark, pdf))).collect()
    assert rows
    for r in rows:
        assert r["content"].startswith(f"||{r['pg_number']}||\n")
        assert r["title"] is None
        assert r["chunk_id"] == r["pg_number"]
