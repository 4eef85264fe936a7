"""Corpus-level exact line dedup: hand-computed cases pin the
first-occurrence keep rule, blank-line passthrough, whole-doc removal,
and the reflow view's word-block geometry."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import dedup


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["cleaned"], r["n_removed"])
        for r in dedup.line_dedup(docs).collect()
    }


def test_first_occurrence_kept_corpus_wide(spark):
    got = _run(
        spark,
        [(1, "x\ny\nx"), (2, "y\nz")],
    )
    # doc 1: second 'x' removed (its first occurrence is doc1 pos0);
    # doc 2: 'y' removed (first occurrence is doc1 pos1)
    assert got[1] == ("x\ny", 1)
    assert got[2] == ("z", 1)


def test_blank_lines_always_kept(spark):
    got = _run(spark, [(1, "a\n\na"), (2, "\n\n")])
    assert got[1] == ("a\n", 1)  # blank kept, duplicate 'a' removed
    assert got[2] == ("\n\n", 0)  # all-blank doc intact


def test_whitespace_only_lines_are_blank(spark):
    # '  ' trims to '' -> structural, kept even when repeated
    got = _run(spark, [(1, "  \n  \nw")])
    assert got[1] == ("  \n  \nw", 0)


def test_whole_doc_removed_to_empty(spark):
    got = _run(spark, [(1, "dup"), (2, "dup")])
    assert got[1] == ("dup", 0)
    assert got[2] == ("", 1)


def test_intra_doc_duplicates_removed(spark):
    got = _run(spark, [(7, "s\ns\ns")])
    assert got[7] == ("s", 2)


def test_null_text_docs_dropped(spark):
    got = _run(spark, [(1, None), (2, "k")])
    assert set(got) == {2}
    assert got[2] == ("k", 0)


def test_leading_trailing_space_variants_are_one_key(spark):
    # trim() defines the key, the ORIGINAL line text is what survives
    got = _run(spark, [(1, " p\np "), (2, "p")])
    assert got[1] == (" p", 1)
    assert got[2] == ("", 1)


def test_reflow_lines_geometry(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.reflow_lines(docs, words_per_line=2).collect()
    }
    assert got[1] == "a b\nc d\ne"
    assert got[2] == ""
    assert got[3] is None


def test_hashed_arm_identical_on_hand_corpus(spark):
    rows = [
        (1, "x\ny\nx"),
        (2, "y\nz"),
        (3, "  \n\nx"),
        (4, None),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = sorted(tuple(r) for r in dedup.line_dedup(docs).collect())
    hashed = sorted(
        tuple(r) for r in dedup.line_dedup_hashed(docs).collect()
    )
    assert plain == hashed


def test_hashed_arm_identical_on_reflowed_corpus(spark):
    docs = dedup.reflow_lines(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    plain = sorted(tuple(r) for r in dedup.line_dedup(docs).collect())
    hashed = sorted(
        tuple(r) for r in dedup.line_dedup_hashed(docs).collect()
    )
    assert plain == hashed
    assert sum(r[2] for r in plain) > 0  # the corpus really deduped
