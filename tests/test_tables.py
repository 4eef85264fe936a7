"""sources/tables.py: binaryFile directory scans (S2/S3), DDL (S8),
Iceberg-gated reader fallback."""

from __future__ import annotations

import os

from gpt4ocontentextraction_spark.sources import tables as tb


def test_iceberg_not_available_here(spark):
    assert tb.iceberg_available(spark) is False  # sandbox has no jar


def test_read_documents_parquet_fallback(spark):
    df = tb.read_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() == 500


def test_scan_binary_dir_recursive(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.bin").write_bytes(b"hello")
    (tmp_path / "sub" / "b.bin").write_bytes(b"world!")
    (tmp_path / "skip.txt").write_text("no")

    rows = tb.scan_binary_dir(
        spark, str(tmp_path), recursive=True, glob="*.bin"
    ).collect()
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in rows}
    assert got == {"a.bin": b"hello", "b.bin": b"world!"}
    assert all(r["length"] == len(bytes(r["content"])) for r in rows)

    flat = tb.scan_binary_dir(
        spark, str(tmp_path), recursive=False, glob="*.bin"
    ).collect()
    assert {os.path.basename(r["path"]) for r in flat} == {"a.bin"}


def test_create_or_replace_table_ddl(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS t_ddl LOCATION '{tmp_path}/db'")
    try:
        tb.create_or_replace_table(
            spark,
            "t_ddl.idx",
            "doc_id string, vector array<float>",
            location=f"{tmp_path}/idx",
        )
        cols = [f.name for f in spark.table("t_ddl.idx").schema.fields]
        assert cols == ["doc_id", "vector"]
        # delete+create semantics: replace succeeds
        tb.create_or_replace_table(
            spark, "t_ddl.idx", "doc_id string", location=f"{tmp_path}/idx2"
        )
        assert [f.name for f in spark.table("t_ddl.idx").schema.fields] == [
            "doc_id"
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ddl.idx")
        spark.sql("DROP DATABASE IF EXISTS t_ddl")


def test_jsonl_roundtrip_through_text_files(spark, tmp_path):
    """Export documents as real .jsonl text files and read them back:
    the full file-level round trip, not just the expression pair."""
    from gpt4ocontentextraction_spark.sources.tables import (
        documents_to_jsonl,
        jsonl_to_documents,
    )
    from gpt4ocontentextraction_spark.spanify import spanify

    docs = spark.createDataFrame(
        [(7, 'alpha "beta" \\ gamma delta & eps zeta eta theta')],
        "doc_id long, text string",
    )
    src = spanify(docs)
    path = str(tmp_path / "docs.jsonl")
    documents_to_jsonl(src).write.mode("overwrite").text(path)
    back = jsonl_to_documents(spark.read.text(path))
    a = [tuple(r) for r in src.selectExpr("doc_id", "inline(spans)").collect()]
    b = [tuple(r) for r in back.selectExpr("doc_id", "inline(spans)").collect()]
    assert sorted(a) == sorted(b) and len(a) > 0
