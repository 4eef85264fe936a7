"""Magic-byte content-type sniffing (functions/sniff.py)."""

from __future__ import annotations

from gpt4ocontentextraction_spark.functions.sniff import sniff_type
from gpt4ocontentextraction_spark.plans.inspect import assert_no_exchange


def test_sniff_magic_table(spark):
    rows = [
        (1, b"%PDF-1.4 rest"),
        (2, b"PK\x03\x04zipdata"),
        (3, b"\x89PNG\r\n\x1a\npixels"),
        (4, b"GIF89a..."),
        (5, b"BMv4..."),
        (6, b"<html><body>x</body></html>"),
        (7, b"plain prose"),
        (8, b"PDF-like but no percent"),  # near-miss -> text
        (9, b"PK\x05\x06 end-of-central-dir only"),  # not the local header
        (10, b"RIFF\x24\x08\x00\x00WAVEfmt rest"),
        (11, b"RIFF\x24\x08\x00\x00AVI listdata"),  # note the space: AVI
        (12, b"\xff\xd8\xff\xe0\x00\x10JFIF"),
        (13, b"RIFF\x24\x08\x00\x00AVIX no-space fourcc"),  # near-miss
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r.file_type for r in sniff_type(df).collect()}
    assert got == {
        1: "pdf",
        2: "office-zip",
        3: "png",
        4: "gif",
        5: "bmp",
        6: "html",
        7: "text",
        8: "text",
        9: "text",
        10: "wav",
        11: "avi",
        12: "jpeg",
        13: "text",
    }


def test_sniff_is_projection(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, b"%PDF-x")], "doc_id long, content binary"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "b"))
    out = sniff_type(spark.read.parquet(str(tmp_path / "b")))
    assert_no_exchange(out)
