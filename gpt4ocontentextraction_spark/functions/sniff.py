"""Content-type sniffing from magic bytes (the file-type dispatch input).

The reference dispatches per-file processing on the filename extension
(docker/main.py:457-463 `file_extension in ['pptx', ...]`); at corpus
scale extensions lie, so real pipelines sniff the leading bytes. This is
the standard magic-number table for the formats the reference routes
(PDF, office-zip, PNG/GIF/BMP images, HTML) as ONE pure-JVM projection
over a binary column — `hex(substring(bin, ...))` prefix equality, no
Python, no shuffle — mirrored exactly in DuckDB (`hex(substr(blob, ...))`).

| sniffed     | magic |
|-------------|-------|
| pdf         | 25 50 44 46 2D (``%PDF-``) |
| office-zip  | 50 4B 03 04 (``PK\\x03\\x04`` — docx/xlsx/pptx container) |
| png         | 89 50 4E 47 0D 0A 1A 0A |
| jpeg        | FF D8 FF |
| gif         | 47 49 46 38 (``GIF8``) |
| bmp         | 42 4D (``BM``) |
| wav         | 52 49 46 46 (``RIFF``) + bytes 9-12 ``WAVE`` |
| avi         | 52 49 46 46 (``RIFF``) + bytes 9-12 ``AVI `` |
| html        | first byte ``<`` (tag start) |
| text        | anything else |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_type", "SNIFF_CASE_SQL"]


def _case(hexpr) -> str:
    """Shared CASE over hex slices; `hexpr(n, start=1)` -> SQL for the
    hex of n bytes from 1-based byte offset `start` (engine-specific)."""
    return f"""
CASE
  WHEN {hexpr(5)} = '255044462D' THEN 'pdf'
  WHEN {hexpr(4)} = '504B0304' THEN 'office-zip'
  WHEN {hexpr(8)} = '89504E470D0A1A0A' THEN 'png'
  WHEN {hexpr(3)} = 'FFD8FF' THEN 'jpeg'
  WHEN {hexpr(4)} = '47494638' THEN 'gif'
  WHEN {hexpr(4)} = '52494646' AND {hexpr(4, 9)} = '57415645' THEN 'wav'
  WHEN {hexpr(4)} = '52494646' AND {hexpr(4, 9)} = '41564920' THEN 'avi'
  WHEN {hexpr(2)} = '424D' THEN 'bmp'
  WHEN {hexpr(1)} = '3C' THEN 'html'
  ELSE 'text'
END
"""


def sniff_type(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Add `file_type` sniffed from `bin_col`'s leading bytes."""
    expr = _case(
        lambda n, start=1:
        f"upper(hex(substring({bin_col}, {start}, {n})))"
    )
    return df.withColumn("file_type", F.expr(expr))


def sniff_case_sql(bin_col: str) -> str:
    """DuckDB twin of the sniff CASE for a BLOB column (DuckDB has no
    BLOB substr, so slice the hex string: byte n = hex chars 2n)."""
    return _case(
        lambda n, start=1:
        f"upper(substr(hex({bin_col}), {2 * start - 1}, {2 * n}))"
    )


SNIFF_CASE_SQL = sniff_case_sql("content")
