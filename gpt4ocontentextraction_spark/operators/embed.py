"""M8: deterministic embedding (reference: generate_embedding,
docker/main.py:277-323 / doc2md_utils.py:273-308 — an Azure OpenAI call).

Tests need no network, so the rebuilt operator is a deterministic hash
embedding: dims derive from the text's polyhash with pure integer
arithmetic, then normalize to [-0.5, 0.5). The reference returns None for
texts shorter than 10 chars (doc2md_utils.py:278-279) — preserved as a
NULL-vector filter. JVM-side expressions only; bit-exact DuckDB oracle.

    v_j = ((h * (j+1) + j*j + 13) mod 1000003) / 1000003 - 0.5
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import duck_polyhash, spark_polyhash

DIMS = 16
_P = 1_000_003
MIN_CHARS = 10  # embedding-skip threshold


def embed(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, vector array<double>); short texts get NULL."""
    h = spark_polyhash(text_col)
    # bind the text hash once (see spanify.py on the transform-let trick)
    vec = (
        f"element_at(transform(array({h}), hv ->"
        f" transform(sequence(0, {DIMS - 1}), j ->"
        f" ((hv * (j + 1) + j * j + 13) % {_P}) / cast({_P} as double) - 0.5)"
        f"), 1)"
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.length(text_col) >= MIN_CHARS, F.expr(vec)
        ).alias("vector"),
    )


def embed_exploded(docs: DataFrame) -> DataFrame:
    """Oracle-comparable shape: (doc_id, dim, val)."""
    e = embed(docs).filter(F.col("vector").isNotNull())
    return e.select(
        "doc_id", F.posexplode("vector").alias("dim", "val")
    ).select(
        "doc_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("val", 6).alias("val"),
    )


EMBED_SQL = f"""
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {duck_polyhash('text')} AS hv
  FROM documents WHERE length(text) >= {MIN_CHARS}
)
SELECT doc_id, CAST(j AS BIGINT) AS dim,
  round(((hv * (j + 1) + j * j + 13) % {_P}) / CAST({_P} AS DOUBLE) - 0.5, 6)
    AS val
FROM h, (SELECT UNNEST(range({DIMS})) AS j)
"""
