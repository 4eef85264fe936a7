"""Deduplication operator family over the flat documents table.

Large-scale training-data pipeline operators (exact dedup, MinHash+LSH,
SimHash, n-gram Jaccard), each as a Spark DataFrame query built from
JVM-side expressions (no Python UDFs — hashing folds run inside
whole-stage codegen) and each with a bit-exact DuckDB oracle
(functions/hashing.py defines the shared arithmetic).

Scale posture:
- exact dedup: one hash-aggregate, map-side partial combine, AQE-coalesced.
- MinHash LSH: the only all-pairs-free near-dup path — band buckets bound
  candidate generation; the exact-Jaccard verification join touches only
  candidates. Band/row choice (8 bands x 2 rows) puts the S-curve knee
  near 0.5 so pairs at the 0.6 output threshold are caught w.p.
  1-(1-0.36)^8 ~ 0.97+, and near-identical variants w.p. ~1-3.5e-5.
- SimHash: 32-bit fingerprints; candidate pairing by fingerprint equality
  on rotated bands would be the 100TB path; here pairs are bounded by a
  doc_id cap for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    MINHASH_SEEDS,
    MOD,
    duck_polyhash_over_array,
    spark_polyhash_over_array,
)

N_BANDS = 8
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.6

# 3-word shingle hash array (distinct), bound via the single-element
# transform trick so split() evaluates once (see spanify.py).
_SHINGLES = (
    "element_at(transform(array(split(text, ' ')), ws ->"
    " CASE WHEN size(ws) >= 3 THEN"
    "   array_distinct(transform(sequence(0, size(ws) - 3),"
    "     i -> concat_ws(' ', slice(ws, i + 1, 3))))"
    " ELSE array(text) END), 1)"
)
_SHINGLE_HASHES = spark_polyhash_over_array(_SHINGLES)

_DUCK_SHINGLES = (
    "CASE WHEN len(ws) >= 3 THEN"
    " list_distinct(list_transform(range(CAST(len(ws) - 2 AS BIGINT)),"
    "   i -> array_to_string(ws[i + 1 : i + 3], ' ')))"
    " ELSE [text] END"
)


def _variant_corpus(docs: DataFrame) -> DataFrame:
    """documents + near-duplicate variants (last 2 words dropped), the
    deterministic near-dup testbed both engines construct identically."""
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    variant = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "element_at(transform(array(split(text, ' ')), ws ->"
            " array_join(slice(ws, 1, greatest(size(ws) - 2, 1)), ' ')), 1)"
        ).alias("text"),
    )
    return base.unionByName(variant)


DUCK_VARIANT_CORPUS = """
corpus AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) + 1000000 AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1 : greatest(len(string_split(text, ' ')) - 2, 1)],
           ' ') AS text
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Exact dedup (hash groupBy)
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group by a normalization key (first 2 words); keep min doc_id."""
    key = F.expr("concat_ws(' ', slice(split(text, ' '), 1, 2))")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


EXACT_DEDUP_SQL = """
SELECT array_to_string((string_split(text, ' '))[1:2], ' ') AS dup_key,
       COUNT(*) AS n_docs,
       MIN(CAST(doc_id AS BIGINT)) AS keeper_doc_id
FROM documents
GROUP BY 1
HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    corpus = _variant_corpus(docs)
    base = corpus.select(
        "doc_id", F.expr(_SHINGLE_HASHES).alias("sh")
    )
    mh_exprs = [
        f"coalesce(array_min(transform(sh, h -> ({a}L * h + {b}L) % {MOD})), {MOD})"
        for a, b in MINHASH_SEEDS
    ]
    mh = base.select(
        "doc_id",
        "sh",
        F.expr("array(" + ", ".join(mh_exprs) + ")").alias("mh"),
    )
    band_expr = (
        "transform(sequence(0, {nb} - 1), b -> concat_ws('_',"
        " cast(b as string),"
        " cast(element_at(mh, b * {r} + 1) as string),"
        " cast(element_at(mh, b * {r} + 2) as string)))"
    ).format(nb=N_BANDS, r=ROWS_PER_BAND)
    bands = mh.select(
        "doc_id", F.explode(F.expr(band_expr)).alias("band_key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sh = base
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


MINHASH_LSH_SQL = f"""
WITH {DUCK_VARIANT_CORPUS.strip()},
sh_base AS (
  SELECT doc_id,
         {duck_polyhash_over_array(_DUCK_SHINGLES)} AS sh
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM corpus)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
  FROM sh_base a JOIN sh_base b ON a.doc_id < b.doc_id
),
jac AS (
  SELECT id_a, id_b,
    round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
          / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 4)
      AS jaccard
  FROM pairs
)
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# SimHash fingerprints (+ bounded hamming pairs)
# ---------------------------------------------------------------------------

_WORD_HASHES = spark_polyhash_over_array("split(text, ' ')")

_SIMHASH_EXPR = f"""
element_at(transform(array({_WORD_HASHES}), wh ->
  aggregate(sequence(0, 31), 0L, (fp, j) ->
    fp + IF(
      aggregate(wh, 0L, (acc, h) ->
        acc + IF((shiftright(h, j) & 1) = 1, 1L, -1L)) > 0,
      shiftleft(1L, j), 0L))
), 1)
"""


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(_SIMHASH_EXPR).alias("simhash"),
    )


def simhash_pairs(docs: DataFrame, max_doc_id: int = 300, max_dist: int = 8) -> DataFrame:
    fp = simhash_fingerprints(docs.filter(F.col("doc_id") < max_doc_id))
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )


from ..functions.hashing import duck_polyhash  # noqa: E402

_DUCK_SIMHASH_BASE = f"""
words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, UNNEST(string_split(text, ' ')) AS w
  FROM documents
),
whash AS (
  SELECT doc_id, {duck_polyhash('w')} AS h FROM words
),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM whash, (SELECT UNNEST(range(32)) AS j)
  GROUP BY doc_id, j
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""

SIMHASH_FP_SQL = f"""
WITH {_DUCK_SIMHASH_BASE}
SELECT doc_id, simhash FROM fp
"""

SIMHASH_PAIRS_SQL = f"""
WITH {_DUCK_SIMHASH_BASE}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE a.doc_id < 300 AND b.doc_id < 300
  AND bit_count(xor(a.simhash, b.simhash)) <= 8
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, bounded all-pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, max_doc_id: int = 150) -> DataFrame:
    base = docs.filter(F.col("doc_id") < max_doc_id).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(_SHINGLE_HASHES).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.size(F.array_intersect("a.sh", "b.sh")).cast("long").alias("n_inter"),
            (F.size("a.sh") + F.size("b.sh")).cast("long").alias("n_sum"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_sum") - F.col("n_inter")).cast("double"), 4
            ).alias("jaccard"),
        )
    )


NGRAM_JACCARD_SQL = f"""
WITH sh_base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {duck_polyhash_over_array(_DUCK_SHINGLES)} AS sh
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        WHERE doc_id < 150)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
    AS jaccard
FROM sh_base a JOIN sh_base b ON a.doc_id < b.doc_id
"""
