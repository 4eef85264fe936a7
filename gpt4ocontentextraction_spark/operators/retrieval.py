"""Retrieval-side operators (SURVEY.md §2.6) + ANN over embeddings.

Q1 hybrid top-k becomes brute-force cosine top-k (the reference delegates
ANN to Azure Search — test-query.ipynb cell-4; the *data* semantics we own
are similarity + top-k). An IVF-bucketed variant is the 100-TB scale path:
assign every vector to its nearest of K coarse centroids (here: the first
K vectors, a deterministic stand-in for k-means), search only the query's
bucket. Q2 keyword top-k scores exact term hits. Q4 citation resolution
joins retrieval hits back to content.

Dot products run JVM-side: ``aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)``
is a sequential IEEE-double fold — bit-identical to the DuckDB oracle's
``list_reduce`` sum, so even float outputs hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 10
IVF_K = 8  # coarse centroids
KEYWORDS = ("table", "data", "merge")


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (p, q) -> p + q)"


def _cos(a: str, b: str) -> str:
    return f"{_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE,"
        f" list_transform({a}, (x, i) -> x::DOUBLE * {b}[i]::DOUBLE)),"
        f" (p, q) -> p + q)"
    )


def _duck_cos(a: str, b: str) -> str:
    return f"{_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)}))"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def cosine_topk(spark, sf_dir, query_id: int = 0, k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k against the embedding of vec_id=query_id."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round(F.expr(_cos("embedding", "qv")), 6).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       round({_duck_cos('e.embedding', 'q.qv')}, 6) AS sim
FROM embeddings e, q
ORDER BY sim DESC, vec_id ASC
LIMIT {TOP_K}
"""


def ivf_topk(spark, sf_dir, query_id: int = 0, k: int = 5) -> DataFrame:
    """IVF-bucketed ANN: nearest of the first IVF_K vectors = bucket;
    search only the query's bucket (the scale path: per-bucket locality,
    broadcast centroids, no all-pairs)."""
    emb = _emb(spark, sf_dir)
    cents = (
        emb.filter(F.col("vec_id") < IVF_K)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cid",
            F.expr(_cos("embedding", "cv")).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("csim"), F.asc("cid")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("bucket"))
    )
    qb = assigned.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket"),
        F.col("embedding").alias("qv"),
    )
    in_bucket = assigned.join(
        F.broadcast(qb), assigned.bucket == qb.qbucket
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("bucket").cast("long").alias("bucket"),
        F.round(F.expr(_cos("embedding", "qv")), 6).alias("sim"),
    )
    return in_bucket.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


IVF_TOPK_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {_duck_cos('e.embedding', 'c.cv')} DESC, c.cid ASC) AS rn
  FROM embeddings e, cents c
),
bucketed AS (
  SELECT vec_id, embedding, cid AS bucket FROM assigned WHERE rn = 1
),
q AS (SELECT bucket AS qbucket, embedding AS qv FROM bucketed WHERE vec_id = 0)
SELECT CAST(b.vec_id AS BIGINT) AS vec_id,
       CAST(b.bucket AS BIGINT) AS bucket,
       round({_duck_cos('b.embedding', 'q.qv')}, 6) AS sim
FROM bucketed b, q
WHERE b.bucket = q.qbucket
ORDER BY sim DESC, vec_id ASC
LIMIT 5
"""


# --- Hyperplane-LSH embedding near-dup (the production path) ---------------
#
# Candidate generation: K deterministic pseudo-random hyperplanes; each
# vector's signature is the K sign bits of its projections, split into
# EMB_BANDS bands of EMB_BAND_BITS bits. Two vectors are candidates iff
# some band matches exactly (equality self-join — never a nested loop).
# Exact cosine is then verified on candidates only. Unlike SimHash bands
# there is no pigeonhole guarantee (bits are independent projections),
# but at the 0.99 threshold a pair differs per bit w.p. theta/pi ~ 0.005,
# so P(miss) ~ (1-(1-0.005)^8)^4 ~ 3e-6 per true pair; the gate proves
# recall=1 on the corpus by equality with the exact all-pairs oracle.
# At 100 TB the verify join touches only candidate pairs; bucket sizes are
# n / 2^EMB_BAND_BITS per band on random data.

EMB_PLANES = 32
EMB_BANDS = 4
EMB_BAND_BITS = 8
EMB_NEARDUP_THRESHOLD = 0.99
_EMB_P = 1_000_003


def _plane(k: str, j: str) -> str:
    """Deterministic hyperplane weight w(k, j) in [-0.5, 0.5)."""
    return (
        f"(((9176 * ({k} + 1) + 5171 * ({j} + 1) * ({j} + 1) + 13)"
        f" % {_EMB_P}) / cast({_EMB_P} as double) - 0.5)"
    )


def _variant_embeddings(emb: DataFrame) -> DataFrame:
    """embeddings + deterministically perturbed near-duplicate variants
    (cos ~ 0.9998 to their base) — the near-dup testbed both engines
    construct bit-identically (float->double cast then the same IEEE adds)."""
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    variant = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(v, (x, i) ->"
            " x + ((vec_id + i) % 7 - 3) * 0.001d)"
        ).alias("v"),
    )
    return base.unionByName(variant)


DUCK_VARIANT_EMBEDDINGS = """
base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
vcorpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(v, (x, i) ->
           x + ((vec_id + (i - 1)) % 7 - 3) * 0.001) AS v
  FROM base
)
"""


def embedding_neardup_lsh(
    spark, sf_dir, threshold: float = EMB_NEARDUP_THRESHOLD
) -> DataFrame:
    """Production embedding near-dup: hyperplane-LSH banded candidates +
    exact-cosine verify over the (uncapped) variant corpus."""
    vecs = _variant_embeddings(_emb(spark, sf_dir))
    # sign bits of the K projections; v is a materialized column, so the
    # per-(k, j) lambda touches only an O(1) element_at (no re-inlined
    # subexpression — see spanify.py's binding note)
    sig_expr = (
        f"transform(sequence(0, {EMB_PLANES - 1}), k ->"
        f" IF(aggregate(sequence(0, size(v) - 1), 0D,"
        f" (acc, j) -> acc + element_at(v, j + 1) * {_plane('k', 'j')})"
        f" > 0D, 1, 0))"
    )
    band_expr = (
        f"transform(sequence(0, {EMB_BANDS - 1}), b -> concat_ws('_',"
        f" cast(b as string),"
        f" concat_ws('', transform(slice(sig, b * {EMB_BAND_BITS} + 1,"
        f" {EMB_BAND_BITS}), x -> cast(x as string)))))"
    )
    sigs = vecs.select("vec_id", "v", F.expr(sig_expr).alias("sig"))
    bands = sigs.select(
        "vec_id", "v", F.explode(F.expr(band_expr)).alias("band_key")
    )
    a = bands.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "band_key"
    )
    b = bands.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "band_key"
    )
    cand = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(F.expr(_cos("va", "vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


EMBEDDING_NEARDUP_LSH_SQL = f"""
WITH {DUCK_VARIANT_EMBEDDINGS.strip()},
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_duck_cos('a.v', 'b.v')}, 6) AS sim
  FROM vcorpus a JOIN vcorpus b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM scored WHERE sim >= {EMB_NEARDUP_THRESHOLD}
"""


def embedding_neardup_pairs(
    spark, sf_dir, max_id: int = 200, threshold: float = 0.8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs in a bounded id block — a
    VERIFICATION utility (recall audits on samples); the production path
    is embedding_neardup_lsh."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < max_id)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.round(F.expr(_cos("va", "vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


EMBEDDING_NEARDUP_SQL = f"""
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
       round({_duck_cos('a.embedding', 'b.embedding')}, 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 200 AND b.vec_id < 200
  AND round({_duck_cos('a.embedding', 'b.embedding')}, 6) >= 0.8
"""


def keyword_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Q2: exact term-hit scoring, top-k (docker/main.py:802-807 top=5)."""
    arr = "array(" + ", ".join(f"'{w}'" for w in KEYWORDS) + ")"
    score = F.expr(
        f"size(filter(split(text, ' '), w -> array_contains({arr}, w)))"
    ).cast("long")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


KEYWORD_TOPK_SQL = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
    " CAST(len(list_filter(string_split(text, ' '),"
    " w -> list_contains(["
    + ", ".join(f"'{w}'" for w in KEYWORDS)
    + "], w))) AS BIGINT) AS score"
    " FROM documents ORDER BY score DESC, doc_id ASC LIMIT 5"
)
