"""Int8 embedding quantization + quantized retrieval.

The memory side of ANN at 100 TB: a 3072-dim float32 corpus is 12 KB per
vector; symmetric int8 quantization cuts it 4x and turns the dot product
into integer arithmetic (SIMD-friendly, exact, fold-order-independent) —
the standard serving layout (FAISS SQ8 / ScaNN) where the quantized
score prefilters and a small exact re-rank restores precision. Reference
analog: the vector index the repo queries (test-query.ipynb cell-4) —
this is the compressed form such an index stores.

Determinism contract (same discipline as the cosine family,
BENCH/BASELINE.md "cosine arithmetic note"): every float op is a single
IEEE double op identical on both engines (widen float32 -> double,
divide, +0.5, floor), and all accumulations are INTEGER sums or MAX
folds — order-independent, so no engine's fold order can drift an ulp.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

QUANT_MAX = 127  # symmetric int8 range

# engine-portable expression fragments -------------------------------------

_VD = "transform(embedding, x -> cast(x as double))"


def _q_scale(vd: str) -> str:
    """Per-vector scale: max|x| / 127, 1.0 for the all-zero vector (so
    the quantized vector is all-zero too instead of a 0/0)."""
    return (
        f"CASE WHEN aggregate({vd}, 0D, (m, x) -> greatest(m, abs(x))) = 0D"
        f" THEN 1D ELSE"
        f" aggregate({vd}, 0D, (m, x) -> greatest(m, abs(x))) / {QUANT_MAX}D"
        f" END"
    )


def _q_vec(vd: str, scale: str) -> str:
    """Round-half-up quantization via floor(x/scale + 0.5) — floor is
    the one rounding both engines define identically — clamped to the
    int8 range before the int cast."""
    return (
        f"transform({vd}, x -> cast(greatest(-{QUANT_MAX}D,"
        f" least({QUANT_MAX}D, floor(x / ({scale}) + 0.5D))) as int))"
    )


_Q_INORM2 = "aggregate({q}, 0L, (s, v) -> s + cast(v as bigint) * cast(v as bigint))"


def quantize_vec(vec) -> tuple[float, list[int] | None]:
    """Driver-side twin of the engine expressions (for the query
    parameter): identical IEEE double arithmetic in Python."""
    if vec is None:
        return 1.0, None
    max_abs = 0.0
    for x in vec:
        max_abs = max(max_abs, abs(float(x)))
    scale = 1.0 if max_abs == 0.0 else max_abs / QUANT_MAX
    q = [
        int(max(-QUANT_MAX, min(QUANT_MAX, math.floor(float(x) / scale + 0.5))))
        for x in vec
    ]
    return scale, q


def embedding_quantize(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column:
    (vec_id, scale, qvec array<int>, qnorm2, max_err).

    qnorm2 is the exact integer squared norm of the quantized vector
    (what the quantized cosine divides by); max_err is the worst
    per-element reconstruction error |x - q*scale| — by construction
    <= scale/2 + one ulp, the bound tests pin. One projection, zero
    shuffles, all folds order-independent (integer sums / max)."""
    scale = _q_scale(_VD)
    qv = _q_vec(_VD, scale)
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr(scale).alias("scale"),
        F.expr(qv).alias("qvec"),
        F.expr(_Q_INORM2.format(q=qv)).alias("qnorm2"),
        F.round(
            F.expr(
                f"aggregate(zip_with({_VD}, {qv},"
                f" (x, q) -> abs(x - cast(q as double) * ({scale}))),"
                f" 0D, (m, e) -> greatest(m, e))"
            ),
            6,
        ).alias("max_err"),
    )


def _duck_q_scale(vd: str) -> str:
    agg = (
        f"list_reduce(list_prepend(0.0::DOUBLE,"
        f" list_transform({vd}, x -> abs(x::DOUBLE))),"
        f" (m, x) -> greatest(m, x))"
    )
    return f"CASE WHEN {agg} = 0.0 THEN 1.0 ELSE {agg} / {QUANT_MAX}.0 END"


def _duck_q_vec(vd: str, scale: str) -> str:
    return (
        f"list_transform({vd}, x -> CAST(greatest(-{QUANT_MAX}.0,"
        f" least({QUANT_MAX}.0, floor(x::DOUBLE / ({scale}) + 0.5)))"
        f" AS INTEGER))"
    )


def _duck_q_inorm2(q: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform({q}, v -> CAST(v AS BIGINT) * v)),"
        f" (s, v) -> s + v)"
    )


def _duck_q_idot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform({a}, (v, i) -> CAST(v AS BIGINT) * {b}[i])),"
        f" (s, v) -> s + v)"
    )


EMBEDDING_QUANTIZE_SQL = f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id,
  {_duck_q_scale('embedding')} AS scale,
  {_duck_q_vec('embedding', _duck_q_scale('embedding'))} AS qvec,
  {_duck_q_inorm2(_duck_q_vec('embedding', _duck_q_scale('embedding')))}
    AS qnorm2,
  round(list_reduce(list_prepend(0.0::DOUBLE,
    list_transform({_duck_q_vec('embedding', _duck_q_scale('embedding'))},
      (q, i) -> abs(embedding[i]::DOUBLE
                    - q::DOUBLE * ({_duck_q_scale('embedding')})))),
    (m, e) -> greatest(m, e)), 6) AS max_err
FROM embeddings
"""


def _quantized_scores(emb: DataFrame, q_ints: list[int]) -> DataFrame:
    """(vec_id, qcos): integer dot of the quantized corpus against the
    quantized query literal over integer norms — scales cancel in the
    cosine, so qcos needs no float state per vector at all."""
    qlit = "array(" + ", ".join(str(int(v)) for v in q_ints) + ")"
    scale = _q_scale(_VD)
    qv = _q_vec(_VD, scale)
    idot = (
        f"aggregate(zip_with({qv}, {qlit},"
        f" (a, b) -> cast(a as bigint) * cast(b as bigint)),"
        f" 0L, (p, q) -> p + q)"
    )
    inorm = _Q_INORM2.format(q=qv)
    qn = sum(int(v) * int(v) for v in q_ints)
    cos = (
        f"CASE WHEN {inorm} = 0L OR {qn}L = 0L THEN NULL ELSE"
        f" cast({idot} as double)"
        f" / (sqrt(cast({inorm} as double)) * sqrt(cast({qn} as double)))"
        f" END"
    )
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round(F.expr(cos), 6).alias("qcos"),
    )


def quantized_cosine_topk(
    spark, sf_dir: str, query_id: int = 0, k: int = 5
) -> DataFrame:
    """Top-k by QUANTIZED cosine: both sides int8, the dot product and
    both norms exact integer sums (fold-order-free), one double divide
    at the end. The query parameter is quantized driver-side with the
    identical arithmetic (quantize_vec)."""
    from .retrieval import _emb, _fetch_qvec

    emb = _emb(spark, sf_dir)
    found, qraw = _fetch_qvec(spark, sf_dir, query_id)
    if not found or qraw is None:
        return spark.createDataFrame([], "vec_id long, qcos double")
    _, q_ints = quantize_vec(qraw)
    scored = _quantized_scores(emb, q_ints)
    return scored.orderBy(F.desc("qcos"), F.asc("vec_id")).limit(k)


def _duck_quantized_scores(query_id: int = 0) -> str:
    scale = _duck_q_scale("e.embedding")
    qv = _duck_q_vec("e.embedding", scale)
    qscale = _duck_q_scale("embedding")
    qq = _duck_q_vec("embedding", qscale)
    idot = _duck_q_idot(qv, "q.qq")
    inorm = _duck_q_inorm2(qv)
    qn = "q.qn"
    return f"""
q AS (
  SELECT {qq} AS qq, {_duck_q_inorm2(qq)} AS qn
  FROM embeddings WHERE vec_id = {query_id}
),
qscored AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
    round(CASE WHEN {inorm} = 0 OR {qn} = 0 THEN NULL ELSE
      ({idot})::DOUBLE / (sqrt(({inorm})::DOUBLE) * sqrt(({qn})::DOUBLE))
      END, 6) AS qcos
  FROM embeddings e, q
)
"""


QUANTIZED_COSINE_TOPK_SQL = f"""
WITH {_duck_quantized_scores().strip()}
SELECT vec_id, qcos FROM qscored
ORDER BY qcos DESC NULLS LAST, vec_id ASC LIMIT 5
"""


def quantized_rerank_topk(
    spark,
    sf_dir: str,
    query_id: int = 0,
    k: int = 5,
    n_candidates: int = 50,
) -> DataFrame:
    """The production serving shape (FAISS SQ8 / ScaNN): the int8 index
    prefilters to n_candidates by quantized cosine, then an EXACT
    double cosine re-ranks the candidates only — the corpus is scanned
    in compressed form, full-precision vectors are touched for
    n_candidates rows. Both cut boundaries round-6 BEFORE the limit so
    neither engine's raw-double ordering decides them."""
    from .retrieval import _cos_pairs_udf, _emb, _fetch_qvec

    emb = _emb(spark, sf_dir)
    found, qraw = _fetch_qvec(spark, sf_dir, query_id)
    if not found or qraw is None:
        return spark.createDataFrame(
            [], "vec_id long, qcos double, sim double"
        )
    _, q_ints = quantize_vec(qraw)
    cands = (
        _quantized_scores(emb, q_ints)
        .orderBy(F.desc("qcos"), F.asc("vec_id"))
        .limit(n_candidates)
    )
    qlit = F.array(*[F.lit(float(x)) for x in qraw]).cast("array<double>")
    vd = F.expr(_VD)
    rer = cands.join(emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding"), "vec_id").select(
        "vec_id",
        "qcos",
        F.round(_cos_pairs_udf()(vd, qlit), 6).alias("sim"),
    )
    return rer.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


def _duck_exact_cos(a: str, b: str) -> str:
    from .retrieval import _duck_cos

    return _duck_cos(a, b)


def _quantized_rerank_sql(k: int = 5, n_candidates: int = 50) -> str:
    from .retrieval import _duck_cos

    return f"""
WITH {_duck_quantized_scores().strip()},
qcands AS (
  SELECT vec_id, qcos FROM qscored
  ORDER BY qcos DESC NULLS LAST, vec_id ASC LIMIT {n_candidates}
),
qfull AS (SELECT embedding AS fq FROM embeddings WHERE vec_id = 0)
SELECT c.vec_id, c.qcos,
  round({_duck_cos('e.embedding', 'f.fq')}, 6) AS sim
FROM qcands c
JOIN embeddings e ON CAST(e.vec_id AS BIGINT) = c.vec_id
CROSS JOIN qfull f
ORDER BY sim DESC NULLS LAST, c.vec_id ASC LIMIT {k}
"""


QUANTIZED_RERANK_TOPK_SQL = _quantized_rerank_sql()
