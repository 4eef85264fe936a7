"""Product quantization (operators/pq.py): codebook invariants, code
coverage, ADC + rerank behavior, encode plan shape."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import pq
from gpt4ocontentextraction_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"


def _embeds(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebook_membership_partitions_corpus(spark):
    rows = pq.pq_codebooks(_embeds(spark)).collect()
    n_vec = _embeds(spark).count()
    for s in range(pq.PQ_M):
        # component pos 0 of every centroid in subspace s: members sum to n
        members = [r.n_members for r in rows if r.sub == s and r.pos == 0]
        assert sum(members) == n_vec
        assert all(m > 0 for m in members)
    # every present centroid has all PQ_D components
    keys = {(r.sub, r.j) for r in rows}
    for (s, j) in keys:
        assert len([r for r in rows if (r.sub, r.j) == (s, j)]) == pq.PQ_D


def test_codes_cover_every_vector_and_subspace(spark):
    rows = pq.pq_codes(_embeds(spark)).collect()
    n_vec = _embeds(spark).count()
    assert len(rows) == n_vec * pq.PQ_M
    assert all(0 <= r.code < pq.PQ_K for r in rows)
    cb = {(r.sub, r.j) for r in pq.pq_codebooks(_embeds(spark)).collect()}
    assert all((r.sub, r.code) in cb for r in rows)


def test_adc_topk_query_first_and_exact_sorted(spark):
    rows = pq.pq_adc_topk(spark, _embeds(spark)).collect()
    assert len(rows) == pq.PQ_TOPK
    assert rows[0].vec_id == pq.PQ_QUERY_ID and rows[0].exact_dist == 0
    exacts = [r.exact_dist for r in rows]
    assert exacts == sorted(exacts)
    # rerank restored exact order among candidates: adc order need not
    # match exact order, but every adc_dist is a genuine LUT sum >= 0
    assert all(r.adc_dist >= 0 for r in rows)


def test_encode_is_projection(spark):
    cents = pq._final_centroids(_embeds(spark))
    q = pq.quantized(_embeds(spark))
    from pyspark.sql import functions as F

    coded = q.select(
        "vec_id",
        *[
            F.expr(pq._argmin_code_expr(s, cents[s])).alias(f"c{s}")
            for s in range(pq.PQ_M)
        ],
    )
    plan = physical_plan(coded)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kernel_equals_literal_spec(spark):
    """r6 re-lowering pin: the Arrow-batched numpy kernel path
    (use_kernel=True, the production lowering) is bit-identical to the
    literal-expression spec twin on every PQ relation — quantization,
    codebook training, encode, ADC and exact rerank all integer/IEEE
    -identical."""
    emb = _embeds(spark)
    for fn, key in (
        (lambda u: pq.pq_codebooks(emb, use_kernel=u), ["sub", "j", "pos"]),
        (lambda u: pq.pq_codes(emb, use_kernel=u), ["vec_id", "sub"]),
        (lambda u: pq.pq_adc_topk(spark, emb, use_kernel=u), None),
    ):
        k = fn(True)
        l = fn(False)
        if key is not None:
            k, l = k.orderBy(*key), l.orderBy(*key)
        assert [tuple(r) for r in k.collect()] == [
            tuple(r) for r in l.collect()
        ]
