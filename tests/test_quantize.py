"""Int8 embedding quantization: reconstruction bound, driver-side twin
equality, quantized-vs-exact retrieval recall, and plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import quantize as Q
from gpt4ocontentextraction_spark.operators import retrieval as R
from gpt4ocontentextraction_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"


def test_quantize_reconstruction_bound(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = Q.embedding_quantize(emb).collect()
    assert len(out) == emb.count()
    for r in out:
        # round-half-up quantization: worst per-element error <= scale/2.
        # max_err is round-6'd for the oracle hash, so it can land up to
        # half a 1e-6 quantum ABOVE the exact bound — allow that quantum.
        assert r["max_err"] <= r["scale"] / 2 + 5.0001e-7
        assert all(-127 <= v <= 127 for v in r["qvec"])
        assert r["qnorm2"] == sum(v * v for v in r["qvec"])
        # symmetric scaling: the largest element quantizes to +-127
        assert max(abs(v) for v in r["qvec"]) == 127 or r["qnorm2"] == 0


def test_quantize_vec_matches_engine(spark):
    # the driver-side twin (used for the query parameter) must produce
    # exactly the engine's quantization for every corpus vector
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    engine = {
        r["vec_id"]: (r["scale"], list(r["qvec"]))
        for r in Q.embedding_quantize(emb).collect()
    }
    raw = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, vec in raw.items():
        scale, q = Q.quantize_vec(vec)
        assert (scale, q) == (engine[vid][0], engine[vid][1]), vid


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in Q.embedding_quantize(df).collect()}
    assert out[0]["scale"] == 1.0
    assert list(out[0]["qvec"]) == [0, 0, 0]
    assert out[0]["qnorm2"] == 0
    # max element -> +-127, half-scale element -> round(63.5) = 64 up
    assert list(out[1]["qvec"]) == [64, -127, 32]


def test_quantized_topk_recall_vs_exact(spark):
    # int8 cosine ranks ~the same neighborhood as exact cosine: the
    # exact top-5 must be contained in the quantized top-20 (the
    # prefilter guarantee quantized_rerank_topk builds on)
    exact = [r["vec_id"] for r in R.cosine_topk(spark, SF, k=5).collect()]
    quant = [
        r["vec_id"]
        for r in Q.quantized_cosine_topk(spark, SF, k=20).collect()
    ]
    assert set(exact) <= set(quant)


def test_quantized_rerank_restores_exact_order(spark):
    # re-ranking the quantized candidates with the exact cosine must
    # reproduce the exact brute-force top-k
    exact = [
        (r["vec_id"], r["sim"])
        for r in R.cosine_topk(spark, SF, k=5).collect()
    ]
    rer = [
        (r["vec_id"], r["sim"])
        for r in Q.quantized_rerank_topk(spark, SF, k=5).collect()
    ]
    assert rer == exact


def test_quantized_scan_has_no_shuffle_before_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = Q.quantized_cosine_topk(spark, SF, k=5)
    plan = physical_plan(df)
    # compressed-index scan: scan -> project -> TakeOrderedAndProject,
    # no Exchange other than the top-k's own singlePartition gather
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan
