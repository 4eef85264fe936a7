"""Unit tests for bloom_incremental_dedup (dedup.py): exactness under
forced false positives, no-false-negative construction, and the plan
shape (codegen membership filter; anti-join fed only by the candidate
sliver). The oracle-parity sweep covers the sf0.001/sf0.01 gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_vs_anti_join_on_hand_corpus(spark):
    new = _df(
        spark,
        [(i, f"doc text number {i}") for i in range(40)]
        + [(100, "shared alpha"), (101, "shared beta"), (102, None)],
    )
    prior = _df(
        spark,
        [(900, "shared alpha"), (901, "shared beta"), (902, "only prior")],
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in dedup.bloom_incremental_dedup(new, prior).collect()
    )
    want = sorted((i, f"doc text number {i}") for i in range(40))
    assert got == want  # shared texts dropped, NULL text dropped


def test_exact_under_forced_false_positives(spark):
    """m=64 bits with 30 prior texts saturates the filter — nearly every
    new row becomes a bloom candidate — yet the verification anti-join
    keeps the result exact."""
    new = _df(spark, [(i, f"new {i}") for i in range(50)])
    prior = _df(spark, [(1000 + i, f"prior {i}") for i in range(30)])
    bloom = dedup.bloom_build(prior, m=64, k=3)
    n_cand = (
        new.filter(
            dedup._bloom_might_contain(bloom, F.col("text"), 64, 3)
        ).count()
    )
    assert n_cand > 0  # the saturation actually produced false positives
    got = dedup.bloom_incremental_dedup(new, prior, m=64, k=3).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(50))


def test_no_false_negatives(spark):
    """Every prior text must register as a bloom candidate (a false
    negative would silently re-ingest a duplicate)."""
    prior = _df(spark, [(i, f"snapshot doc {i * 17}") for i in range(200)])
    bloom = dedup.bloom_build(prior)
    hits = prior.filter(
        dedup._bloom_might_contain(
            bloom, F.col("text"), dedup.BLOOM_M_BITS, dedup.BLOOM_K
        )
    ).count()
    assert hits == 200


def test_plan_candidate_sliver_feeds_join(spark):
    """The definitely-new leg must be a pure filter (no join); the
    anti-join's left side must carry the bloom membership condition so
    only candidates shuffle."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = dedup.bloom_incremental_dedup(docs, dedup.prior_snapshot(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan and "shiftleft" in plan
    assert "EvalPython" not in plan
    # exactly one join in the whole plan — the candidate verification
    assert plan.count("LeftAnti") == 1


# ---------------------------------------------------------------------------
# minhash_incremental (near-dup: new batch vs prior snapshot)
# ---------------------------------------------------------------------------


def test_minhash_incremental_sides_only(spark):
    """Pairs must span the two sides only — a near-dup pair WITHIN the
    prior (or within the new batch) must not surface."""
    prior = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # dup INSIDE prior
            (3, "completely unrelated text about spark shuffles and joins"),
        ],
    )
    new = _df(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "another unrelated document about bloom filters here"),
        ],
    )
    got = dedup.minhash_incremental(new, prior).collect()
    pairs = {(r["prior_id"], r["new_id"]) for r in got}
    assert pairs == {(1, 100), (2, 100)}
    assert all(r["jaccard"] == 1.0 for r in got)


def test_minhash_incremental_no_self_join_sides(spark):
    """Plan shape: exactly one band equality join between the two
    sides, no cartesian/nested-loop anywhere."""
    prior = _df(spark, [(1, "a b c d e f g h i j k l")])
    new = _df(spark, [(2, "a b c d e f g h i j k l")])
    plan = (
        dedup.minhash_incremental(new, prior)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# ingest_dedup (composed exact + near incremental decision)
# ---------------------------------------------------------------------------


def test_ingest_dedup_outcomes(spark):
    prior = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today fine"),
            (2, "spark shuffles partition data across the cluster nodes"),
        ],
    )
    new = _df(
        spark,
        [
            # verbatim copy -> exact dup AND near dup of 1
            (100, "the quick brown fox jumps over the lazy dog today fine"),
            # last word changed -> near dup only
            (101, "the quick brown fox jumps over the lazy dog today once"),
            # novel -> keep
            (102, "completely novel content about bloom filters and bands"),
        ],
    )
    got = {r["doc_id"]: r for r in dedup.ingest_dedup(new, prior).collect()}
    assert got[100]["is_exact_dup"] == 1
    assert got[100]["near_dup_of"] == 1 and got[100]["jaccard"] == 1.0
    assert got[100]["keep"] == 0
    assert got[101]["is_exact_dup"] == 0
    assert got[101]["near_dup_of"] == 1 and 0 < got[101]["jaccard"] < 1
    assert got[101]["keep"] == 0
    assert got[102]["is_exact_dup"] == 0
    assert got[102]["near_dup_of"] is None and got[102]["jaccard"] is None
    assert got[102]["keep"] == 1


def test_ingest_dedup_best_pick_deterministic(spark):
    """Two equally-good prior matches: the min prior_id wins."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    prior = _df(spark, [(7, text), (3, text)])
    new = _df(spark, [(100, text)])
    got = dedup.ingest_dedup(new, prior).collect()[0]
    assert got["near_dup_of"] == 3 and got["jaccard"] == 1.0
