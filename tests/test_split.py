"""Train/val/test split assignment + cross-split near-dup leakage."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import curation as C

SF = "/root/testdata/sf0.001"

_QH_A = 1103515245
_QH_B = 12345
_QH_MOD = 2_147_483_647


def _py_label(doc_id: int) -> str:
    b = ((doc_id % _QH_MOD) * _QH_A + _QH_B) % _QH_MOD % 100
    if b < C.SPLIT_TRAIN_PCT:
        return "train"
    if b < C.SPLIT_TRAIN_PCT + 1:
        return "val"
    return "test"


def test_split_assign_matches_python_twin_exactly(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = C.split_assign(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["split"] == _py_label(r["doc_id"]), r["doc_id"]


def test_split_assign_is_plain_projection(spark):
    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = physical_plan(C.split_assign(docs))
    assert "Exchange" not in p and "Join" not in p and "Window" not in p


def test_split_leakage_rows_cross_splits_and_subset_of_pairs(spark):
    from gpt4ocontentextraction_spark.cached import release_all
    from gpt4ocontentextraction_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    release_all()
    leak = C.split_leakage(docs).collect()
    release_all()
    all_pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    release_all()
    assert leak, "seeded variant corpus must produce cross-split pairs"
    for r in leak:
        assert r["split_a"] != r["split_b"]
        assert r["jaccard"] >= JACCARD_THRESHOLD
        assert (r["id_a"], r["id_b"]) in all_pairs
        assert r["split_a"] == _py_label(r["id_a"])
        assert r["split_b"] == _py_label(r["id_b"])
