"""SemDeDup semantics (operators/retrieval.py::semdedup_pairs): the
cluster-then-prune policy on the variant corpus, the paper's keeper rule
(prune the member nearer its centroid), and the bounded-pair scale shape.
The full-relation oracle equality runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import retrieval as R

SF = "/root/testdata/sf0.001"


def _vcorpus(spark):
    """The engine's own variant corpus, collected (1k x 64 at sf0.001)
    — the property check must score the exact vectors the engine
    clustered, not a hand replica of the perturbation."""
    rows = R._variant_embeddings(R._emb(spark, SF)).collect()
    return {r["vec_id"]: r["v"] for r in rows if r["v"] is not None}


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):  # sequential fold, same as the engine/oracle
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (na**0.5 * nb**0.5)


def test_semdedup_prunes_variant_pairs(spark):
    rows = R.semdedup_pairs(spark, SF).collect()
    assert len(rows) >= 300  # the planted base/variant pairs qualify
    assert all(r["sim"] >= 0.99 for r in rows)
    assert all(r["id_kept"] != r["id_pruned"] for r in rows)
    n_variant_pairs = sum(
        1 for r in rows if abs(r["id_kept"] - r["id_pruned"]) == 1_000_000
    )
    assert n_variant_pairs >= 300


def test_semdedup_keeper_rule(spark):
    """Within every pruned pair the PRUNED member sits at least as close
    to its (shared) centroid as the kept one — SemDeDup keeps the
    outlier; ties prune the larger id."""
    rows = R.semdedup_pairs(spark, SF).collect()
    vecs = _vcorpus(spark)
    cents = {cid: vecs[cid] for cid in range(R.SEMDEDUP_K)}

    def best(vid):
        sims = [(c, _cos(vecs[vid], cv)) for c, cv in cents.items()]
        # argmax, ties to lowest cid — same rule as both engines
        c, s = max(sims, key=lambda t: (t[1], -t[0]))
        return c, s

    for r in rows[:50]:
        ck, sk = best(r["id_kept"])
        cp, sp = best(r["id_pruned"])
        assert ck == cp  # pairs only form within one cluster
        assert sp > sk or (sp == sk and r["id_pruned"] > r["id_kept"])


def test_semdedup_k_bounds_pairs(spark):
    """More clusters -> fewer-or-equal candidate pairs ON THIS CORPUS
    (a deterministic fixture, so this is a stable regression pin, not a
    theorem — K=64 cells are not refinements of K=8 cells, so a pair
    split at K=8 could in principle co-locate at K=64). The knob that
    bounds per-cluster pair sets at scale is cluster count; this pins
    that raising it doesn't blow the candidate set up here."""
    n8 = R.semdedup_pairs(spark, SF, n_clusters=8).count()
    n64 = R.semdedup_pairs(spark, SF, n_clusters=64).count()
    assert n64 <= n8


def test_semdedup_grouped_bit_identical(spark):
    """The grouped production path (per-cluster kernels, each vector
    shipped once) returns the EXACT row multiset of the join-shaped
    spec form at both cluster counts — including every rounded sim,
    which only holds because the kernels accumulate in the same IEEE
    fold order (a BLAS dot's pairwise summation would drift ulps)."""
    for k in (8, 64):
        spec = sorted(
            map(tuple, R.semdedup_pairs(spark, SF, n_clusters=k).collect())
        )
        grouped = sorted(
            map(
                tuple,
                R.semdedup_pairs_grouped(spark, SF, n_clusters=k).collect(),
            )
        )
        assert grouped == spec and len(spec) > 0
