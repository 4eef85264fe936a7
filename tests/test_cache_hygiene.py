"""Operator-internal persists must not accumulate across a gate sweep
(VERDICT r3 finding #4): every .persist() an operator takes is tracked
(cached.track) and released by the next wrapped gate query / an explicit
release_all(), so a long-lived session composing gate queries holds at
most one query's cache at a time."""

from __future__ import annotations

from gpt4ocontentextraction_spark.cached import n_persistent, release_all

SF = "/root/testdata/sf0.001"


def test_persisting_queries_release_clean(spark):
    """Materialize the heaviest persisting operators back-to-back with a
    release between them (as the gate wrapper does); afterwards the
    context holds zero persisted RDDs."""
    from gpt4ocontentextraction_spark.driver_contract import (
        EXTRA_QUERIES,
        QUERIES,
    )

    lookup = {**EXTRA_QUERIES, **QUERIES}
    release_all()  # isolate from any earlier test's tracked persists
    for name in (
        "minhash_lsh",
        "simhash64_pairs_banded",
        "embedding_neardup_lsh",
        "hybrid_topk",
    ):
        lookup[name](spark, SF).count()
        release_all()
    assert n_persistent(spark) == 0


def test_gate_wrapper_releases_previous_query(spark):
    """__spark_entry__.queries() wrappers call release_all() on entry, so
    running query B drops query A's persists without any explicit call."""
    import importlib
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()

    release_all()
    qs["minhash_lsh"](spark, SF).count()
    assert n_persistent(spark) > 0  # minhash's signature table is cached
    # building the NEXT query releases the previous query's persists
    df = qs["exact_dedup"](spark, SF)
    assert n_persistent(spark) == 0
    df.count()
    release_all()


def test_release_since_is_scoped(spark):
    """ADVICE r4 #3: an iterative operator (the Lloyd loop) must be able
    to release ITS OWN per-iteration entries without dropping another
    operator's tracked persists — mark()/release_since() scope the
    release to entries added after the mark."""
    from gpt4ocontentextraction_spark import cached

    cached.release_all()
    outer = cached.track(spark.range(10).toDF("x"))
    outer.count()
    m = cached.mark()
    inner = cached.track(spark.range(5).toDF("y"))
    inner.count()
    assert cached.release_since(m) == 1  # released ONLY the inner entry
    assert outer.storageLevel.useMemory  # outer persist still in force
    assert cached.release_all() == 1  # outer was still tracked
