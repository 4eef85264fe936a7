"""The relational (codegen'd vote aggregation) and single-expression
simhash forms must be value-identical — the expression form is the
semantics spec, the relational form is the fast path the operators use."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def test_simhash_forms_equal(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fast = sorted(
        tuple(r) for r in dedup.simhash_fingerprints(docs).collect()
    )
    spec = sorted(
        tuple(r) for r in dedup.simhash_fingerprints_expr(docs).collect()
    )
    assert fast == spec
    assert len(fast) == docs.count()


def test_simhash_empty_text_is_zero(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "alpha beta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in
           dedup.simhash_fingerprints(docs).collect()}
    spec = {r["doc_id"]: r["simhash"] for r in
            dedup.simhash_fingerprints_expr(docs).collect()}
    assert got == spec
    assert got[1] == 0  # all vote sums negative -> every bit 0


def test_minhash_vectorized_equals_expr_spec(spark):
    """The numpy encoder (production path) must produce exactly the pairs
    of the JVM-lambda spec form (VERDICT r2 finding #5)."""
    from gpt4ocontentextraction_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_expr,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in minhash_lsh_pairs(docs).collect())
    b = sorted(tuple(r) for r in minhash_lsh_pairs_expr(docs).collect())
    assert a and a == b


def test_minhash_null_text_parity_with_expr_spec(spark):
    """NULL document text must flow through the vectorized encoder with
    the expression spec's semantics, not crash the pandas UDF. The spec
    (ANSI): sh = [NULL], minhashes coalesce to the MOD sentinel, so null
    docs pair with EACH OTHER at jaccard 1.0 (array_intersect of [null]
    with [null]) but never with real docs."""
    from gpt4ocontentextraction_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_expr,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),
            (2, "the quick brown fox jumps over the dog"),
            (3, None),
            (4, None),
            (5, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in minhash_lsh_pairs(docs).collect())
    b = sorted(tuple(r) for r in minhash_lsh_pairs_expr(docs).collect())
    assert a == b
    assert (3, 4, 1.0) in a  # null docs are mutual duplicates
    assert not any(  # ...but never pair with real docs
        (3 in p[:2] or 4 in p[:2]) and (1 in p[:2] or 5 in p[:2]) for p in a
    )


def test_simhash64_all_bits_vary(spark):
    """Fingerprint bits 31 and 63 must be real functions of the text:
    both word polyhashes are 31-bit values, so without the mix hash
    (_simhash64_bit_expr) those two positions are constant zero and two
    of the four 16-bit bands silently halve their key space."""
    from gpt4ocontentextraction_spark.operators.dedup import (
        simhash64_fingerprints,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = [r["simhash64"] for r in simhash64_fingerprints(docs).collect()]
    for j in (31, 63):
        assert {(fp >> j) & 1 for fp in fps} == {0, 1}, f"bit {j} is dead"


def test_duplicated_ngram_spans_hand_case(spark):
    """Two docs sharing one exact 8-gram: exactly those two positions are
    flagged (cnt=2); every other position's gram is unique. A doc
    shorter than n yields no grams at all; null text drops out."""
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"x {shared} y"),
            (2, f"{shared} z z z"),
            (3, "too short"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = dedup.duplicated_ngram_spans(docs, n=8, min_count=2).collect()
    got = sorted((r["doc_id"], r["pos"], r["gram"], r["cnt"]) for r in rows)
    assert got == [(1, 1, shared, 2), (2, 0, shared, 2)]


def test_duplicated_ranges_merges_runs(spark):
    """Overlapping flagged grams merge into one maximal range; disjoint
    repeats in the same doc yield separate ranges."""
    shared = "a b c d e f g h i"  # 9 words -> two overlapping 8-grams
    other = "p q r s t u v w"     # 8 words -> one 8-gram
    docs = spark.createDataFrame(
        [
            (1, f"{shared} gap1 gap2 gap3 {other}"),
            (2, f"{shared} tail"),
            (3, other),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_grams"])
        for r in dedup.duplicated_ranges(docs, n=8, min_count=2).collect()
    )
    # doc 1: words 0..8 duplicated (grams at pos 0,1 merge), then the
    # `other` block at words 12..19 (one gram at pos 12)
    # doc 2: words 0..8; doc 3: words 0..7
    assert rows == [
        (1, 0, 8, 2),
        (1, 12, 19, 1),
        (2, 0, 8, 2),
        (3, 0, 7, 1),
    ]
