"""Unit tests for the C4 heuristic filters (curation.c4_filters,
Raffel et al. 2020 §2.2) on hand corpora — the oracle-parity sweep
covers the seeded sf0.001/sf0.01 gate; these pin each rule's semantics
and the zero-shuffle plan shape."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import curation


GOOD = "one two three four five six."  # passes every line rule


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in curation.c4_filters(docs).collect()}


def test_line_rules_isolated(spark):
    got = _run(
        spark,
        [
            # each doc: 3 GOOD lines + one line violating exactly 1 rule
            (1, "\n".join([GOOD, GOOD, GOOD, "one two three four five"])),
            (2, "\n".join([GOOD, GOOD, GOOD, "too short."])),
            (3, "\n".join([GOOD, GOOD, GOOD,
                           "please enable JavaScript to continue."])),
            (4, "\n".join([GOOD, GOOD, GOOD])),  # all pass
        ],
    )
    for d in (1, 2, 3, 4):
        assert got[d]["keep"] == 1
        assert got[d]["cleaned"] == "\n".join([GOOD] * 3)
    assert (got[1]["n_nopunct"], got[1]["n_short"], got[1]["n_js"]) == (1, 0, 0)
    assert (got[2]["n_nopunct"], got[2]["n_short"], got[2]["n_js"]) == (0, 1, 0)
    assert (got[3]["n_nopunct"], got[3]["n_short"], got[3]["n_js"]) == (0, 0, 1)
    assert got[4]["n_lines"] == got[4]["n_kept"] == 3


def test_terminal_punctuation_variants(spark):
    got = _run(
        spark,
        [
            (1, "does it end in a question mark?"),
            (2, "it ends with a bang one two!"),
            (3, 'he said "quote words one two three"'),
            (4, "trailing whitespace is trimmed first six words.   "),
        ],
    )
    for d in (1, 2, 3, 4):
        assert got[d]["n_nopunct"] == 0, d
        assert got[d]["n_kept"] == 1, d


def test_document_rules(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    got = _run(
        spark,
        [
            (1, "\n".join([GOOD, GOOD])),  # < 3 kept lines
            (2, three + "\nsome Lorem Ipsum filler text here."),
            (3, three + "\nif (x) { return y; } end of line."),
            (4, three),
        ],
    )
    assert (got[1]["keep"], got[1]["cleaned"]) == (0, "")
    # lorem/brace poison both documents even though the lines pass
    assert (got[2]["keep"], got[2]["cleaned"]) == (0, "")
    assert (got[3]["keep"], got[3]["cleaned"]) == (0, "")
    assert (got[4]["keep"], got[4]["cleaned"]) == (1, three)
    # blank lines count against both punctuation and length rules
    got2 = _run(spark, [(9, GOOD + "\n\n" + GOOD)])
    assert got2[9]["n_nopunct"] == 1 and got2[9]["n_short"] == 1
    assert got2[9]["n_kept"] == 2


def test_null_text_dropped(spark):
    got = _run(spark, [(1, None), (2, GOOD)])
    assert set(got) == {2}


def test_seeded_gate_fires_every_rule(spark):
    """The sf0.001 seeded gate must exercise all rules non-degenerately
    (the embedding_neardup lesson: a gate that only proves emptiness
    proves nothing)."""
    from gpt4ocontentextraction_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = curation.c4_filters(
        curation.seed_c4(dedup.reflow_lines(docs))
    ).collect()
    keeps = {r["keep"] for r in res}
    assert keeps == {0, 1}
    assert sum(r["n_nopunct"] for r in res) > 0
    assert sum(r["n_short"] for r in res) > 0
    assert sum(r["n_js"] for r in res) > 0
    assert any(
        r["keep"] == 0 and r["n_kept"] >= curation.C4_MIN_KEPT_LINES
        for r in res
    )  # some docs die on the lorem/brace DOCUMENT rules specifically


def test_plan_zero_exchange(spark):
    """Every rule is doc-local: the operator must stay one codegen'd
    projection — no Exchange, no Python (BatchEvalPython/ArrowEval)."""
    docs = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = (
        curation.c4_filters(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_fused_kernel_equals_composed(spark):
    """The gate's fused Arrow kernel arm must be row-identical to the
    composed relational chain it replaces — on the seeded sf0.001 gate
    corpus AND on hand frames hitting every rule edge (empty text,
    embedded newline inside a raw word, poison-doc ids)."""
    from gpt4ocontentextraction_spark.operators import dedup

    def both(docs):
        a = sorted(
            map(tuple, curation.c4_filters_fused(docs).collect())
        )
        b = sorted(
            map(
                tuple,
                curation.c4_filters_fused(
                    docs, use_kernel=False
                ).collect(),
            )
        )
        return a, b

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a, b = both(docs)
    assert a == b and len(a) > 0

    hand = spark.createDataFrame(
        [
            (0, ""),  # empty text; also the %37 poison id
            (3, None),  # dropped
            (44, "word with\nnewline inside plus more words here"),
            (85, "x " * 40),  # %41==3 poison id, trailing-space words
            (7, "a"),
        ],
        "doc_id long, text string",
    )
    a, b = both(hand)
    assert a == b and len(a) == 4


def test_fused_plan_zero_exchange(spark):
    """The fused arm stays shuffle-free: one ArrowEvalPython
    projection, no Exchange, no joins."""
    docs = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = (
        curation.c4_filters_fused(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
