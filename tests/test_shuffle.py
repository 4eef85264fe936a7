"""Deterministic corpus shuffle + shuffled packing: permutation and
two-phase-rank properties on hand frames and the real corpus; DuckDB
parity runs in tests/test_oracle_parity.py via the EXTRA gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import curation as C

SF = "/root/testdata/sf0.001"


def _mk(spark, n):
    return spark.createDataFrame(
        [(i, f"word{i} text", "en") for i in range(n)],
        "doc_id long, text string, lang string",
    )


def _py_key(doc_id: int) -> int:
    """Python twin of the x^5 mod p shuffle key."""
    p = C.SHUFFLE_MOD
    x = (doc_id + C.SHUFFLE_SEED) % p
    return pow(x, 5, p)


def test_shuffle_rank_is_permutation(spark):
    n = 257
    rows = C.shuffle_rank(_mk(spark, n)).collect()
    assert sorted(r["shuffle_rank"] for r in rows) == list(range(n))
    # x^5 mod p keys are collision-free below the Mersenne modulus and
    # match the Python twin exactly
    assert len({r["shuffle_key"] for r in rows}) == n
    assert all(r["shuffle_key"] == _py_key(r["doc_id"]) for r in rows)
    # rank order == (key, doc_id) order — the flat spec
    by_rank = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_rank"])]
    want = [d for _, d in sorted((r["shuffle_key"], r["doc_id"]) for r in rows)]
    assert by_rank == want
    # actually SHUFFLED: contiguous ids decorrelate everywhere — the
    # longest monotone doc_id run in epoch order stays short (an affine
    # key left 0..44487 in identity order; see the SHUFFLE_SEED note)
    longest = run = 1
    for a, b in zip(by_rank, by_rank[1:]):
        run = run + 1 if b > a else 1
        longest = max(longest, run)
    assert longest <= 10, by_rank[:40]


def test_shuffle_rank_deterministic_and_partition_independent(spark):
    df = _mk(spark, 100)
    a = {r["doc_id"]: r["shuffle_rank"] for r in C.shuffle_rank(df).collect()}
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in C.shuffle_rank(df.repartition(7)).collect()
    }
    assert a == b


def test_shuffle_rank_no_unpartitioned_data_window(spark):
    """The only ORDER-BY-without-PARTITION window must be the bounded
    block-totals cumsum (n_blocks rows), same allowance as
    pack_sequences — the data window is block-partitioned."""
    df = C.shuffle_rank(_mk(spark, 64))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    wins = re.findall(r"Window .*", plan)
    assert any("partitionBy" not in w or "sblock" in w for w in wins)
    # within-block ranking window carries the block partition key
    assert any("sblock" in w for w in wins)


def test_shuffled_pack_matches_flat_recompute(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r for r in C.shuffled_pack(docs).collect()}
    ranks = {
        r["doc_id"]: r["shuffle_rank"]
        for r in C.shuffle_rank(docs).collect()
    }
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(F.split("text", " ")).cast("long").alias("n"),
        ).collect()
    }
    # flat reference: cumsum in rank order
    order = sorted(ranks, key=lambda d: ranks[d])
    off = 0
    for d in order:
        r = got[d]
        assert r["shuffle_rank"] == ranks[d]
        assert r["start_offset"] == off
        assert r["first_seq"] == off // C.PACK_SEQ_LEN
        assert r["last_seq"] == (off + toks[d] - 1) // C.PACK_SEQ_LEN
        off += toks[d]
    assert len(got) == len(order)


def test_shuffle_rank_property_arbitrary_ids(spark):
    """Hypothesis-style property over adversarial id sets (one Spark run
    over the union for speed): ranks are a dense permutation and agree
    with the Python-twin (key, doc_id) order — including ids >= 2^31-1
    where the pre-fold makes keys collide and the doc_id tie-break must
    decide."""
    p = C.SHUFFLE_MOD
    ids = sorted(
        {0, 1, 2, p - 2, p - 1, p, p + 1, 2 * p, 2 * p + 1,
         3_000_000_000, 2**40, 2**40 + p, 7, 48271, 2**62 // p * p}
    )
    df = spark.createDataFrame(
        [(i, "x y", "en") for i in ids], "doc_id long, text string, lang string"
    )
    rows = C.shuffle_rank(df).collect()
    assert sorted(r["shuffle_rank"] for r in rows) == list(range(len(ids)))
    assert all(r["shuffle_key"] == _py_key(r["doc_id"]) for r in rows)
    want = [d for _, d in sorted((_py_key(d), d) for d in ids)]
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_rank"])]
    assert got == want
    # the p-fold collision actually occurs in this set (doc_id and
    # doc_id + p share a key), so the tie-break is exercised
    keys = [_py_key(d) for d in ids]
    assert len(set(keys)) < len(ids)
