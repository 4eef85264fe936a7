"""Character-class entropy + deflate compression signals: hand-computed
semantics on tiny frames, corpus invariants, and (for char_entropy) the
no-Exchange plan pin. DuckDB parity for char_entropy runs in
tests/test_oracle_parity.py via the EXTRA gate."""

from __future__ import annotations

import math
import zlib

from gpt4ocontentextraction_spark.operators import textstats as T

SF = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_entropy_hand_semantics(spark):
    df = _mk(
        spark,
        [
            (1, "aaaa"),  # single class -> 0 bits
            (2, "aA1 "),  # four classes, one char each -> 2 bits
            (3, ""),  # empty -> NULL entropy/ratios
            (4, None),  # NULL counts as '' (coalesce)
            (5, "ab12"),  # 2+2 split -> 1 bit
        ],
    )
    out = {r["doc_id"]: r for r in T.char_entropy(df).collect()}
    assert out[1]["n_chars"] == 4 and out[1]["c_lower"] == 4
    assert out[1]["class_entropy"] == 0.0
    assert out[2]["class_entropy"] == 2.0
    assert out[2]["alpha_frac"] == 0.5 and out[2]["digit_frac"] == 0.25
    for d in (3, 4):
        assert out[d]["n_chars"] == 0
        assert out[d]["class_entropy"] is None
        assert out[d]["alpha_frac"] is None and out[d]["digit_frac"] is None
    assert out[5]["class_entropy"] == 1.0
    # punctuation falls in c_other and the counts always sum to n_chars
    r = T.char_entropy(_mk(spark, [(9, "a.B 7,#")])).collect()[0]
    assert r["c_other"] == 3
    assert (
        r["c_lower"] + r["c_upper"] + r["c_digit"] + r["c_space"] + r["c_other"]
        == r["n_chars"]
    )


def test_char_entropy_matches_direct_formula(spark):
    txt = "The 99 quick Foxes jumped over 12 lazy dogs!!"
    r = T.char_entropy(_mk(spark, [(1, txt)])).collect()[0]
    counts = [
        sum(c.islower() for c in txt),
        sum(c.isupper() for c in txt),
        sum(c.isdigit() for c in txt),
        txt.count(" "),
    ]
    counts.append(len(txt) - sum(counts))
    want = -sum(
        (c / len(txt)) * math.log2(c / len(txt)) for c in counts if c
    )
    assert abs(r["class_entropy"] - want) < 2e-4  # floored at 1e-4
    assert [
        r["c_lower"], r["c_upper"], r["c_digit"], r["c_space"], r["c_other"]
    ] == counts


def test_char_entropy_corpus_invariants_and_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = T.char_entropy(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # one projection over the scan
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        # 5-class entropy is bounded by log2(5); prose sits well inside
        assert 0.0 <= r["class_entropy"] <= math.log2(5) + 1e-9
        assert (
            r["c_lower"] + r["c_upper"] + r["c_digit"] + r["c_space"]
            + r["c_other"] == r["n_chars"]
        )


def test_compression_signals_pins_zlib_and_ordering(spark):
    rep = "spam and eggs " * 64
    div = "Entirely distinct words compose this one sentence, zq7!"
    df = _mk(spark, [(1, rep), (2, div), (3, None), (4, "")])
    out = {r["doc_id"]: r for r in T.compression_signals(df).collect()}
    for did, t in ((1, rep), (2, div)):
        b = t.encode("utf-8")
        assert out[did]["raw_len"] == len(b)
        assert out[did]["zip_len"] == len(zlib.compress(b, T.ZLIB_LEVEL))
        want = math.floor(out[did]["zip_len"] / out[did]["raw_len"] * 10000)
        assert out[did]["zip_ratio"] == want / 10000
    # the repetitive doc compresses far better than the diverse one
    assert out[1]["zip_ratio"] < out[2]["zip_ratio"]
    assert out[3]["raw_len"] is None and out[3]["zip_ratio"] is None
    assert out[4]["raw_len"] == 0 and out[4]["zip_ratio"] is None


def test_compression_signals_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = T.compression_signals(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 < r["zip_ratio"] < 1.5
