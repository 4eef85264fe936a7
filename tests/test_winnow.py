"""Winnowing fingerprints (Schleimer et al. 2003): independent Python
reference implementation equality, the coverage theorem on seeded shared
substrings, df-cap/threshold behavior of the pair join, and plan shape
(selection must be a shuffle-free projection)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.functions.hashing import MOD
from gpt4ocontentextraction_spark.operators import textstats as T
from gpt4ocontentextraction_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"
K = 8
W = T.WINNOW_W


def _ref_winnow(text: str) -> set[tuple[int, int]]:
    """Independent per-doc reference: char-K polyhash (base 31 mod
    2^31-1, as fingerprints), window-of-W min, rightmost on ties."""
    if len(text) >= K:
        grams = [text[i : i + K] for i in range(len(text) - K + 1)]
    else:
        grams = [text]
    hs = []
    for g in grams:
        acc = 0
        for ch in g:
            acc = (acc * 31 + ord(ch)) % MOD
        hs.append(acc)
    out = set()
    m = len(hs)
    for j in range(max(1, m - W + 1)):
        win = hs[j : j + W]
        mn = min(win)
        # rightmost occurrence of the min
        pos = j + max(i for i, v in enumerate(win) if v == mn)
        out.add((pos + 1, mn))  # operator positions are 1-based
    return out


def test_winnow_matches_reference_on_corpus_sample(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got: dict[int, set] = {}
    for r in T.winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in texts.items():
        if text is None:
            assert doc_id not in got
            continue
        assert got[doc_id] == _ref_winnow(text), f"doc {doc_id}"


def test_winnow_kernel_equals_expression_spec(spark):
    # the Arrow kernel (production path) must emit row-for-row what the
    # JVM higher-order-function expression spec emits — same packed
    # (pos, fp) multiset over real corpus docs incl. a null-text row
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    kern = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in T.winnow_fingerprints(docs).collect()
    }
    expr_rows = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.expr(T._WINNOW_EXPR)).alias("s"),
    )
    spec = {
        (
            r["doc_id"],
            r["s"] // T._WINNOW_SHIFT,
            r["s"] % T._WINNOW_SHIFT,
        )
        for r in expr_rows.collect()
    }
    assert kern == spec


def test_winnow_coverage_theorem_shared_substring(spark):
    # two docs sharing a >= K + W - 1 = 11-char substring MUST share at
    # least one selected fingerprint (the winnowing guarantee)
    shared = "xqzkwvfpjtm"  # 11 chars, unlikely elsewhere
    df = spark.createDataFrame(
        [
            (1, f"aaaa {shared} bbbb"),
            (2, f"cccccccc{shared}dddddddd"),
            (3, "entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    fps = T.winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"


def test_winnow_short_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None)], "doc_id long, text string"
    )
    rows = T.winnow_fingerprints(df).collect()
    # short doc: whole-text hash, one fingerprint at pos 1; null: absent
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["pos"] == 1


def test_winnow_plan_is_shuffle_free_projection(spark):
    """The selection itself never shuffles by key: the only Exchange
    ever allowed is the r6 scan-parallelism floor's ROUND-ROBIN spread
    of the unsplittable gate input (partitioning.spread_small_scan — a
    no-op on any input that already carries session parallelism); no
    hash/range exchange, no join, no window."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = physical_plan(T.winnow_fingerprints(docs))
    if "Exchange" in p:
        assert "RoundRobinPartitioning" in p, p
    assert "hashpartitioning" not in p and "rangepartitioning" not in p
    assert "Join" not in p and "Window" not in p


def test_pairs_df_cap_drops_ubiquitous_fingerprints(spark):
    # 30 identical docs: every fingerprint has df=30 > WINNOW_DF_CAP=20,
    # so no fingerprint survives and no pairs emit despite exact dup
    df = spark.createDataFrame(
        [(i, "same text everywhere repeated") for i in range(30)],
        "doc_id long, text string",
    )
    assert T.winnow_overlap_pairs(df).count() == 0


def test_pairs_threshold_and_symmetry(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = T.winnow_overlap_pairs(docs).collect()
    assert rows, "corpus must produce at least one overlap pair"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= T.WINNOW_MIN_SHARED
