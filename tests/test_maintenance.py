"""Table maintenance: compaction bin-packing plan + snapshot CDC diff.

Hand-checked semantics on tiny frames, invariants on the real corpus,
and plan shape (the compaction window must be partitioned by the table
partition key — never a global single-partition sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import maintenance as M
from gpt4ocontentextraction_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_compaction_bins_hand_semantics(spark):
    # one partition (n_parts=1), target 100: sizes 60,60,60 pack by
    # START offset -> starts 0,60,120 -> bins 0,0,1
    df = spark.createDataFrame(
        [(0, "a" * 60), (1, "b" * 60), (2, "c" * 60), (3, None)],
        "doc_id long, text string",
    )
    out = {
        (r["part"], r["bin"]): r
        for r in M.compaction_bins(df, n_parts=1, target_bytes=100).collect()
    }
    assert out[(0, 0)]["n_files"] == 2
    assert out[(0, 0)]["bin_bytes"] == 120
    assert out[(0, 0)]["min_doc"] == 0 and out[(0, 0)]["max_doc"] == 1
    # doc 2 starts at offset 120 -> bin 1; null text packs as size 0 at
    # offset 180 -> same bin
    assert out[(0, 1)]["n_files"] == 2
    assert out[(0, 1)]["bin_bytes"] == 60
    assert out[(0, 1)]["max_doc"] == 3


def test_compaction_bins_invariants(spark):
    docs = _docs(spark)
    rows = M.compaction_bins(docs).collect()
    # every file lands in exactly one bin
    assert sum(r["n_files"] for r in rows) == docs.count()
    # total bytes conserved
    want = docs.select(
        F.sum(F.coalesce(F.length("text"), F.lit(0)))
    ).first()[0]
    assert sum(r["bin_bytes"] for r in rows) == want
    # bins are contiguous doc_id ranges within a partition: sorted by
    # bin, ranges must not interleave
    by_part = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for part, bins in by_part.items():
        bins.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in bins] == list(range(len(bins)))
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["max_doc"] < nxt["min_doc"]
        # a bin only opens once the previous one reached the target
        # (start-offset packing: every non-final bin spans >= target)
        for b in bins[:-1]:
            assert b["bin_bytes"] >= M.COMPACT_TARGET_BYTES - 600  # < max doc len slack


def test_compaction_window_is_partitioned(spark):
    plan = physical_plan(M.compaction_bins(_docs(spark)))
    # the running sum must hash-partition by the table partition key --
    # a global (single-partition) window would serialize the manifest
    assert "hashpartitioning(part" in plan
    assert "SinglePartition" not in plan


def test_snapshot_diff_hand_semantics(spark):
    # doc_ids: 3 -> insert (absent from v1), 5 -> delete (absent from
    # v2), 2 -> update (v1 has 10-char prefix), 0 -> unchanged
    df = spark.createDataFrame(
        [(0, "x" * 40), (2, "y" * 40), (3, "z" * 40), (5, "w" * 40),
         (7, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in M.snapshot_diff(df).collect()}
    assert set(out) == {2, 3, 5}
    assert out[3]["change_type"] == "insert"
    assert out[3]["old_len"] is None and out[3]["new_len"] == 40
    assert out[5]["change_type"] == "delete"
    assert out[5]["old_len"] == 40 and out[5]["new_len"] is None
    assert out[2]["change_type"] == "update"
    assert out[2]["old_len"] == 10 and out[2]["new_len"] == 40
    # null text in both versions (doc 7): unchanged, not an update


def test_snapshot_diff_all_classes_fire_on_corpus(spark):
    rows = M.snapshot_diff(_docs(spark)).collect()
    kinds = {r["change_type"] for r in rows}
    assert kinds == {"insert", "delete", "update"}
    # class membership is pure doc_id arithmetic
    for r in rows:
        d = r["doc_id"]
        if r["change_type"] == "insert":
            assert d % 11 == 3 and d % 13 != 5
        elif r["change_type"] == "delete":
            assert d % 13 == 5 and d % 11 != 3
        else:
            assert d % 7 == 2


def test_incremental_extract_ids_excludes_deletes(spark):
    docs = _docs(spark)
    diff = {r["doc_id"]: r["change_type"]
            for r in M.snapshot_diff(docs).collect()}
    work = {r["doc_id"]: r["change_type"]
            for r in M.incremental_extract_ids(docs).collect()}
    assert work == {d: c for d, c in diff.items() if c != "delete"}
    assert all(c in ("insert", "update") for c in work.values())
