"""Resume semantics: interrupt after a partial commit, re-run, and the final
table equals a clean full run with no duplicates (reference skip-if-exists,
doc2md_utils.py:212-217; north_rule checkpoint-resumable requirement)."""

from __future__ import annotations

import pytest

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators.extract import extract
from gpt4ocontentextraction_spark.sources.snapshots import (
    SnapshotTable,
    run_resumable_extraction,
)


def _spans_set(df):
    return {
        (r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]))
        for r in df.collect()
    }


@pytest.fixture()
def docs(spark):
    pdf, _ = make_corpus(seed=11, docs_per_class=3, include_giant=False)
    return corpus_to_spark(spark, pdf)


def test_partial_commit_then_resume(spark, docs, tmp_path):
    table = SnapshotTable(str(tmp_path / "out"))

    # simulate an interrupted first run: only half the docs got committed
    half = docs.limit(docs.count() // 2)
    c1 = table.append(extract(half), spark, run_id="run1")
    assert c1 and table.current_version() == 1

    # resume: second run only processes the missing docs
    pending = table.pending(docs, spark)
    assert pending.count() == docs.count() - half.count()
    c2 = run_resumable_extraction(spark, docs, table, run_id="run2")
    assert c2 and table.current_version() == 2

    # third run: nothing to do, no new commit
    assert run_resumable_extraction(spark, docs, table, run_id="run3") is None
    assert table.current_version() == 2

    # final table == clean full run, no duplicates
    final = table.read(spark)
    assert final.count() == docs.count()
    assert final.select("doc_id").distinct().count() == docs.count()
    assert _spans_set(final) == _spans_set(extract(docs))


def test_uncommitted_data_is_invisible(spark, docs, tmp_path):
    import os

    table = SnapshotTable(str(tmp_path / "out"))
    # a crashed writer: data dir exists but no manifest was published
    extract(docs).write.parquet(os.path.join(table.data_dir, "c-crashed"))
    assert table.read(spark) is None
    assert table.pending(docs, spark).count() == docs.count()


def test_metrics_written_per_partition(spark, docs, tmp_path):
    table = SnapshotTable(str(tmp_path / "out"))
    table.append(extract(docs), spark, run_id="m1")
    m = table.metrics(spark)
    assert m is not None
    rows = m.collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    cols = set(m.columns)
    assert {"run_id", "partition_id", "n_docs", "n_spans_out",
            "n_tables_built", "n_media_emitted"} <= cols
    # lineage sanity: table/media counts match the actual output
    out = extract(docs).collect()
    n_tables = sum(1 for r in out for s in r["spans"] if s["kind"] == "table")
    assert sum(r["n_tables_built"] for r in rows) == n_tables


def test_concurrent_publish_never_loses_commits(tmp_path):
    """os.link-based publish: racing writers both land; neither overwrites."""
    import json
    import os

    from gpt4ocontentextraction_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "out"))
    os.makedirs(os.path.join(t.data_dir, "c-a"))
    os.makedirs(os.path.join(t.data_dir, "c-b"))
    # simulate a racing writer: publish v1 for c-a, then have a second
    # writer that (stalely) also computed v1 publish c-b — the retry loop
    # must land it as v2 with BOTH commits in the final manifest
    t._publish("c-a", {"run_id": "a"})
    t._publish("c-b", {"run_id": "b"})
    with open(os.path.join(t.manifest_dir, f"v{t.current_version()}.json")) as f:
        commits = json.load(f)["commits"]
    assert commits == ["c-a", "c-b"]


def test_retry_after_partial_write_recovers(spark, tmp_path):
    """A crashed append (data dir exists, manifest unpublished) must be
    retryable with the same run_id (streaming epoch retry semantics)."""
    from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
    from gpt4ocontentextraction_spark.operators.extract import extract
    from gpt4ocontentextraction_spark.sources.snapshots import SnapshotTable

    pdf, _ = make_corpus(seed=4, docs_per_class=1, include_giant=False)
    docs = corpus_to_spark(spark, pdf)
    table = SnapshotTable(str(tmp_path / "out"))
    # crashed first attempt: data written, no manifest
    extract(docs).write.parquet(f"{table.data_dir}/c-epoch-7")
    assert table.read(spark) is None
    commit = table.append(extract(docs), spark, run_id="epoch-7")
    assert commit == "c-epoch-7"
    assert table.read(spark).count() == docs.count()
    # committed run_id cannot be appended again
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table.append(extract(docs), spark, run_id="epoch-7")


def test_pending_broadcast_gated_on_size(spark, docs, tmp_path):
    """pending() broadcasts the committed set only while the committed
    files stay under autoBroadcastJoinThreshold; past it (or when forced
    off) the plan falls back to a shuffled anti-join."""
    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    table = SnapshotTable(str(tmp_path / "out"))
    table.append(extract(docs.limit(4)), spark, run_id="r1")

    auto = physical_plan(table.pending(docs, spark))
    assert "BroadcastHashJoin" in auto  # tiny committed set -> broadcast

    # with the threshold at 0 the size gate must NOT hint broadcast (and
    # Spark's own estimator won't either) — the huge-committed-set shape
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
    try:
        gated = physical_plan(table.pending(docs, spark))
        assert "BroadcastHashJoin" not in gated
        forced_on = physical_plan(
            table.pending(docs, spark, broadcast_done=True)
        )
        assert "BroadcastHashJoin" in forced_on  # explicit override wins
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pending_broadcast_sized_by_id_column_not_whole_files(
    spark, docs, tmp_path
):
    """The broadcast side is the distinct doc_id projection, so the gate
    must size THAT (parquet footer column-chunk bytes), not the whole
    committed files: a wide-span table whose total bytes exceed the
    threshold but whose id column doesn't must still broadcast (the
    r3 ADVICE item — whole-file sizing forced a shuffled anti-join
    while the id set was tiny)."""
    import glob
    import os

    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    table = SnapshotTable(str(tmp_path / "wide"))
    table.append(extract(docs), spark, run_id="r1")

    file_bytes = sum(
        os.path.getsize(f)
        for d in table.committed_dirs()
        for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    id_bytes = table._doc_id_bytes()
    assert 0 < id_bytes < file_bytes, "fixture must have wide non-id data"

    # threshold strictly between the id column and the whole files:
    # whole-file sizing would refuse to broadcast, id sizing must not
    threshold = (id_bytes + file_bytes) // 2
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
    try:
        plan = physical_plan(table.pending(docs, spark))
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
