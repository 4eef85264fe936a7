"""Unit tests for pii_redact (curation.py) and boilerplate_lines
(dedup.py) on hand corpora — the oracle-parity sweep covers the
sf0.001/sf0.01 gates; these pin the semantics on adversarial rows."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators import curation, dedup


def test_pii_redact_masks_and_counts(spark):
    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org now"),
        (2, "call +1-555-0100 or +44-202-9999"),
        (3, "host 10.0.0.1 peer 192.168.255.3"),
        (4, "mixed a@b.io at 1.2.3.4 via +1-555-1234"),
        (5, "clean text, no contacts"),
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in curation.pii_redact(docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}  # NULL text filtered
    assert got[1]["cleaned"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (
        2,
        0,
        0,
    )
    assert got[2]["cleaned"] == "call <PHONE> or <PHONE>"
    assert got[2]["n_phones"] == 2
    assert got[3]["cleaned"] == "host <IP> peer <IP>"
    assert got[3]["n_ips"] == 2
    assert got[4]["cleaned"] == "mixed <EMAIL> at <IP> via <PHONE>"
    assert got[5]["cleaned"] == "clean text, no contacts"
    assert (got[5]["n_emails"], got[5]["n_phones"], got[5]["n_ips"]) == (
        0,
        0,
        0,
    )


def test_pii_seed_is_deterministic_and_non_trivial(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curation.pii_redact(curation.seed_pii(docs))
    agg = out.selectExpr(
        "sum(n_emails) e", "sum(n_phones) p", "sum(n_ips) i"
    ).first()
    # 2/3 of docs were seeded — the gate asserts behavior, not emptiness
    assert agg["e"] > 0 and agg["p"] > 0 and agg["i"] > 0
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, curation.pii_redact(curation.seed_pii(docs)).collect()))
    assert a == b


def test_boilerplate_lines_drops_every_occurrence(spark):
    nav = "Home | About | Contact"
    rows = [
        (1, f"{nav}\nunique alpha\n{nav}"),  # repeated inside ONE doc:
        (2, f"{nav}\nunique beta"),  # df counts DISTINCT docs
        (3, f"{nav}\nunique gamma"),
        (4, "rare line\n\n  \nbody"),  # blanks kept, df<3 kept
        (5, None),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.boilerplate_lines(docs, min_df=3).collect()
    }
    assert set(got) == {1, 2, 3, 4, 6}
    # df(nav)=3 -> every occurrence dropped, including both in doc 1
    assert got[1]["cleaned"] == "unique alpha"
    assert got[1]["n_removed"] == 2
    assert got[2]["cleaned"] == "unique beta"
    assert got[3]["cleaned"] == "unique gamma"
    # blank/whitespace lines are structural and survive
    assert got[4]["cleaned"] == "rare line\n\n  \nbody"
    assert got[4]["n_removed"] == 0
    assert got[6]["cleaned"] == "" and got[6]["n_removed"] == 0


def test_boilerplate_non_trivial_on_reflowed_corpus(spark):
    docs = dedup.reflow_lines(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    out = dedup.boilerplate_lines(docs)
    assert out.selectExpr("sum(n_removed) r").first()["r"] > 0


def test_curation_pipeline_every_stage_fires(spark):
    """The composed pass (pii -> boilerplate -> line dedup) asserts a
    non-zero count at EVERY stage on the seeded corpus — a pipeline
    where some stage silently no-ops would still hash-match a
    similarly-broken oracle, so the gate needs this independent pin."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curation.curation_pipeline(docs)
    agg = out.selectExpr(
        "count(*) n",
        "sum(n_pii) pii",
        "sum(n_boiler) boiler",
        "sum(n_dedup) dedup",
        "sum(cast(n_chars = length(cleaned) as long)) chars_ok",
    ).first()
    assert agg["n"] == 500
    assert agg["pii"] > 0 and agg["boiler"] > 0 and agg["dedup"] > 0
    assert agg["chars_ok"] == agg["n"]


def test_curation_pipeline_stages_match_components(spark):
    """Composition changes nothing: running the three components by
    hand yields the pipeline's exact rows."""
    from gpt4ocontentextraction_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    p = curation.pii_redact(curation.seed_pii(docs))
    b = D.boilerplate_lines(
        D.reflow_lines(p.select("doc_id", F.col("cleaned").alias("text")))
    )
    d = D.line_dedup(b.select("doc_id", F.col("cleaned").alias("text")))
    manual = {
        r["doc_id"]: (r["cleaned"], r["n_removed"]) for r in d.collect()
    }
    got = {
        r["doc_id"]: (r["cleaned"], r["n_dedup"])
        for r in curation.curation_pipeline(docs).collect()
    }
    assert got == manual
