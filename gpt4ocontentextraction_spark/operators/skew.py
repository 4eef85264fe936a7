"""Skew defusal: shard oversized documents by page range, extract shards in
parallel, reassemble in order (north_rule: "salted and repartitioned to
defuse skew from oversized PDFs").

The reference processes one document per job, all pages inside it
(docker/main.py:326-355) — one 10,000-page PDF monopolizes a worker. In
Spark terms a giant spans array makes one task a straggler. Defusal:

1. split input on ``size(spans) > span_threshold`` (giant docs are rare:
   the small side takes the normal no-shuffle path);
2. explode only the giant docs, window-compute each span's page, and shard
   on ``floor(page / pages_per_shard)`` — CONTIGUOUS page ranges, because
   extraction is independent across pages (kernel invariant: no table run
   or reading-order decision crosses a page_break), so concatenating shard
   outputs in shard order is exactly the unsharded result;
3. extract each (doc_id, shard) pseudo-document with the SAME kernel;
4. reassemble: re-explode, order by (shard, local offset), reindex, and
   collect back to one spans array per doc.

The shuffles here touch only the giant-doc subset; AQE + the
(doc_id, shard) key spread one document across ~spans/target tasks.
Equivalence to the plain path is asserted in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract import extract

DEFAULT_SPAN_THRESHOLD = 20_000
DEFAULT_TARGET_SPANS_PER_SHARD = 4_000


def extract_with_skew_defusal(
    documents: DataFrame,
    span_threshold: int = DEFAULT_SPAN_THRESHOLD,
    target_spans_per_shard: int = DEFAULT_TARGET_SPANS_PER_SHARD,
) -> DataFrame:
    n_spans = F.size("spans")
    small = documents.filter(n_spans <= span_threshold)
    big = documents.filter(n_spans > span_threshold)

    small_out = extract(small)

    # -- giant docs: explode, page-number, shard by contiguous page range
    e = big.select(
        "doc_id", F.size("spans").alias("n_spans"), F.explode("spans").alias("s")
    )
    w_page = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("s.offset"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "page",
        F.coalesce(
            F.sum(
                F.when(F.col("s.kind") == "page_break", 1).otherwise(0)
            ).over(w_page),
            F.lit(0),
        ),
    )
    w_doc = Window.partitionBy("doc_id")
    n_pages = F.max("page").over(w_doc) + 1
    # pages per shard so that shards hold ~target_spans_per_shard spans
    spans_per_page = (F.col("n_spans") / n_pages).cast("double")
    pages_per_shard = F.greatest(
        F.lit(1),
        F.floor(F.lit(target_spans_per_shard) / F.greatest(spans_per_page, F.lit(1.0))),
    )
    e = e.withColumn("shard", F.floor(F.col("page") / pages_per_shard))

    shards = e.groupBy("doc_id", "shard").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s.offset as offset,"
            " s.kind as kind, s.text as text, s.media_ref as media_ref))),"
            " x -> struct(x.kind as kind, x.text as text,"
            " x.media_ref as media_ref, x.offset as offset))"
        ).alias("spans")
    )
    # pseudo-doc id keeps the shard; the kernel never sees doc identity
    shard_out = extract(
        shards.select(
            F.concat_ws("#", "doc_id", F.col("shard").cast("string")).alias(
                "doc_id"
            ),
            "spans",
        )
    )

    # -- reassemble: global order = (shard, local offset); reindex offsets
    r = shard_out.select(
        F.split("doc_id", "#").getItem(0).alias("doc_id"),
        F.split("doc_id", "#").getItem(1).cast("long").alias("shard"),
        F.explode("spans").alias("s"),
    )
    big_out = r.groupBy("doc_id").agg(
        F.expr(
            "transform("
            "  array_sort(collect_list(struct(shard, s.offset as o,"
            "             s.kind as kind, s.text as text, s.media_ref as media_ref))),"
            "  (x, i) -> struct(x.kind as kind, x.text as text,"
            "            x.media_ref as media_ref, int(i) as offset))"
        ).alias("spans")
    )

    return small_out.unionByName(big_out)
