#!/usr/bin/env python
"""spark-submit entry point (north_rule: "launched via spark-submit
--py-files on multi-executor clusters").

    zip -qr engine.zip gpt4ocontentextraction_spark
    spark-submit --py-files engine.zip submit_main.py \
        --input  <documents parquet/iceberg path> \
        --output <snapshot table root> \
        [--flat] [--skew-threshold N] [--run-id ID]

Reads the documents table (spans shape, or --flat for the flat text shape
which is spanified first), runs the checkpoint-resumable extraction
increment (resume anti-join -> kernel -> atomic commit + lineage metrics),
and prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--flat", action="store_true",
                    help="force flat (doc_id,text,...) handling; by default"
                         " the shape is detected from the input schema")
    ap.add_argument("--skew-threshold", type=int, default=0,
                    help=">0: route docs above this span count through the"
                         " page-range shard path")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    # on a cluster the SparkSession comes from spark-submit's conf; the
    # factory only fills in local-mode defaults when run standalone.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gpt4o-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from gpt4ocontentextraction_spark.sources.snapshots import SnapshotTable
    from gpt4ocontentextraction_spark.spanify import spanify

    docs = spark.read.parquet(args.input)
    if args.flat or "spans" not in docs.columns:
        docs = spanify(docs)

    table = SnapshotTable(args.output)
    todo = table.pending(docs, spark)
    if not todo.take(1):
        print(json.dumps({"status": "up-to-date",
                          "version": table.current_version()}))
        return

    if args.skew_threshold > 0:
        from gpt4ocontentextraction_spark.operators.skew import (
            extract_with_skew_defusal,
        )

        out = extract_with_skew_defusal(todo, span_threshold=args.skew_threshold)
    else:
        from gpt4ocontentextraction_spark.operators.extract import extract

        out = extract(todo)

    commit = table.append(out, spark, run_id=args.run_id)
    m = table.metrics(spark)
    n_parts = m.filter(m.run_id == commit.removeprefix("c-")).count() if m is not None else 0
    print(
        json.dumps(
            {
                "status": "committed",
                "commit": commit,
                "version": table.current_version(),
                "metric_partitions": n_parts,
            }
        )
    )


if __name__ == "__main__":
    main()
