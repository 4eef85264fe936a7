#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query cold/warm timing
with the noop sink + .explain("formatted") capture, WITHOUT the frozen
bench.py's scaling phases — for fast iterate-measure loops and for the
committed plan evidence under plans/r06/.

Usage:
  python bench_extra.py [query ...]          # time listed (default: all)
  python bench_extra.py --plans plans/r06 --suffix _before [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPEATS (default 1
     extra warm run).
Prints one JSON line {"queries": {name: cold_sec}, "queries_warm": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = ""
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from bench import HEADLINE  # frozen harness's query list
    from gpt4ocontentextraction_spark.cached import release_all
    from gpt4ocontentextraction_spark.driver_contract import (
        EXTRA_QUERIES,
        QUERIES,
    )
    from gpt4ocontentextraction_spark.session import get_spark

    lookup = {**EXTRA_QUERIES, **QUERIES}
    if not names:
        names = [n for n in HEADLINE if n in lookup]

    spark = get_spark("bench-extra", cores=CPUS)
    # warm inputs untimed (page cache + gate caches), as bench.py does
    for t in ("documents", "embeddings"):
        try:
            _noop(spark.read.parquet(f"{SF_DIR}/{t}.parquet"))
        except Exception:
            pass
    try:
        from gpt4ocontentextraction_spark.driver_contract import (
            _pyscan_spans_dir,
        )

        _pyscan_spans_dir(spark, SF_DIR)
    except Exception:
        pass

    cold, warm = {}, {}
    for name in names:
        if name not in lookup:
            print(f"## unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        _noop(lookup[name](spark, SF_DIR))
        cold[name] = round(time.perf_counter() - t0, 3)
        release_all()
        t0 = time.perf_counter()
        df = lookup[name](spark, SF_DIR)
        _noop(df)
        warm[name] = round(time.perf_counter() - t0, 3)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(
                os.path.join(plans_dir, f"{name}{suffix}.txt"), "w"
            ) as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        release_all()
        spark.sparkContext.setJobDescription(None)
    total = round(sum(cold.values()), 3)
    print(json.dumps({
        "metric": "bench_extra",
        "value": total,
        "unit": "sec",
        "sf": SF_DIR.rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "queries": cold,
        "queries_warm": warm,
    }))


if __name__ == "__main__":
    main()
