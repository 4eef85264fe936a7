"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship extraction pipeline on sf0.001;
queries()/oracle_sql() pair every implemented operator (SURVEY.md §2)
with a DuckDB-checkable relational equivalent. The registry lives in
gpt4ocontentextraction_spark.driver_contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_worker_path() -> None:
    cur = os.environ.get("PYTHONPATH", "")
    if _REPO not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{cur}" if cur else _REPO


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spanify -> extraction kernel -> exploded output spans."""
    _ensure_worker_path()
    from gpt4ocontentextraction_spark.driver_contract import QUERIES

    return QUERIES["extract_spans"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_worker_path()
    from gpt4ocontentextraction_spark.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gpt4ocontentextraction_spark.driver_contract import ORACLES

    return dict(ORACLES)
