"""Physical-plan introspection: the asserts that keep this engine fast.

Catalyst gives predicate pushdown / column pruning / broadcast selection
for free ONLY while the plan stays declarative; a stray UDF or RDD hop
silently turns a 2-column parquet scan into a full-row read. These helpers
let tests pin the plan shape (SURVEY.md §4), so a regression in plan
quality fails CI rather than a 100-TB run.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"filter '{fragment}' not pushed to the scan:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """The parquet ReadSchema must contain exactly `columns` (pruning)."""
    plan = physical_plan(df)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*(?:<[^>]*>[^>]*)*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    top_level = re.findall(r"(?:^|,)(\w+):", m.group(1))
    assert set(top_level) == columns, (
        f"ReadSchema has {top_level}, wanted {columns}:\n{plan}"
    )


def assert_no_exchange(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "Exchange" not in plan, f"unexpected shuffle:\n{plan}"


def assert_no_nested_loop(df: DataFrame) -> None:
    """No cartesian / nested-loop join anywhere in the plan — the shape
    that turns a candidate-generation step O(n^2) at scale."""
    plan = physical_plan(df)
    assert (
        "BroadcastNestedLoopJoin" not in plan
        and "CartesianProduct" not in plan
    ), f"nested-loop join in plan:\n{plan}"


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """No window function may run without a partition spec — that shape
    moves the ENTIRE input through one partition (Spark's own
    'WindowExec: No Partition Defined' warning) and serializes at scale.
    Windows over bounded inputs must use a constant-valued partition key
    (or avoid the window entirely — hybrid_rrf_topk cuts bounded
    prefixes with orderBy().limit() and ranks them driver-side)."""
    plan = physical_plan(df)
    for start in _find_all(plan, "windowspecdefinition("):
        args = plan[start + len("windowspecdefinition("):]
        # first top-level argument (balanced parens)
        depth = 0
        for i, ch in enumerate(args):
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    first = args[:i]
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                first = args[:i]
                break
        else:  # pragma: no cover - malformed plan text
            first = args
        assert " ASC" not in first and " DESC" not in first, (
            "window without a partition spec (first windowspecdefinition"
            f" argument is an ordering: {first!r}):\n{plan}"
        )


def _find_all(s: str, sub: str):
    i = s.find(sub)
    while i != -1:
        yield i
        i = s.find(sub, i + 1)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"join did not broadcast:\n{plan}"
    )
