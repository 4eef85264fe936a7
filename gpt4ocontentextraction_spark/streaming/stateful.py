"""Custom stateful streaming operator: cross-batch streaming dedup.

A continuously-ingesting extraction pipeline must not re-emit a document
that already arrived in an earlier micro-batch (the streaming analog of
the resume anti-join — there, state lives in the committed snapshot; here,
in Spark's state store). Implemented with ``applyInPandasWithState``:
one state slot per dedup key holding the first-seen doc_id; duplicates
are suppressed exactly-once across micro-batches and restarts (state is
checkpointed).

At 100-TB scale the state is hash-partitioned by key across executors;
pass ``timeout_ms`` to bound state size with a processing-time timeout
for keys that stop arriving (timed-out keys are evicted; a late re-arrival
of such a key re-emits — the documented trade of bounded state).

Determinism: within a micro-batch Spark does NOT guarantee row order, so
"first-seen" is defined as the MIN doc_id of the batch — identical output
under any repartitioning (pinned by test_stateful_streaming).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "dup_key string, doc_id string, n_suppressed long"
STATE_DDL = "first_doc_id string, n_seen long"


def _make_dedup_fn(timeout_ms: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_new = 0
        first_doc = None
        for pdf in pdfs:
            if len(pdf):
                batch_min = pdf["doc_id"].astype(str).min()
                if first_doc is None or batch_min < first_doc:
                    first_doc = batch_min
            n_new += len(pdf)
        if state.exists:
            prev_first, prev_seen = state.get
            state.update((prev_first, prev_seen + n_new))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
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
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "dup_key": [key[0]],
                "doc_id": [first_doc],
                "n_suppressed": [n_new - 1],
            }
        )

    return _dedup_fn


def stream_dedup_first_seen(
    docs_stream: DataFrame,
    key_col: str = "dup_key",
    timeout_ms: int | None = None,
) -> DataFrame:
    """stream(doc_id, dup_key) -> first occurrence per key, ever (or per
    timeout window when ``timeout_ms`` bounds the state)."""
    return (
        docs_stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_dedup_fn(timeout_ms),
            outputStructType=OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
