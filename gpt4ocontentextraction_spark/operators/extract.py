"""Spark wrapper for the extraction kernel: Arrow-native mapInArrow operator.

Replaces the reference's per-page ThreadPoolExecutor fan-out + GPT-4o call
(reference: docker/main.py:413-426, 566-611) with a single narrow Spark
operator: no shuffle, no per-row Python. Each input row already carries a
whole document's spans, so ``mapInArrow`` preserves document atomicity with
zero data movement; parallelism is partitions × cores.

Why mapInArrow and not mapInPandas: the input column is
``array<struct<...>>``. Arrow can flatten a ListArray to its value
StructArray (and rebuild it) in C without materializing Python objects;
pandas would hand us a Series of list-of-dict. The kernel itself
(operators/extract_kernel.py) is vectorized pandas/numpy over the flattened
representation — the Arrow wrapper is pure plumbing.

Plan shape (verified in tests/test_plans.py): parquet scan with ReadSchema
pruned to (doc_id, spans) -> ArrowEvalPython/MapInArrow -> sink. No
Exchange.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..schema import DOCUMENTS_DDL
from .extract_kernel import extract_exploded

import pandas as pd

_OUT_SPAN_TYPE = pa.struct(
    [
        pa.field("kind", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("media_ref", pa.string(), nullable=False),
        pa.field("offset", pa.int32(), nullable=False),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("spans", pa.list_(_OUT_SPAN_TYPE), nullable=False),
    ]
)


def _flatten(batch: pa.RecordBatch):
    doc_id = batch.column("doc_id")
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):  # pragma: no cover - defensive
        spans = spans.combine_chunks()
    n_docs = len(batch)
    counts = pa.compute.list_value_length(spans).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    values = spans.flatten()  # StructArray, slice-aware

    def _str(name: str) -> pa.Array:
        arr = values.field(name)
        return arr.fill_null("") if arr.null_count else arr

    off = values.field("offset")
    if off.null_count:
        off = off.fill_null(0)
    return (
        doc_id,
        n_docs,
        doc_idx,
        _str("kind"),
        _str("text"),
        _str("media_ref"),
        off.to_numpy(zero_copy_only=False).astype(np.int64),
    )


def _rebuild(doc_id, n_docs, out_doc, out_kind, out_text, out_media, out_off):
    out_counts = np.bincount(out_doc, minlength=n_docs).astype(np.int32)
    offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(out_counts, out=offsets[1:])
    out_values = pa.StructArray.from_arrays(
        [
            out_kind,
            out_text,
            out_media,
            pa.array(out_off, type=pa.int32()),
        ],
        fields=list(_OUT_SPAN_TYPE),
    )
    out_spans = pa.ListArray.from_arrays(pa.array(offsets), out_values)
    return pa.RecordBatch.from_arrays([doc_id, out_spans], schema=_OUT_SCHEMA)


def _extract_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """Arrow-native fast path (operators/extract_arrow.py)."""
    from .extract_arrow import extract_values_arrow

    doc_id, n_docs, doc_idx, kind, text, media, off = _flatten(batch)
    out = extract_values_arrow(doc_idx, kind, text, media, off)
    return _rebuild(doc_id, n_docs, *out)


def _extract_batch_pandas(batch: pa.RecordBatch) -> pa.RecordBatch:
    """Reference path through the pandas kernel (kept for equivalence
    tests; semantics-defining implementation)."""
    doc_id, n_docs, doc_idx, kind, text, media, off = _flatten(batch)
    flat = pd.DataFrame(
        {
            "doc_idx": doc_idx,
            "kind": kind.to_pandas(),
            "text": text.to_pandas(),
            "media_ref": media.to_pandas(),
            "offset": off,
        }
    )
    out = extract_exploded(flat)
    return _rebuild(
        doc_id,
        n_docs,
        out["doc_idx"].to_numpy(),
        pa.array(out["kind"], type=pa.string()),
        pa.array(out["text"], type=pa.string()),
        pa.array(out["media_ref"], type=pa.string()),
        out["offset"].to_numpy().astype(np.int32),
    )


# Memory guard: Arrow batch sizing is row-based (maxRecordsPerBatch), but a
# single oversized document can carry 100k+ spans in ONE row. Rechunk
# incoming batches so no kernel invocation holds more than this many spans
# (bounds worker memory instead of relying on spill — SURVEY.md §4).
MAX_SPANS_PER_KERNEL_BATCH = int(
    os.environ.get("SPARK_GRAFT_MAX_SPANS_PER_BATCH", "262144")
)


def _bounded(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        if not len(batch):
            continue
        counts = pa.compute.list_value_length(
            batch.column("spans")
        ).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts, nan=0).astype(np.int64)
        if counts.sum() <= MAX_SPANS_PER_KERNEL_BATCH:
            yield batch
            continue
        start = 0
        running = 0
        for i, c in enumerate(counts):
            if running and running + c > MAX_SPANS_PER_KERNEL_BATCH:
                yield batch.slice(start, i - start)
                start, running = i, 0
            running += int(c)
        if start < len(batch):
            yield batch.slice(start, len(batch) - start)


def _extract_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in _bounded(batches):
        yield _extract_batch(batch)


def extract(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> extracted(doc_id, spans).

    Column-prunes the input before the UDF so parquet ReadSchema stays
    minimal even if callers pass wider rows.
    """
    return documents.select("doc_id", "spans").mapInArrow(
        _extract_iter, DOCUMENTS_DDL
    )
