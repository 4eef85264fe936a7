"""Fused extract+chunk: one mapInArrow pass, zero shuffle.

operators/chunk.py implements C2/C3 relationally (window + groupBy —
a shuffle keyed by doc_id). At 100 TB that shuffle is pure waste: every
row already holds a whole document, so chunk assembly can run in the same
Arrow batch as extraction. These operators register against the SAME
DuckDB oracles as the relational versions, so the fusion is gate-proven
equivalent.

Plan shape: Scan -> MapInArrow -> sink. Parallelism = partitions x cores.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame

from .extract import _flatten
from .extract_arrow import extract_values_arrow

CHUNK_SIZE = 8192
STRIDE = 7372  # CHUNK_SIZE - 820 overlap

_CHUNKS_DDL = (
    "chunk_doc_id string, chunk_id long, pg_number long, file_name string,"
    " title string, content string"
)


def _doc_starts(a: np.ndarray) -> np.ndarray:
    return np.r_[True, a[1:] != a[:-1]]


def _excl_cumsum_per_doc(flag: np.ndarray, doc: np.ndarray) -> np.ndarray:
    cs = np.cumsum(flag) - flag
    base = np.maximum.accumulate(np.where(_doc_starts(doc), cs, 0))
    return cs - base


def _incl_cumsum_per_doc(flag: np.ndarray, doc: np.ndarray) -> np.ndarray:
    cs = np.cumsum(flag)
    prev = cs - flag  # exclusive
    base = np.maximum.accumulate(np.where(_doc_starts(doc), prev, 0))
    return cs - base


def _group_join(
    text: pa.Array, group_key: np.ndarray
) -> tuple[np.ndarray, pa.Array]:
    """Join contiguous groups' texts with newlines (C-side). Returns
    (start positions, joined array)."""
    starts = np.flatnonzero(_doc_starts(group_key))
    bounds = np.r_[starts, len(group_key)].astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds), text), "\n"
    )
    return starts, joined


def page_chunks_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """C2 batch kernel: extraction + per-page chunk assembly over raw
    (doc_id, spans) Arrow batches. Shared by the mapInArrow operator
    below and the fused python-scan source (sources/pyscan.py)."""
    for batch in batches:
        if not len(batch):
            continue
        doc_id, n_docs, doc_idx, kind, text, media, off = _flatten(batch)
        d, okind_a, otext, _om, _off = extract_values_arrow(
            doc_idx, kind, text, media, off
        )
        okind = okind_a.to_numpy(zero_copy_only=False)
        is_pb = okind == "page_break"
        page = _excl_cumsum_per_doc(is_pb.astype(np.int64), d)

        keep = ~is_pb
        d_k = d[keep]
        page_k = page[keep]
        text_k = pc.take(otext, pa.array(np.flatnonzero(keep)))
        if len(d_k) == 0:
            continue
        # contiguous (doc, page) groups
        gk = d_k * (page_k.max() + 1) + page_k
        starts, body = _group_join(text_k, gk)
        pg = pa.array((page_k[starts] + 1).astype(np.int64))
        pg_str = pc.cast(pg, pa.string())
        doc_str = pc.take(doc_id, pa.array(d_k[starts]))
        content = pc.binary_join_element_wise(
            "||", pg_str, "||\n", body, ""
        )
        yield pa.RecordBatch.from_arrays(
            [
                pc.binary_join_element_wise(doc_str, pg_str, "-"),
                pg,
                pg,
                doc_str,
                pa.array([None] * len(starts), type=pa.string()),
                content,
            ],
            names=[
                "chunk_doc_id", "chunk_id", "pg_number", "file_name",
                "title", "content",
            ],
        )



def page_chunks_fused(documents: DataFrame) -> DataFrame:
    """C2 fused: extraction + per-page chunk assembly in one Arrow pass."""
    return documents.select("doc_id", "spans").mapInArrow(
        page_chunks_batches, _CHUNKS_DDL
    )


def _seg_cummax_idx(idx: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Running max of `idx` (candidate positions, -1 = none) resetting at
    each True in `seg_starts` — the vectorized forward-fill used for the
    reference's sequential last_heading / pg_number carries."""
    n = len(idx)
    if n == 0:
        return idx
    seg = np.cumsum(seg_starts) - 1
    base = (n + 1) * seg
    return np.maximum.accumulate(idx + base) - base


def markdown_chunks_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """C3 batch kernel: reference-faithful heading chunking (see
    operators/chunk.py docstring for the spec: '# '/'## ' section splits,
    8192/820 windows, lagging last_heading carry, '||pg-1||' content
    prefix) over raw (doc_id, spans) Arrow batches. Shared by the
    mapInArrow operator below and the fused python-scan source
    (sources/pyscan.py)."""
    for batch in batches:
        if not len(batch):
            continue
        doc_id, n_docs, doc_idx, kind, text, media, off = _flatten(batch)
        d, okind_a, otext, _om, _off = extract_values_arrow(
            doc_idx, kind, text, media, off
        )
        if len(d) == 0:
            continue
        okind = okind_a.to_numpy(zero_copy_only=False)
        is_sec = (okind == "heading") & (
            pc.starts_with(otext, "# ").to_numpy(zero_copy_only=False)
            | pc.starts_with(otext, "## ").to_numpy(zero_copy_only=False)
        )
        sec = _incl_cumsum_per_doc(is_sec.astype(np.int64), d)

        gk = d * (sec.max() + 1) + sec
        starts, content = _group_join(otext, gk)
        sec_doc = d[starts]
        lens = pc.utf8_length(content).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum(
            1, np.ceil((lens - 820) / float(STRIDE)).astype(np.int64)
        )
        # expand sections x k
        rep = np.repeat(np.arange(len(starts)), n_chunks)
        k = np.concatenate([np.arange(c) for c in n_chunks]) if len(
            n_chunks
        ) else np.empty(0, dtype=np.int64)
        exp_content = pc.take(content, pa.array(rep))
        # slice per distinct k (few distinct values; scalar bounds = C)
        t_arr = None
        for kv in np.unique(k):
            sl = pc.utf8_slice_codeunits(
                exp_content, int(kv) * STRIDE, int(kv) * STRIDE + CHUNK_SIZE
            )
            t_arr = sl if t_arr is None else pc.if_else(
                pa.array(k == kv), sl, t_arr
            )
        nc = len(rep)
        chunk_doc = sec_doc[rep]
        chunk_starts = _doc_starts(chunk_doc)

        # --- per-chunk signals (all Arrow/numpy, no per-row Python) ---
        # h1: last line of the raw chunk starting with '# '
        lines = pc.split_pattern(t_arr, "\n")
        line_vals = lines.values
        line_lens = np.diff(lines.offsets.to_numpy())
        flat_mask = pc.starts_with(line_vals, "# ").to_numpy(
            zero_copy_only=False
        )
        nfl = len(line_vals)
        flat_idx = np.where(flat_mask, np.arange(nfl), -1)
        line_starts = np.zeros(nfl, dtype=bool)
        line_starts[np.r_[0, np.cumsum(line_lens)[:-1]]] = True
        run_h = _seg_cummax_idx(flat_idx, line_starts)
        ends = np.cumsum(line_lens) - 1
        h1_idx = run_h[ends]  # per chunk: flat idx of last '# ' line
        # upd: first ||N|| marker, suppressed when chunk starts with '||'
        m = pc.extract_regex(t_arr, r"\|\|(?P<n>\d+)\|\|")
        m_valid = m.is_valid().to_numpy(zero_copy_only=False)
        t_pipes = pc.starts_with(t_arr, "||").to_numpy(
            zero_copy_only=False
        )
        upd_valid = m_valid & ~t_pipes
        upd_vals = np.where(
            m_valid,
            pc.cast(
                pc.fill_null(pc.struct_field(m, "n"), "0"), pa.int64()
            ).to_numpy(zero_copy_only=False),
            0,
        )

        # --- per-doc sequential carries over chunks in order ---
        run_lh = _seg_cummax_idx(
            np.where(h1_idx >= 0, np.arange(nc), -1), chunk_starts
        )
        # last_heading lags one chunk (pre-update value)
        prev_lh = np.r_[-1, run_lh[:-1]]
        prev_lh[chunk_starts] = -1
        run_pg = _seg_cummax_idx(
            np.where(upd_valid, np.arange(nc), -1), chunk_starts
        )
        pg = np.where(run_pg >= 0, upd_vals[np.maximum(run_pg, 0)], 1)

        lh_flat_idx = np.where(
            prev_lh >= 0, h1_idx[np.maximum(prev_lh, 0)], 0
        )
        lh = pc.fill_null(
            pc.take(line_vals, pa.array(lh_flat_idx, mask=prev_lh < 0)),
            "",
        )
        pg_m1_str = pc.cast(pa.array(pg - 1), pa.string())
        out_content = pc.binary_join_element_wise(
            "||", pg_m1_str, "||\n", lh, "\n", t_arr, ""
        )

        chunk_id = np.arange(nc, dtype=np.int64)
        chunk_id -= np.maximum.accumulate(
            np.where(chunk_starts, chunk_id, 0)
        )
        doc_str = pc.take(doc_id, pa.array(chunk_doc))
        cid = pa.array(chunk_id)
        yield pa.RecordBatch.from_arrays(
            [
                pc.binary_join_element_wise(
                    doc_str, pc.cast(cid, pa.string()), "-"
                ),
                cid,
                pa.array(pg.astype(np.int64)),
                doc_str,
                lh,
                out_content,
            ],
            names=[
                "chunk_doc_id", "chunk_id", "pg_number", "file_name",
                "title", "content",
            ],
        )



def markdown_chunks_fused(documents: DataFrame) -> DataFrame:
    """C3 fused into one mapInArrow pass, zero shuffle. Gate-proven equal
    to the relational markdown_chunks (same DuckDB oracle)."""
    return documents.select("doc_id", "spans").mapInArrow(
        markdown_chunks_batches, _CHUNKS_DDL
    )
