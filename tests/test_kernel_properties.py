"""Property-based kernel invariants (hypothesis): for ANY span soup the
kernel must emit dense offsets, no boilerplate kinds, well-formed pipe
tables, reading-order-sorted pages — and the arrow and pandas kernels must
agree exactly."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gpt4ocontentextraction_spark.operators.extract_kernel import (
    extract_document,
)
from gpt4ocontentextraction_spark.schema import INPUT_KINDS, OUTPUT_KINDS

_texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"
    ),
    max_size=24,
)


def _spans(draw_kinds):
    return st.lists(
        st.builds(
            dict,
            kind=draw_kinds,
            text=_texts,
            media_ref=st.sampled_from(["", "media://x/1", "media://y/2"]),
        ),
        max_size=30,
    )


@st.composite
def documents(draw):
    # include out-of-vocabulary kinds: spec says unknown == text
    spans = draw(_spans(st.sampled_from(INPUT_KINDS + ("mystery", "x"))))
    # offsets: unique, shuffled
    offsets = draw(
        st.permutations(range(len(spans)))
    )
    for s, o in zip(spans, offsets):
        s["offset"] = o
    return spans


@settings(max_examples=120, deadline=None, derandomize=True)
@given(documents())
def test_kernel_invariants(spans):
    out = extract_document(spans)

    # dense offsets
    assert [s["offset"] for s in out] == list(range(len(out)))
    for s in out:
        # closed output vocabulary, no boilerplate leaks
        assert s["kind"] in OUTPUT_KINDS
        # media_ref only on media spans
        if s["kind"] != "media":
            assert s["media_ref"] == ""
        if s["kind"] == "table":
            lines = s["text"].split("\n")
            assert len(lines) >= 2
            assert all(
                ln.startswith("| ") and ln.endswith(" |") for ln in lines
            )
            assert set(lines[1].replace("|", "").split()) <= {"---"}
        if s["kind"] == "text":
            assert s["text"].strip() != ""

    # determinism
    assert extract_document(spans) == out


@settings(max_examples=60, deadline=None, derandomize=True)
@given(documents(), documents())
def test_arrow_pandas_agree_on_arbitrary_input(a, b):
    import pyarrow as pa

    from gpt4ocontentextraction_spark.operators.extract import (
        _extract_batch,
        _extract_batch_pandas,
    )

    span_t = pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
    schema = pa.schema(
        [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(span_t))]
    )
    batch = pa.RecordBatch.from_pylist(
        [{"doc_id": "a", "spans": a}, {"doc_id": "b", "spans": b}],
        schema=schema,
    )
    assert _extract_batch(batch).to_pylist() == _extract_batch_pandas(
        batch
    ).to_pylist()
