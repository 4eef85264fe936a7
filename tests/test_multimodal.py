"""Multimodal plumbing: binary columns, Arrow-batched decode/resize/frame
ops, and the media_ref citation-resolution join — hermetic via the fake
codec (real pixel decode is stubbed, see operators/multimodal.py)."""

from __future__ import annotations

import pytest

from gpt4ocontentextraction_spark.fixtures import corpus_to_spark, make_corpus
from gpt4ocontentextraction_spark.operators import multimodal as mm
from gpt4ocontentextraction_spark.operators.extract import extract


@pytest.fixture(scope="module")
def extracted(spark):
    pdf, _ = make_corpus(seed=3, docs_per_class=3, include_giant=False)
    return extract(corpus_to_spark(spark, pdf))


@pytest.fixture(scope="module")
def media(spark, extracted):
    return mm.synthesize_media_table(spark, extracted).cache()


def test_media_table_schema_and_blobs(media):
    rows = media.collect()
    assert rows, "extractor emitted no media refs"
    for r in rows:
        assert isinstance(r["data"], (bytes, bytearray))
        assert bytes(r["data"][:4]) == mm.MAGIC
        assert r["mime"] in ("image/fake", "video/fake")


def test_decode_features(media):
    feats = mm.decode_features(media).collect()
    by_ref = {r["media_ref"]: r for r in feats}
    for r in media.collect():
        f = by_ref[r["media_ref"]]
        assert f["width"] == r["width"] and f["height"] == r["height"]
        assert f["payload_len"] == len(r["data"]) - mm.HEADER_SIZE
        assert 0.0 <= f["mean_byte"] <= 255.0


def test_resize_changes_header_and_payload(media):
    out = {r["media_ref"]: r for r in mm.resize(media, 16, 16).collect()}
    for r in media.collect():
        o = out[r["media_ref"]]
        assert (o["width"], o["height"]) == (16, 16)
        magic, w, h = __import__('struct').unpack_from(mm.HEADER_FMT, bytes(o["data"]), 0)
        assert (magic, w, h) == (mm.MAGIC, 16, 16)
        assert len(o["data"]) - mm.HEADER_SIZE == max(1, 16 * 16 // 64)


def test_frame_sampling(media):
    vids = media.filter("media_kind = 'video'").collect()
    frames = mm.sample_frames(media, every_k=2).collect()
    if not vids:
        assert frames == []
        return
    per_ref = {}
    for f in frames:
        per_ref.setdefault(f["media_ref"], []).append(f["frame_no"])
    for v in vids:
        assert sorted(per_ref[v["media_ref"]]) == [0, 2]  # 4 frames, k=2


def test_citation_resolution_join(extracted, media):
    resolved = mm.resolve_citations(extracted, media)
    n_media_spans = (
        extracted.selectExpr(
            "size(filter(spans, s -> s.kind = 'media' and s.media_ref != ''))"
            " as n"
        ).groupBy().sum("n").collect()[0][0]
    )
    assert resolved.count() == n_media_spans
    assert set(resolved.columns) == {
        "media_ref", "doc_id", "caption", "media_kind", "width", "height"
    }


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"PNG...")


def test_ingest_media_dir_round_trip(spark, tmp_path):
    """S2/S3 directory scan feeds the media table: files written with the
    fake codec scan back with header metadata intact and identical
    decode_features to the in-memory path."""
    import os

    from gpt4ocontentextraction_spark.operators.multimodal import (
        decode_features,
        encode_fake,
        ingest_media_dir,
    )

    d = tmp_path / "media"
    os.makedirs(d)
    want = {}
    for i, (w, h, frames) in enumerate([(16, 8, 1), (32, 16, 4), (8, 8, 2)]):
        blob = encode_fake(100 + i, w, h, frames)
        (d / f"m{i}.fake").write_bytes(blob)
        want[f"m{i}"] = (w, h, frames, len(blob))

    media = ingest_media_dir(spark, str(d))
    rows = {r["media_ref"]: r for r in media.collect()}
    assert set(rows) == set(want)
    for ref, (w, h, frames, blen) in want.items():
        r = rows[ref]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, frames)
        assert len(r["data"]) == blen
        assert r["media_kind"] == ("video" if frames > 1 else "image")

    feats = {r["media_ref"]: r for r in decode_features(media).collect()}
    for ref, (w, h, frames, blen) in want.items():
        f = feats[ref]
        assert f["payload_len"] == blen - 12  # header is 4s+i+i
        assert f["n_frames"] == frames
