"""GIF codec (functions/gif.py: stdlib LZW) and its multimodal routing:
a third REAL image container, and — animated — the real multi-frame
container that lets sample_frames emit actual decoded pixels."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gpt4ocontentextraction_spark.functions.gif import (
    decode_gif,
    encode_gif,
    is_gif,
)
from gpt4ocontentextraction_spark.operators import multimodal as mm


def _rgb(seed: int, h: int, w: int, levels: int = 5) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return (rng.randint(0, levels, (h, w, 3)) * (255 // (levels - 1))).astype(
        np.uint8
    )


def test_gif_roundtrip_gray_rgb_interlaced():
    rng = np.random.RandomState(7)
    gray = (rng.randint(0, 5, (23, 37)) * 50).astype(np.uint8)
    blob = encode_gif(gray)
    assert is_gif(blob)
    assert np.array_equal(decode_gif(blob)[0], np.repeat(gray[:, :, None], 3, 2))
    # a full 256-color palette
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 256
    assert np.array_equal(decode_gif(encode_gif(rgb))[0], rgb)
    # interlaced rows come back in original order
    inter = encode_gif(gray, interlace=True)
    assert inter != blob
    assert np.array_equal(decode_gif(inter)[0], np.repeat(gray[:, :, None], 3, 2))


def test_gif_lzw_code_width_growth_and_clear_reset():
    """12,000 pixels at 216 colors pushes the decoder table through every
    code width to the 12-bit cap and across the encoder's Clear reset —
    the two spots where an LZW off-by-one corrupts the raster."""
    vals = np.array([0, 32, 64, 96, 128, 160], dtype=np.uint8)
    px = vals[np.random.RandomState(3).randint(0, 6, (100, 120, 3))]
    assert np.array_equal(decode_gif(encode_gif(px))[0], px)


def test_gif_animation_roundtrip_and_determinism():
    frames = [_rgb(i, 12, 20, levels=4) for i in range(5)]
    blob = encode_gif(frames)
    got = decode_gif(blob)
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)
    assert encode_gif(frames) == blob  # byte-deterministic


def test_gif_encode_limits():
    with pytest.raises(ValueError):
        encode_gif(np.random.RandomState(0).randint(0, 256, (64, 64, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF000")


def test_gif_ingest_features_over_all_frames(spark, tmp_path):
    """Animated GIF rows as kind video with the real frame count, and
    decode_features statistics cover EVERY frame's decoded pixels."""
    d = tmp_path / "gif_media"
    os.makedirs(d)
    frames = [_rgb(i, 9, 14) for i in range(4)]
    (d / "anim.gif").write_bytes(encode_gif(frames))
    still = _rgb(9, 11, 8)
    (d / "still.gif").write_bytes(encode_gif(still))

    media = mm.ingest_media_dir(spark, str(d))
    rows = {r["media_ref"]: r for r in media.collect()}
    assert (rows["anim"]["media_kind"], rows["anim"]["mime"]) == (
        "video",
        "image/gif",
    )
    assert rows["anim"]["n_frames"] == 4
    assert (rows["still"]["media_kind"], rows["still"]["n_frames"]) == (
        "image",
        1,
    )

    feats = {r["media_ref"]: r for r in mm.decode_features(media).collect()}
    allpx = np.stack(frames)
    assert feats["anim"]["payload_len"] == allpx.size
    assert feats["anim"]["mean_byte"] == pytest.approx(float(allpx.mean()))
    assert feats["anim"]["checksum"] == int(allpx.astype(np.int64).sum())
    assert feats["still"]["payload_len"] == still.size


def test_gif_resize_keeps_container_and_frames(spark, tmp_path):
    from gpt4ocontentextraction_spark.functions.png import nearest_resize

    d = tmp_path / "gif_resize"
    os.makedirs(d)
    frames = [_rgb(i, 10, 24) for i in range(3)]
    (d / "a.gif").write_bytes(encode_gif(frames))
    out = mm.resize(mm.ingest_media_dir(spark, str(d)), 8, 6).collect()
    assert len(out) == 1
    blob = bytes(out[0]["data"])
    assert is_gif(blob)  # GIF stays GIF
    got = decode_gif(blob)
    assert len(got) == 3
    for f, g in zip(frames, got):
        assert np.array_equal(g, nearest_resize(f, 8, 6))


def test_gif_sample_frames_real_pixels(spark, tmp_path):
    """sample_frames on an animated GIF emits every-k-th REAL frame as a
    standalone decodable PNG with the exact decoded pixels."""
    from gpt4ocontentextraction_spark.functions.png import decode_png

    d = tmp_path / "gif_frames"
    os.makedirs(d)
    frames = [_rgb(i, 7, 9) for i in range(6)]
    (d / "clip.gif").write_bytes(encode_gif(frames))
    media = mm.ingest_media_dir(spark, str(d))
    out = mm.sample_frames(media, every_k=2).collect()
    assert [r["frame_no"] for r in sorted(out, key=lambda r: r["frame_no"])] == [
        0,
        2,
        4,
    ]
    for r in out:
        assert np.array_equal(
            decode_png(bytes(r["frame"])), frames[r["frame_no"]]
        )


def test_gif_phash_uses_first_frame(spark, tmp_path):
    from gpt4ocontentextraction_spark.functions.phash import dhash64

    d = tmp_path / "gif_phash"
    os.makedirs(d)
    frames = [_rgb(i, 16, 16) for i in range(2)]
    (d / "p.gif").write_bytes(encode_gif(frames))
    rows = mm.image_phash(mm.ingest_media_dir(spark, str(d))).collect()
    assert len(rows) == 1
    assert rows[0]["phash"] == dhash64(frames[0])
