"""MJPEG-in-AVI real video container (functions/avi.py) + routing."""

from __future__ import annotations

import numpy as np
import pytest

from gpt4ocontentextraction_spark.functions.avi import (
    decode_avi,
    encode_avi_mjpeg,
    is_avi,
)
from gpt4ocontentextraction_spark.operators import multimodal as mm


def _frames(n=4, h=24, w=32):
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        f = np.stack(
            [128 + 70 * np.sin((x + 5 * i) / 6),
             128 + 60 * np.cos((y + 3 * i) / 7),
             np.full((h, w), 30 * i)],
            axis=-1,
        )
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


def test_roundtrip():
    frames = _frames()
    blob = encode_avi_mjpeg(frames, fps=5, quality=92)
    assert is_avi(blob)
    assert blob == encode_avi_mjpeg(frames, fps=5, quality=92)  # stable
    dec = decode_avi(blob)
    assert len(dec) == 4
    for got, want in zip(dec, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 3.0


def test_non_mjpeg_and_non_avi_raise():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # hand-build an AVI whose frame chunk is not JPEG
    blob = bytearray(encode_avi_mjpeg(_frames(1)))
    i = blob.index(b"00dc") + 8
    blob[i:i + 3] = b"\x00\x00\x01"  # clobber the JPEG SOI
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi(bytes(blob))


def test_decode_real_routes_avi_as_video():
    frames = _frames(3)
    dec = mm._decode_real(encode_avi_mjpeg(frames))
    assert dec["kind"] == "video" and dec["mime"] == "video/x-msvideo"
    assert dec["n_frames"] == 3
    assert (dec["width"], dec["height"]) == (32, 24)
    assert dec["pixels"].shape == (24, 32, 3)
    assert len(dec["frames"]) == 3


def test_sample_frames_on_real_avi(spark):
    frames = _frames(4)
    rows = [("vid-1", "video", "video/x-msvideo", 32, 24, 4,
             encode_avi_mjpeg(frames))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA_DDL)
    got = mm.sample_frames(media, every_k=2).collect()
    assert sorted(r["frame_no"] for r in got) == [0, 2]
    from gpt4ocontentextraction_spark.functions.png import decode_png

    for r in got:
        px = decode_png(bytes(r["frame"]))
        assert px.shape == (24, 32, 3)
        want = frames[r["frame_no"]]
        assert np.abs(px.astype(int) - want.astype(int)).mean() < 3.0


def test_resize_keeps_avi_container(spark):
    rows = [("vid-2", "video", "video/x-msvideo", 32, 24, 2,
             encode_avi_mjpeg(_frames(2)))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA_DDL)
    out = mm.resize(media, 16, 12).collect()
    blob = bytes(out[0]["data"])
    assert is_avi(blob)
    dec = decode_avi(blob)
    assert len(dec) == 2 and dec[0].shape == (12, 16, 3)
