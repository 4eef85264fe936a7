"""Pure-stdlib AVI (RIFF) container codec for MJPEG video streams.

With baseline JPEG decodable in-stdlib (functions/jpeg.py), Motion-JPEG
video needs only the RIFF container walk — the same chunk grammar as
WAV (functions/wav.py). Reference analog: media attachments handled as
opaque page artifacts (/root/reference/docker/main.py:209-227); here
the video ones decode to real frames for sampling/resize. That makes "video" a REAL decoded format here
(frame sampling on actual pixels), next to animated GIF; non-MJPEG
video codecs (H.264 etc.) honestly raise. All structures are from the
public Microsoft RIFF/AVI specification (avih / strh / strf /
BITMAPINFOHEADER / LIST-movi with 00dc frame chunks).

- decode: top-level RIFF('AVI ') walk to LIST 'movi'; every '00dc' /
  '00db' chunk is decoded with the real JPEG codec. A stream whose
  frames are not JPEG raises NotImplementedError with the fourcc.
- encode: minimal spec-complete writer (hdrl with avih + one vids strl
  with MJPG fourcc, LIST movi, idx1) over deterministic encode_jpeg
  frames — stable bytes for fixtures and round trips.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg, is_jpeg

__all__ = ["is_avi", "decode_avi", "encode_avi_mjpeg"]


def is_avi(blob: bytes) -> bool:
    return bytes(blob[:4]) == b"RIFF" and bytes(blob[8:12]) == b"AVI "


def _chunks(data: bytes, pos: int, end: int):
    """RIFF chunk walk (word-aligned). Yields (fourcc, payload)."""
    while pos + 8 <= end:
        cid = bytes(data[pos:pos + 4])
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def decode_avi(blob: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of (H, W, C) uint8 frames (MJPEG streams)."""
    if not is_avi(blob):
        raise ValueError("not a RIFF/AVI stream")
    frames: list[np.ndarray] = []
    for cid, body in _chunks(blob, 12, len(blob)):
        if cid != b"LIST" or bytes(body[:4]) != b"movi":
            continue
        for fcc, frame in _chunks(body, 4, len(body)):
            if fcc[2:4] not in (b"dc", b"db"):
                continue  # audio / index / padding chunks
            if not is_jpeg(frame):
                raise NotImplementedError(
                    "AVI frame chunk is not MJPEG (fourcc "
                    f"{fcc!r}); compressed video codecs need libav, "
                    "not present in this environment"
                )
            px = decode_jpeg(bytes(frame))
            if px.ndim == 2:
                px = px[:, :, None]
            frames.append(px)
    if not frames:
        raise ValueError("AVI stream has no video frame chunks")
    return frames


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames, fps: int = 10, quality: int = 90
) -> bytes:
    """uint8 frame arrays (all same shape) -> deterministic MJPEG AVI."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        sum(len(j) for j in jpegs) * fps // max(1, len(jpegs)),
        0,                         # padding granularity
        0x10,                      # AVIF_HASINDEX
        len(jpegs), 0, 1,          # total frames, initial, streams
        max(len(j) for j in jpegs),
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,               # flags, prio+lang, initial frames
            1, fps,                # scale, rate -> fps
            0, len(jpegs),         # start, length
            max(len(j) for j in jpegs),
            0xFFFFFFFF, 0,         # quality, sample size
            0, 0, w & 0xFFFF, h & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame (fourcc, flags, offset from movi start, size)
    idx, off = bytearray(), 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
