"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference rasterizes pages to PNG and base64-ships them to a vision
model (docker/main.py:209-231). At 100 TB, media lives as opaque ``binary``
columns with typed metadata beside the text spans; decode/feature/resize/
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.

The container has no image/audio libraries, so the byte-level payloads use
a deterministic FAKE codec (documented below) and the pixel-level decode
is STUBBED — but everything Spark-side is real and tested: the binary
column plumbing, schemas, batch shapes, UDF signatures, and the
media_ref join from extracted `media` spans to this table (Q4 citation
resolution, docker/main.py:825-847).

FAKE codec (media payloads are synthesized from media_ref, so tests are
hermetic): ``b"FAKE" + width:int32le + height:int32le + payload`` where
payload bytes are a seeded LCG stream of width*height//64 bytes. "Video"
payloads are N fixed-size frames back to back.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKE"
HEADER_FMT = "<4sii"
HEADER_SIZE = struct.calcsize(HEADER_FMT)
FRAME_BYTES = 256

MEDIA_SCHEMA_DDL = (
    "media_ref string, media_kind string, mime string, width int, height int,"
    " n_frames int, data binary"
)
FEATURES_DDL = (
    "media_ref string, width int, height int, n_frames int,"
    " payload_len long, mean_byte double, checksum long"
)


def _lcg_bytes(seed: int, n: int) -> np.ndarray:
    # deterministic byte stream. The LCG recurrence is sequential, so this
    # is a per-byte Python loop — fixture synthesis only, never a data
    # path (payloads are tens of bytes).
    out = np.empty(n, dtype=np.uint8)
    x = np.uint64(seed % (1 << 31) or 1)
    a, c, m = np.uint64(1103515245), np.uint64(12345), np.uint64(1 << 31)
    for i in range(n):
        x = (a * x + c) % m
        out[i] = np.uint8((x >> np.uint64(16)) & np.uint64(0xFF))
    return out


def encode_fake(seed: int, width: int, height: int, n_frames: int = 1) -> bytes:
    payload = _lcg_bytes(seed, max(1, (width * height) // 64) * n_frames)
    return struct.pack(HEADER_FMT, MAGIC, width, height) + payload.tobytes()


def synthesize_media_table(spark, extracted: DataFrame) -> DataFrame:
    """Build the media table from the media_refs the extractor emitted —
    one binary blob per referenced chart/figure (hermetic stand-in for the
    object store the refs would point at)."""
    refs = (
        extracted.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .filter(F.col("s.media_ref") != "")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seeds = pdf["media_ref"].map(
                lambda r: sum(ord(c) * (31 ** (i % 5)) for i, c in enumerate(r))
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": np.where(
                        seeds % 3 == 0, "video", "image"
                    ),
                    "mime": np.where(
                        seeds % 3 == 0, "video/fake", "image/fake"
                    ),
                    "width": (seeds % 64 + 8).astype("int32"),
                    "height": (seeds % 48 + 8).astype("int32"),
                    "n_frames": np.where(seeds % 3 == 0, 4, 1).astype("int32"),
                    "data": [
                        encode_fake(int(s), int(s % 64 + 8), int(s % 48 + 8),
                                    4 if s % 3 == 0 else 1)
                        for s in seeds
                    ],
                }
            )

    return refs.mapInPandas(gen, MEDIA_SCHEMA_DDL)


def ingest_media_dir(spark, path: str, recursive: bool = True) -> DataFrame:
    """S2/S3 -> media-table bridge: scan a directory of media blobs
    (sources/tables.py::scan_binary_dir) into the MEDIA_SCHEMA shape.
    Width/height come from each blob's header, frame count from the
    payload length; media_ref is the file stem. Real-codec blobs route
    to the _decode_real stub like everywhere else."""
    import os

    from ..sources.tables import scan_binary_dir

    raw = scan_binary_dir(spark, path, recursive=recursive)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                # truncated/foreign blobs route to the real decoder and
                # NEVER fall through to the fake-codec unpack below: if
                # _decode_real is ever implemented to return decoded
                # data, its result must be appended here, not ignored.
                if len(blob) < HEADER_SIZE:  # pragma: no cover
                    _decode_real(blob)
                    raise AssertionError(
                        "_decode_real returned; route its result"
                    )
                magic, w, h = struct.unpack_from(HEADER_FMT, blob, 0)
                if magic != MAGIC:  # pragma: no cover
                    _decode_real(blob)
                    raise AssertionError(
                        "_decode_real returned; route its result"
                    )
                frame_len = max(1, (w * h) // 64)
                frames = max(1, (len(blob) - HEADER_SIZE) // frame_len)
                ref = os.path.splitext(os.path.basename(p))[0]
                kind = "video" if frames > 1 else "image"
                rows.append(
                    (ref, kind, f"{kind}/fake", w, h, frames, blob)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "media_kind", "mime", "width", "height",
                    "n_frames", "data",
                ],
            ).astype(
                {"width": "int32", "height": "int32", "n_frames": "int32"}
            )

    return raw.mapInPandas(run, MEDIA_SCHEMA_DDL)


def decode_features(media: DataFrame) -> DataFrame:
    """Parse headers + payload statistics, Arrow-batched (mapInPandas).
    Where a real image library would decode pixels, this raises through to
    the deterministic fake-codec parse — see `_decode_real` stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, blob, frames in zip(
                pdf["media_ref"], pdf["data"], pdf["n_frames"]
            ):
                magic, w, h = struct.unpack_from(HEADER_FMT, blob, 0)
                if magic != MAGIC:  # pragma: no cover
                    _decode_real(blob)
                    raise AssertionError(
                        "_decode_real returned; route its result"
                    )
                payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_SIZE)
                rows.append(
                    (
                        ref,
                        w,
                        h,
                        int(frames),
                        len(payload),
                        float(payload.mean()),
                        int(payload.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref",
                    "width",
                    "height",
                    "n_frames",
                    "payload_len",
                    "mean_byte",
                    "checksum",
                ],
            ).astype({"width": "int32", "height": "int32", "n_frames": "int32"})

    return media.select(
        "media_ref", "data", "n_frames"
    ).mapInPandas(run, FEATURES_DDL)


def resize(media: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Subsample payload to the new dimensions (fake-codec 'resize')."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["data"]:
                magic, w, h = struct.unpack_from(HEADER_FMT, blob, 0)
                payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_SIZE)
                n_new = max(1, (new_width * new_height) // 64)
                idx = np.linspace(0, len(payload) - 1, n_new).astype(np.int64)
                out.append(
                    struct.pack(HEADER_FMT, MAGIC, new_width, new_height)
                    + payload[idx].tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "width": np.int32(new_width),
                    "height": np.int32(new_height),
                    "data": out,
                }
            )

    return media.select("media_ref", "data").mapInPandas(
        run, "media_ref string, width int, height int, data binary"
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode video payloads into every-k-th frame rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, fnos, frames = [], [], []
            for ref, blob, n in zip(
                pdf["media_ref"], pdf["data"], pdf["n_frames"]
            ):
                payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_SIZE)
                per = max(1, len(payload) // max(int(n), 1))
                for f in range(0, int(n), every_k):
                    refs.append(ref)
                    fnos.append(f)
                    frames.append(payload[f * per:(f + 1) * per].tobytes())
            yield pd.DataFrame(
                {"media_ref": refs, "frame_no": np.array(fnos, dtype="int32"),
                 "frame": frames}
            )

    return (
        media.filter(F.col("media_kind") == "video")
        .select("media_ref", "data", "n_frames")
        .mapInPandas(run, "media_ref string, frame_no int, frame binary")
    )


def _decode_real(blob: bytes):
    """Real-codec decode would go here (PIL / libav are not in this
    container). Clearly-marked stub per the build contract."""
    raise NotImplementedError(
        "real image/audio decoding requires PIL/libav, not present in this"
        " environment; the fake-codec path covers the Spark plumbing"
    )


def resolve_citations(extracted: DataFrame, media: DataFrame) -> DataFrame:
    """Q4: join extracted media spans to the media table on media_ref
    (docker/main.py:825-847 citation -> artifact resolution)."""
    spans = (
        extracted.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .filter(F.col("s.media_ref") != "")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.text").alias("caption"),
        )
    )
    return spans.join(
        F.broadcast(media.select("media_ref", "media_kind", "width", "height")),
        "media_ref",
    )
