"""WARC shard source — the Common Crawl ingestion shape (ISO 28500).

The reference ingests documents one HTTP download at a time
(docker/main.py:457-463 dispatches on extension after download); a
100-TB web-scale pipeline ingests the same content as WARC shards —
concatenated request/response records, one ~1 GB gzip file per crawl
segment. This module is the source bridge: shard files -> one row per
archived response -> the existing HTML front end (operators/html.py)
turns payloads into the span relation every downstream operator
(chunking, dedup, curation, retrieval) already consumes.

Spark shape, sized for the real thing:
- the SHARD is the unit of parallelism (binaryFile scan, one task per
  shard) — exactly how Common Crawl is meant to be read: records
  inside a shard are sequential (gzip members / Content-Length walks),
  shards are embarrassingly parallel. 100 TB = ~100k shards >> cores,
  so per-shard granularity saturates any cluster without a shuffle.
- record explode runs in Arrow-batched mapInPandas; nothing touches
  the driver.
- parsing is Content-Length-driven per the spec (never split on the
  separator string — payloads may contain it).

Writer + parser are both here so fixtures are hermetic and round-trip
tested: `write_warc` emits deterministic WARC/1.0 bytes (plain or
per-record gzip members, the Common Crawl layout; record IDs are
content-hash-derived, no randomness).
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "WARC_RECORDS_DDL",
    "write_warc",
    "parse_warc",
    "read_warc",
    "warc_responses_to_documents",
]

WARC_RECORDS_DDL = (
    "shard string, record_no int, warc_type string, record_id string,"
    " url string, warc_date string, http_status int, content_type string,"
    " payload binary"
)

_CRLF = b"\r\n"


def _record_id(url: str, no: int) -> str:
    """Deterministic urn:uuid from (url, position) — spec-shaped,
    randomness-free (fixtures must be stable)."""
    h = hashlib.sha1(f"{no}:{url}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def write_warc(records, per_record_gzip: bool = False) -> bytes:
    """records: iterable of dicts with keys url, body (bytes), and
    optional date / http_content_type / status. Emits WARC/1.0
    response records whose content block is a full HTTP/1.1 response.
    per_record_gzip=True writes each record as its own gzip member
    (the Common Crawl shard layout)."""
    out = bytearray()
    for no, rec in enumerate(records):
        body = rec["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        ctype = rec.get("http_content_type", "text/html")
        status = int(rec.get("status", 200))
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        date = rec.get("date", "2017-01-01T00:00:00Z")
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: {_record_id(rec['url'], no)}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"WARC-Target-URI: {rec['url']}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + _CRLF
        )
        record = hdr + http + _CRLF + _CRLF
        if per_record_gzip:
            # fixed mtime/filename-free header => deterministic bytes
            out += gzip.compress(record, compresslevel=6, mtime=0)
        else:
            out += record
    return bytes(out)


def _is_gzip(blob: bytes) -> bool:
    return bytes(blob[:2]) == b"\x1f\x8b"


def parse_warc(blob: bytes) -> list[dict]:
    """WARC shard bytes (plain or gzip; multi-member gzip handled) ->
    list of record dicts. Content-Length-driven walk per the spec."""
    if _is_gzip(blob):
        # zlib with gzip wbits consumes ONE member; loop for the
        # concatenated-members Common Crawl layout
        parts, pos = [], 0
        data = bytes(blob)
        while pos < len(data):
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            parts.append(d.decompress(data[pos:]))
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("corrupt gzip member in WARC shard")
            pos += consumed
        blob = b"".join(parts)
    records = []
    pos, n = 0, len(blob)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"WARC record desync at byte {pos}")
        hdr_end = blob.index(b"\r\n\r\n", pos)
        head = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        content = blob[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        rec = {
            "warc_type": fields.get("warc-type", ""),
            "record_id": fields.get("warc-record-id", ""),
            "url": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "http_status": None,
            "content_type": fields.get("content-type", ""),
            "payload": content,
        }
        if rec["warc_type"] == "response" and content.startswith(b"HTTP/"):
            he = content.find(b"\r\n\r\n")
            http_head = content[:he].decode("latin-1").split("\r\n")
            status_parts = http_head[0].split(" ", 2)
            rec["http_status"] = (
                int(status_parts[1]) if len(status_parts) > 1 else None
            )
            for line in http_head[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    rec["content_type"] = v.strip()
            rec["payload"] = content[he + 4:]
        records.append(rec)
    return records


def read_warc(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Shard directory -> one row per WARC record (WARC_RECORDS_DDL).

    binaryFile scan (one task per shard — the Common Crawl parallelism
    unit) -> Arrow-batched record explode. No shuffle; downstream
    repartitioning is the consumer's choice."""
    from .tables import scan_binary_dir

    raw = scan_binary_dir(spark, path, recursive=True, glob=glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf["path"], pdf["content"]):
                for no, rec in enumerate(parse_warc(bytes(blob))):
                    rows.append(
                        (
                            shard,
                            no,
                            rec["warc_type"],
                            rec["record_id"],
                            rec["url"],
                            rec["warc_date"],
                            rec["http_status"],
                            rec["content_type"],
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "record_no", "warc_type", "record_id", "url",
                    "warc_date", "http_status", "content_type", "payload",
                ],
            ).astype({"record_no": "int32"})

    return raw.select("path", "content").mapInPandas(run, WARC_RECORDS_DDL)


def warc_responses_to_documents(records: DataFrame) -> DataFrame:
    """Archived 200-status HTML responses -> the documents shape
    (doc_id, url, text) feeding the HTML front end / extraction kernel.
    doc_id is the 63-bit url hash (deterministic, join-stable across
    shards); payload decodes as UTF-8 with replacement."""
    from pyspark.sql import functions as F

    return (
        records.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            F.pmod(F.xxhash64("url"), F.lit(1 << 62)).alias("doc_id"),
            "url",
            F.decode("payload", "UTF-8").alias("text"),
        )
    )
