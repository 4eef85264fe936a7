"""WARC shard source (sources/warc.py): writer/parser round trips and
the Spark shard -> records -> documents -> spans pipeline."""

from __future__ import annotations

import gzip

import pytest

from gpt4ocontentextraction_spark.operators.html import html_to_spans
from gpt4ocontentextraction_spark.sources.warc import (
    parse_warc,
    read_warc,
    warc_responses_to_documents,
    write_warc,
)

_RECS = [
    {"url": "http://a.example/x", "body": "<html>\n<body>\n<h1>T</h1>\n"
     "<p>hello world</p>\n</body>\n</html>"},
    {"url": "http://b.example/y", "body": b"\x00\x01WARC/1.0\r\n\r\nfake"
     b" separator inside payload \r\n\r\n tail",
     "http_content_type": "application/octet-stream"},
    {"url": "http://c.example/z", "body": "not found", "status": 404},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    blob = write_warc(_RECS, per_record_gzip=gz)
    if gz:
        assert blob[:2] == b"\x1f\x8b"
        # deterministic bytes (mtime pinned)
        assert blob == write_warc(_RECS, per_record_gzip=gz)
    recs = parse_warc(blob)
    assert [r["url"] for r in recs] == [r["url"] for r in _RECS]
    assert all(r["warc_type"] == "response" for r in recs)
    assert [r["http_status"] for r in recs] == [200, 200, 404]
    # Content-Length walk: the separator-lookalike payload survives
    assert recs[1]["payload"] == _RECS[1]["body"]
    assert recs[1]["content_type"] == "application/octet-stream"
    assert recs[0]["payload"] == _RECS[0]["body"].encode()
    # deterministic record ids, spec-shaped
    assert recs[0]["record_id"].startswith("<urn:uuid:")
    assert parse_warc(blob)[0]["record_id"] == recs[0]["record_id"]


def test_parse_rejects_desync():
    with pytest.raises(ValueError, match="desync"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")


def test_multi_member_gzip_is_concatenation():
    one = write_warc(_RECS[:1], per_record_gzip=True)
    two = write_warc(_RECS[1:2], per_record_gzip=True)
    recs = parse_warc(one + two)
    assert [r["url"] for r in recs] == [_RECS[0]["url"], _RECS[1]["url"]]
    # and a whole-shard single-member gzip also parses
    whole = gzip.compress(write_warc(_RECS), mtime=0)
    assert len(parse_warc(whole)) == 3


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "shard-00.warc.gz").write_bytes(
        write_warc(_RECS, per_record_gzip=True)
    )
    (tmp_path / "shard-01.warc").write_bytes(write_warc(_RECS[:1]))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4
    assert {r["record_no"] for r in rows} == {0, 1, 2}
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_shard["shard-00.warc.gz"]) == 3
    assert len(by_shard["shard-01.warc"]) == 1


def test_responses_to_documents_and_spans(spark, tmp_path):
    (tmp_path / "s.warc").write_bytes(write_warc(_RECS))
    docs = warc_responses_to_documents(read_warc(spark, str(tmp_path)))
    got = docs.collect()
    # 404 and non-HTML rows are filtered; only the HTML 200 survives
    assert len(got) == 1
    assert got[0]["url"] == "http://a.example/x"
    assert "<h1>T</h1>" in got[0]["text"]
    assert 0 <= got[0]["doc_id"] < (1 << 62)
    spans = html_to_spans(
        docs.selectExpr("doc_id", "text as html")
    ).selectExpr("doc_id", "inline(spans)").collect()
    texts = [r["text"] for r in spans]
    assert "hello world" in texts
