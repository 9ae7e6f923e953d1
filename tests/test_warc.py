"""WARC source: parser, gzip multistream, Spark reader, doc shaping."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexspark.warc import (  # noqa: E402
    build_warc_bytes, docs_from_warc, parse_warc_bytes, read_warc,
)


def _http(status: int, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Server: t\r\n\r\n"
    ).encode() + body


RECORDS = [
    ("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"),
    (
        "response",
        "http://a.example/",
        _http(200, "text/html; charset=utf-8",
              b"<html><body><p>Alpha &amp; beta</p>"
              b"<script>var x=1;</script></body></html>"),
    ),
    (
        "response",
        "http://b.example/missing",
        _http(404, "text/html", b"<html><body>gone</body></html>"),
    ),
    (
        "response",
        "http://c.example/img",
        _http(200, "image/png", b"\x89PNG..."),
    ),
]


def test_parse_plain_and_gzip_agree():
    plain = list(parse_warc_bytes(build_warc_bytes(RECORDS)))
    gz = list(parse_warc_bytes(build_warc_bytes(RECORDS, gzip_members=True)))
    assert plain == gz
    assert [r["warc_type"] for r in plain] == [
        "request", "response", "response", "response",
    ]
    ok = plain[1]
    assert ok["http_status"] == 200
    assert ok["http_content_type"].startswith("text/html")
    assert ok["body"].startswith(b"<html>")
    assert plain[0]["http_status"] is None  # request block isn't HTTP resp


def test_parse_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="expected WARC/"):
        list(parse_warc_bytes(b"NOT A WARC"))
    data = build_warc_bytes(RECORDS)[:-30]
    with pytest.raises(ValueError, match="truncated|unterminated"):
        list(parse_warc_bytes(data))


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc_bytes(RECORDS))
    (tmp_path / "b.warc.gz").write_bytes(
        build_warc_bytes(RECORDS, gzip_members=True)
    )
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    # responses only (default filter), from both files
    assert len(rows) == 6
    assert {r["warc_type"] for r in rows} == {"response"}
    assert {os.path.basename(r["src_file"].replace("file:", ""))
            for r in rows} == {"a.warc", "b.warc.gz"}
    everything = read_warc(spark, str(tmp_path), record_types=None)
    assert everything.count() == 8


def test_docs_from_warc(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc_bytes(RECORDS))
    docs = docs_from_warc(read_warc(spark, str(tmp_path))).collect()
    # 200 + html only: the 404 and the png drop out
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "http://a.example/"
    assert d["text"] == "Alpha & beta"  # tags + script stripped, entity unescaped
    assert d["doc_id"] >= 0


def test_docs_from_warc_malformed_utf8(spark, tmp_path):
    # real crawl bodies contain invalid byte sequences; the lossy decode
    # must map them to U+FFFD instead of aborting the job (Spark 4 ANSI
    # F.decode raises MALFORMED_CHARACTER_CODING)
    dirty = [
        (
            "response",
            "http://dirty.example/",
            _http(200, "text/html; charset=utf-8",
                  b"<html><body>ok \xff\xfe bad \xc3(</body></html>"),
        ),
    ]
    (tmp_path / "dirty.warc").write_bytes(build_warc_bytes(dirty))
    docs = docs_from_warc(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    text = docs[0]["text"]
    assert "ok" in text and "bad" in text
    assert "�" in text  # lossy replacement, not an exception
