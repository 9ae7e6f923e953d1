"""WARC source — Common Crawl's wire format, read without external deps.

``read_warc`` turns a directory of ``.warc`` / ``.warc.gz`` files into a
DataFrame of records (one row per WARC record, HTTP responses pre-split
into status / headers-derived content type / body), so the corpus
pipeline can start from the archives crawls actually ship as instead of
pre-extracted parquet.

Format notes (ISO 28500): a record is a ``WARC/1.x`` version line,
CRLF-separated headers, CRLF CRLF, ``Content-Length`` bytes of block,
CRLF CRLF.  Common Crawl gzips each record as its own gzip member and
concatenates them (``.warc.gz`` multistream) — handled by looping a
zlib decompressor over ``unused_data``.

Scale shape: files load via Spark's ``binaryFile`` source (one task per
file — CC segments are ~1 GB, sized to fit executor memory; the
parallelism unit at 100 TB is the ~100k files of a crawl, not bytes
within a file) and parse in ONE Arrow-batched ``mapInPandas`` pass —
record splitting is inherently sequential within a file, so per-file
tasks are the natural grain.  Everything downstream is columnar.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

WARC_SCHEMA = StructType([
    StructField("src_file", StringType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("record_id", StringType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("body", BinaryType()),
])


def _gunzip_multistream(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    parts = []
    buf = data
    while buf:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        parts.append(d.decompress(buf))
        parts.append(d.flush())
        buf = d.unused_data
    return b"".join(parts)


def _split_http(block: bytes) -> tuple[Optional[int], Optional[str], bytes]:
    """(status, content-type, body) from an HTTP response block; the
    block passes through unsplit when it isn't an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    status: Optional[int] = None
    ctype: Optional[str] = None
    try:
        status = int(lines[0].split(b" ")[1])
    except (IndexError, ValueError):
        pass
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_bytes(data: bytes, src: str = "") -> Iterator[dict]:
    """Yield record dicts (WARC_SCHEMA fields) from raw archive bytes;
    transparently gunzips multistream archives."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_multistream(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate padding CRLFs between records
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"{src}: expected WARC/ header at byte {pos}, found "
                f"{data[pos:pos + 16]!r}"
            )
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"{src}: unterminated record header at {pos}")
        headers: dict[str, str] = {}
        for ln in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(
                f"{src}: record at {pos} has no valid Content-Length"
            ) from exc
        body_start = hdr_end + 4
        block = data[body_start:body_start + length]
        if len(block) != length:
            raise ValueError(
                f"{src}: truncated record at {pos} "
                f"({len(block)} of {length} block bytes)"
            )
        status, ctype, body = _split_http(block)
        yield {
            "src_file": src,
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "http_status": status,
            "http_content_type": ctype or headers.get("content-type"),
            "body": body,
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: "Optional[Sequence[str]]" = ("response",),
) -> DataFrame:
    """WARC archive(s) → record DataFrame (WARC_SCHEMA).

    ``record_types``: keep only these WARC-Type values (default the
    ``response`` records a corpus builder wants); ``None`` keeps all.
    The filter runs inside the parser, so request/metadata records
    never enter the Arrow channel.
    """
    import pandas as pd

    keep = set(record_types) if record_types is not None else None

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = [
                    r
                    for r in parse_warc_bytes(row["content"], row["path"])
                    if keep is None or r["warc_type"] in keep
                ]
                yield pd.DataFrame(
                    {c: [r[c] for r in recs] for c in cols}
                )

    files = spark.read.format("binaryFile").load(path)
    # manual prune: Catalyst can't push projection through mapInPandas
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def strip_html_tags(html_text: Column) -> Column:
    """Naive native-Column HTML→text: drop script/style payloads, strip
    tags, unescape the three entities :mod:`hexspark.pages` escapes,
    squeeze whitespace.  A deliberately simple, deterministic stand-in
    for a real extractor (trafilatura-class tools are not in this
    environment); good enough for dedup/quality scoring over crawl
    bodies, and UDF-free so it stays in codegen."""
    t = F.regexp_replace(
        html_text, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    t = F.replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def lossy_utf8(body: Column) -> Column:
    """binary → string, UTF-8 with ``errors='replace'``.

    Spark 4's ANSI-mode ``F.decode(col, 'UTF-8')`` raises
    MALFORMED_CHARACTER_CODING on the first invalid byte — one dirty
    crawl body would abort a whole ingestion job.  Crawl bytes are
    dirty by nature (truncated multibyte sequences, mislabeled
    charsets), so decode leniently via an Arrow-batched pandas UDF;
    invalid sequences become U+FFFD instead of exceptions.  Prune to
    the body column before calling — Catalyst can't push projection
    through the Python boundary."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _decode(s):
        return s.map(
            lambda b: None if b is None else bytes(b).decode(
                "utf-8", errors="replace"
            )
        )

    return _decode(body)


def docs_from_warc(
    warc: DataFrame,
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """Record table → documents-shaped relation (doc key, url, text):
    keep 2xx HTML responses, decode bodies as UTF-8 (lossy — invalid
    bytes become U+FFFD via :func:`lossy_utf8`; crawl bytes are dirty
    by nature and must not abort the job), strip tags natively.  The
    doc key is the 60-bit md5-prefix of the URI (dedup._h64 —
    consistent with every other cross-engine key in the repo)."""
    from .dedup import _h64

    html = (
        warc.filter(
            (F.col("http_status") >= min_status)
            & (F.col("http_status") <= max_status)
        )
        .filter(F.lower(F.col("http_content_type")).contains("html"))
        .select(
            F.col("target_uri").alias("url"),
            lossy_utf8(F.col("body")).alias("__html"),
        )
    )
    return html.select(
        _h64(F.col("url")).alias("doc_id"),
        "url",
        strip_html_tags(F.col("__html")).alias("text"),
    )


def build_warc_bytes(
    records: Sequence[tuple[str, str, bytes]],
    gzip_members: bool = False,
) -> bytes:
    """Test-fixture builder: (warc_type, uri, block) triples → archive
    bytes, optionally as per-record gzip members (the CC layout)."""
    import gzip as _gzip

    out = []
    for i, (rtype, uri, block) in enumerate(records):
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:0{i}Z\r\n"
            f"WARC-Record-ID: <urn:test:{i}>\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        rec = hdr + block + b"\r\n\r\n"
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
