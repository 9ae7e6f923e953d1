"""Common-Crawl-style pages source (BASELINE.json ``input_hint``).

Schema: ``url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING`` (+ derived ``page_key``, ``lat``, ``lon``, ``cell``).

Deterministic synthesis from the driver's ``documents`` table so the
DuckDB oracle can reproduce every derived column with pure SQL; the
``copies`` amplifier scales the table for benches (sf0.1 documents ×
copies ≈ millions of pages) without external data.

The per-row invariant "byte-identical extracted text per url" is
honored by construction *and verified*: ``html`` embeds the document
text (entity-escaped), and :func:`extract_text` — a pure Column
function of the html bytes, no UDF — recovers exactly the ``text``
column, independent of partitioning/parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth
from .geo import grid_encode, dd_grid_encode

PAGES_COPIES_DEFAULT = 1


def page_key(doc_id: Column, copy: Column, copies: int) -> Column:
    return (doc_id * copies + copy).cast("long")


def _escape(col: Column) -> Column:
    return F.replace(F.replace(col, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;"))


def make_html(text: Column, title: Column) -> Column:
    """Deterministic html bytes embedding the (escaped) document text.

    The title escapes through the SAME chain as the body: an unescaped
    title containing markup (e.g. a ``<body><p>`` substring in a URL)
    would shift :func:`extract_text`'s anchor and corrupt the
    byte-identity invariant."""
    page = F.concat(
        F.lit("<html><head><title>"),
        _escape(title),
        F.lit("</title></head><body><p>"),
        _escape(text),
        F.lit("</p></body></html>"),
    )
    return F.encode(page, "UTF-8")


def extract_text(html: Column) -> Column:
    """Pure function of the html bytes → extracted text.

    Native Column expr (decode → take <body><p> payload → unescape);
    being UDF-free makes byte-identical output trivially independent of
    executor count, partitioning, and batch boundaries.
    """
    s = F.decode(html, "UTF-8")
    # (?s) = DOTALL: document text may contain newlines; Java regex '.'
    # does not cross lines by default, which would extract "" silently.
    body = F.regexp_extract(s, r"(?s)<body><p>(.*)</p></body>", 1)
    return F.replace(
        F.replace(body, F.lit("&lt;"), F.lit("<")), F.lit("&amp;"), F.lit("&")
    )


def synth_pages(
    spark: SparkSession,
    sf_dir: str,
    copies: int = PAGES_COPIES_DEFAULT,
    res: int = 12,
    with_html: bool = True,
) -> DataFrame:
    """Deterministic pages table from ``{sf_dir}/documents.parquet``.

    One page per (document, copy); geotag = deterministic function of
    ``page_key`` (the pluggable geocoder's test-scale implementation,
    see :mod:`hexspark.geo`); ``cell`` = grid-encoded at ``res``.
    """
    if copies < 1:
        # F.sequence(0, copies-1) would silently step BACKWARDS for
        # copies=0 (emitting copy=-1 rows) while the DuckDB twin's
        # RANGE(0) emits nothing — fail loudly instead of diverging
        raise ValueError(f"synth_pages: copies must be >= 1, got {copies}")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"),
    ).withColumn("page_key", page_key(F.col("doc_id"), F.col("copy"), copies))
    lat, lon = synth.latlon_from_key(F.col("page_key"))
    pages = (
        pages.withColumn(
            "url",
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.org/doc/"),
                F.col("doc_id").cast("string"),
                F.lit("/"),
                F.col("copy").cast("string"),
            ),
        )
        .withColumn(
            "warc_ts",
            F.timestamp_seconds(F.lit(1700000000) + (F.col("page_key") % 31536000)),
        )
        .withColumn("lat", lat)
        .withColumn("lon", lon)
        .withColumn("cell", grid_encode(F.col("lat"), F.col("lon"), res))
    )
    if with_html:
        pages = pages.withColumn(
            "html", make_html(F.col("text"), F.col("url"))
        ).withColumn("text", extract_text(F.col("html")))
    return pages.select(
        "doc_id", "page_key", "url", "warc_ts",
        *(["html"] if with_html else []),
        "text", "lang", "lat", "lon", "cell",
    )


def dd_pages_cte(copies: int = PAGES_COPIES_DEFAULT, res: int = 12) -> str:
    """DuckDB CTE body reproducing the oracle-relevant page columns
    (key/url/lat/lon/cell — html excluded, it is Spark-side verified)."""
    key = f"(doc_id * {copies} + copy)"
    lat, lon = synth.dd_latlon_from_key(key)
    cell = dd_grid_encode(lat, lon, res)
    return f"""
        SELECT
            doc_id,
            {key} AS page_key,
            'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(copy AS VARCHAR) AS url,
            lang,
            text,
            {lat} AS lat,
            {lon} AS lon,
            {cell} AS cell
        FROM documents, (SELECT UNNEST(RANGE({copies})) AS copy)
    """
