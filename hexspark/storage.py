"""Region-table storage parity: the DiskTree subsystem re-expressed.

The reference's on-disk tree (header + 122 dptrs + tagged nodes +
varint leaves, /root/reference/src/disktree/) collapses to Parquet:
columnar encoding, footer/row-group pruning, and zero-copy Arrow reads
play the roles of varints, dptr seeks, and mmap.  What must be
preserved is *semantics*:

* lookups against the stored table == in-memory lookups
  (/root/reference/src/disktree/tree.rs:66-114) — free, same DataFrame
  code path over ``spark.read.parquet``;
* iteration order parity: DFS digit order == ascending ``lo(cell)``
  (/root/reference/src/disktree/mod.rs:226-231) — we sort on write so
  row-group min/max on ``__lo`` gives the dptr-skip effect for
  ``descendants`` range scans.

Also provides the reference's raw ingest formats as sources/sinks
(S1 h3idx = LE u64; S2 kepler csv = hex strings).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells as cx


def write_region(
    df: DataFrame, path: str, cell_col: str = "cell", n_files: int = 1
) -> None:
    """Persist a compacted region table sorted by subtree range-start.

    ``n_files=1`` (default, right for broadcast-scale tables): one
    sorted file — global iteration order, maximal row-group pruning on
    the range key.  For large maps pass ``n_files > 1``: a range
    repartition on ``__lo`` keeps files disjoint and internally sorted
    (iteration order = file order; ``descendants`` range scans prune to
    one file + row group), written by ``n_files`` parallel tasks
    instead of a single writer."""
    keyed = df.withColumn("__lo", cx.lo(cell_col))
    if n_files <= 1:
        keyed = keyed.repartition(1).sortWithinPartitions("__lo")
    else:
        keyed = keyed.repartitionByRange(n_files, "__lo").sortWithinPartitions("__lo")
    keyed.write.mode("overwrite").parquet(path)


def write_region_iceberg(
    df: DataFrame, table: str, cell_col: str = "cell"
) -> None:
    """S4 sink, Iceberg flavor (north_rule: Iceberg-style tables):
    ``df.writeTo(table).using('iceberg')`` sorted by ``lo`` for range
    pruning.  Requires an Iceberg catalog on the session
    (spark.sql.catalog.* confs + iceberg-spark-runtime jar) — absent
    here, this raises with guidance rather than writing a plain table
    silently.

    Unlike the parquet path (whose ``read_region`` twin hides the sort
    key), the Iceberg table is consumed by arbitrary SQL — so the
    internal ``__lo`` column is dropped before the write; sort order is
    applied within partitions and preserved by the write."""
    keyed = (
        df.withColumn("__lo", cx.lo(cell_col))
        .sortWithinPartitions("__lo")
        .drop("__lo")
    )
    try:
        keyed.writeTo(table).using("iceberg").createOrReplace()
    except Exception as e:  # catalog/jar missing
        raise RuntimeError(
            "Iceberg write failed — configure an Iceberg catalog "
            "(spark.sql.catalog.<name> + iceberg-spark-runtime) or use "
            "write_region() for plain Parquet"
        ) from e


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort: bool = True,
    path: "str | None" = None,
) -> None:
    """Bucketed parquet table (``bucketBy`` + ``saveAsTable``): rows are
    hash-bucketed on ``bucket_col`` at WRITE time, so every later join
    or aggregation keyed on that column reads co-located buckets and
    plans **no Exchange** — the standard answer when a pages-scale
    table is joined on the same key (tile / cell prefix / region) by
    many downstream queries.  Pair with ``sort=True`` for bucket-local
    ordering (merge-join without a Sort).  Bucket count should be
    sized so one bucket ≈ one task's worth of data at the target SF.

    ``path`` makes the table EXTERNAL at that location instead of
    managed-in-warehouse: the data's lifetime is then decoupled from
    the catalog entry (an in-memory catalog dies with the driver; the
    files must not), and a later session can re-register the same
    bucket spec over the existing files — the property
    ``Checkpointer.stage_bucketed`` resumes through."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_region(spark: SparkSession, path: str, ordered: bool = False) -> DataFrame:
    """Read a stored region table; ``ordered=True`` returns rows in
    DFS/iteration order.  The internal ``__lo`` sort key never leaks:
    both branches return the same schema."""
    df = spark.read.parquet(path)
    if ordered:
        df = df.orderBy("__lo")
    return df.drop("__lo")


def iterate(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """``iter()`` parity: all leaves in reference DFS emission order."""
    return df.orderBy(cx.lo(cell_col))


def write_h3idx(df: DataFrame, path: str, cell_col: str = "cell") -> None:
    """S1 sink: raw little-endian u64 cells (driver-side; region tables
    are broadcast-scale by construction)."""
    cells = np.array(
        [r[0] for r in iterate(df, cell_col).select(cell_col).collect()],
        dtype="<i8",
    )
    with open(path, "wb") as f:
        f.write(cells.astype("<u8").tobytes())


def read_h3idx(spark: SparkSession, path: str) -> DataFrame:
    """S1 source (doctest pattern /root/reference/src/hex_tree_map.rs:31-37)."""
    with open(path, "rb") as f:
        cells = np.frombuffer(f.read(), dtype="<u8").astype(np.int64)
    return spark.createDataFrame([(int(c),) for c in cells], "cell: long")


def write_kepler_csv(df: DataFrame, path: str, cell_col: str = "cell") -> None:
    """S2 sink: ``h3_id`` header + lowercase hex cells."""
    rows = iterate(df, cell_col).select(cx.to_hex(cell_col).alias("h")).collect()
    with open(path, "w") as f:
        f.write("h3_id\n")
        for r in rows:
            f.write(r["h"] + "\n")


def read_kepler_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 source: distributed csv scan + native hex parse."""
    return (
        spark.read.option("header", True).csv(path)
        .select(cx.from_hex(F.col("h3_id")).alias("cell"))
    )


DOCS_JSONL_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def read_docs_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_JSONL_SCHEMA,
) -> "tuple[DataFrame, DataFrame]":
    """JSONL corpus source with malformed-line quarantine: returns
    ``(valid, quarantine)`` — the build.validate_cells convention
    (never silently drop, never fail the whole 100-TB read for one
    mangled line).

    The schema is EXPLICIT, never inferred: schema inference is a full
    extra pass over the data before any real work, and a sampled
    inference can lock in a wrong type that poisons every downstream
    stage.  Parsing is ``text`` source + ``from_json`` rather than the
    raw JSON reader: the raw reader refuses any plan whose referenced
    columns prune down to just ``_corrupt_record``
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and
    Catalyst's pruning does exactly that to a quarantine ``count()``),
    while the two-step form has no such restriction, costs the same
    single pass, and keeps the raw line for forensics.  JSONL splits
    by line, so unlike WARC the parallelism grain is bytes
    (maxPartitionBytes), not files.
    """
    full = f"{schema}, _corrupt_record STRING"
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    )
    bad = F.col("j").isNull() | F.col("j._corrupt_record").isNotNull()
    valid = (
        parsed.filter(~bad).select("j.*").drop("_corrupt_record")
    )
    quarantine = parsed.filter(bad).select("raw_line")
    return valid, quarantine


def write_docs_jsonl(df: DataFrame, path: str, n_files: "int | None" = None) -> None:
    """Documents → JSONL shards (interchange with non-Spark tooling).
    ``n_files`` bounds the shard count (range-partitioned by doc_id so
    shard contents are deterministic, not task-layout-dependent)."""
    out = df
    if n_files is not None:
        out = df.repartitionByRange(n_files, "doc_id")
    out.write.mode("overwrite").json(path)


# Reversible newline escape for the line-splitting CSV interchange.
# Spark's CSV writer emits literal newlines inside quoted fields, which
# a spark.read.text line-splitter would shear into two quarantined
# halves — so string columns are percent-escaped at write and reversed
# at read.  The URL-encoding argument makes sequential literal replaces
# exact: after encoding, every literal '%' starts "%25", so every
# "%0A"/"%0D" occurrence is an encoded newline; decoding those first
# and "%25" last cannot misfire.  All native F.replace — stays in
# whole-stage codegen.
_NL_ESCAPES = (("%", "%25"), ("\n", "%0A"), ("\r", "%0D"))


def _escape_newlines(col: Column) -> Column:
    for raw, esc in _NL_ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def _unescape_newlines(col: Column) -> Column:
    for raw, esc in reversed(_NL_ESCAPES):
        col = F.replace(col, F.lit(esc), F.lit(raw))
    return col


def read_docs_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_JSONL_SCHEMA,
    sep: str = ",",
) -> "tuple[DataFrame, DataFrame]":
    """CSV corpus source with malformed-line quarantine — the
    :func:`read_docs_jsonl` contract for the other interchange format
    (explicit schema, never inferred; (valid, quarantine) split; the
    raw line rides the quarantine for forensics).  Same text+from_csv
    two-step as the JSONL reader and for the same reason: the raw CSV
    reader refuses corrupt-only-pruned plans.

    CSV caveat (why JSONL is the preferred interchange): embedded
    newlines in quoted fields need multiLine=true, which breaks
    line-splittability — so :func:`write_docs_csv` percent-escapes
    string columns and this reader reverses the escape, keeping files
    one-record-per-line.
    """
    from pyspark.sql.types import StringType as _Str

    full = f"{schema}, _corrupt_record STRING"
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_csv(
            F.col("value"),
            full,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
                "sep": sep,
                # the writer escapes embedded quotes with '"' (doubled
                # quotes); the reader must agree or quote-bearing rows
                # land in quarantine
                "escape": '"',
            },
        ).alias("j"),
    )
    bad = F.col("j").isNull() | F.col("j._corrupt_record").isNotNull()
    valid = parsed.filter(~bad).select("j.*").drop("_corrupt_record")
    valid = valid.select(*[
        _unescape_newlines(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, _Str) else F.col(f.name)
        for f in valid.schema.fields
    ])
    quarantine = parsed.filter(bad).select("raw_line")
    return valid, quarantine


def write_docs_csv(
    df: DataFrame, path: str, n_files: "int | None" = None, sep: str = ","
) -> None:
    """Documents → CSV shards (quoted; string columns percent-escaped
    via ``_NL_ESCAPES`` so the line-splitting reader round-trips docs
    whose text embeds newlines; range-partitioned deterministic shard
    contents like the JSONL writer)."""
    from pyspark.sql.types import StringType as _Str

    out = df.select(*[
        _escape_newlines(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, _Str) else F.col(f.name)
        for f in df.schema.fields
    ])
    if n_files is not None:
        out = out.repartitionByRange(n_files, "doc_id")
    (
        out.write.mode("overwrite")
        .option("escape", '"')
        .option("sep", sep)
        .csv(path)
    )
