"""Explicit skew handling: hot-hex salting + cell-prefix range partitioning.

Dense cities make some hexes orders of magnitude hotter than others.
Three complementary tools (north_rule: "partitioning / shuffle / skew
handled explicitly"):

* AQE skew-join splitting — on by default (hexspark.session).
* ``salted_agg`` — two-phase aggregation for skewed groupBy keys when
  a single reducer key would bottleneck.  For count-distinct partials
  pass ``salt_expr=<the distinct column>`` so each distinct value maps
  to exactly one salt (random salting would overcount).
* ``repartition_by_cell_prefix`` — range partitioning on a coarse cell
  prefix (+ optional salt) so co-located subtree scans and downstream
  joins read contiguous, balanced partitions; pairs with sorted
  Parquet writes for row-group pruning (hexspark.storage).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cells as cx


def widen_input(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Scale-adaptive floor on input parallelism (the guide's 'input
    skew' case: one small / unsplittable file).

    A source whose scan yields fewer partitions than the session's
    default parallelism (a single-row-group parquet file, one gzip
    member, a driver-built local relation) serializes EVERY scan-side
    expression — tokenizer regexes, hash chains, cosine re-ranks — onto
    those few cores until the first exchange, no matter how wide the
    cluster is.  Round-robin repartition to ``defaultParallelism *
    multiple`` immediately after the read fixes the task grain for a
    tiny shuffle of the projected input (apply AFTER column pruning).

    Strictly a no-op whenever the input is already at least that wide —
    i.e. for any real cluster-scale table — so it never adds a shuffle
    at 100-TB scale; raising ``multiple`` smooths per-row cost variance
    across tasks at ~2-3 ms of task overhead apiece (measured: the
    repartition costs ~0.2 s at 32 output partitions, ~0.4 s at 128 —
    only worth paying when the serialized scan-side work is seconds).
    """
    sc = df.sparkSession.sparkContext
    target = int(sc.defaultParallelism) * multiple
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # e.g. streaming relations: leave untouched
        return df
    if cur >= target:
        return df
    return df.repartition(target)


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_expr: Optional[Column] = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups by (key, salt) — hot keys split across ``n_salts``
    reducers; phase 2 merges the tiny per-salt partials.  Caller
    supplies matched partial/final agg pairs, e.g.::

        salted_agg(pages, "tile", 16,
                   [F.count("*").alias("c")],
                   [F.sum("c").alias("n_pages")])

    ``salt_expr``: how rows salt.  Default (None) is a seeded random
    salt — correct ONLY for algebraic partials (count/sum/min/max)
    whose merge doesn't care which salt saw which row.  For
    **count-distinct** partials the salt MUST be a function of the
    distinct column, e.g. ``salt_expr=F.col("lang")``, so every
    occurrence of one value lands in exactly one salt group::

        salted_agg(pages, "tile", 16,
                   [F.count_distinct("lang").alias("d")],
                   [F.sum("d").alias("n_langs")],
                   salt_expr=F.col("lang"))
    """
    if salt_expr is None:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    else:
        salt = F.pmod(F.xxhash64(salt_expr), F.lit(n_salts))
    phase1 = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*partial_aggs)
    return phase1.groupBy(key).agg(*final_aggs)


def hot_keys(df: DataFrame, key_col: Column, top_n: int = 20) -> DataFrame:
    """The hottest grouping keys (diagnostic for picking salt factors)."""
    return (
        df.groupBy(key_col.alias("key"))
        .count()
        .orderBy(F.col("count").desc())
        .limit(top_n)
    )


def repartition_by_cell_prefix(
    df: DataFrame,
    prefix_res: int,
    num_partitions: Optional[int] = None,
    cell_col: str = "cell",
    salt_hot: bool = False,
    salt_col: Optional[str] = None,
) -> DataFrame:
    """Range-partition a pages-scale table on its coarse cell prefix.

    Rows of one subtree land in contiguous partitions → subtree scans
    (descendants, tile rollups) prune partitions; with ``salt_hot`` a
    secondary key spreads a pathological single-prefix hot spot across
    partitions while preserving prefix locality.

    Cells COARSER than ``prefix_res`` cannot demote (``to_parent``
    yields NULL) — they keep their own cell as the range key instead of
    collapsing into one NULL-keyed partition."""
    prefix = F.coalesce(cx.to_parent(cell_col, prefix_res), F.col(cell_col))
    keys = [prefix]
    if salt_hot:
        keys.append(F.xxhash64(F.col(salt_col)) if salt_col else F.spark_partition_id())
    if num_partitions:
        return df.repartitionByRange(num_partitions, *keys)
    return df.repartitionByRange(*keys)
