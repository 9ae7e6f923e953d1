"""Scale-safe per-key top-k (kNN / ANN ranking tail).

``row_number().over(Window.partitionBy(key))`` shuffles every candidate
row into ONE reducer partition per key and sorts it there — with a
handful of anchors/queries and 10^12 candidates that is a few reducers
sorting ~10^11 rows each.  This module replaces that tail with the
two-phase form:

1. **partial top-k** — group by ``(key, spark_partition_id())``: the
   grouping key includes the input partition, so no reducer ever sees
   more than one input partition's candidates for one key, and the
   per-group ``slice(array_sort(collect_list(struct)), 1, k)`` keeps
   only k rows per (key, partition);
2. **global merge** — the surviving ``n_partitions × keys × k`` rows
   (tiny) re-group by key alone and take the final top-k.

Output rows are IDENTICAL to the window form whenever the order columns
end in a unique tie-break (all callers pass one) — asserted by tests
and unchanged DuckDB oracles.  Everything is native Columns: struct
comparison in ``array_sort`` is field-by-field in declaration order, so
the order columns lead the struct and payload trails.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    payload: Sequence[str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per distinct ``keys``, ranked by ``order`` ascending.

    ``order``: Columns compared ascending, field by field — negate
    numeric columns for descending.  Must end in a unique tie-break for
    deterministic output (same requirement as the window form).  Order
    columns must be non-null (array_sort sorts NULL last; windows sort
    NULL first).

    ``payload``: column names carried through to the output.  Returns
    ``keys + [rank_col] + payload`` with ``rank_col`` 1-based long.
    """
    strct = F.struct(
        *[o.alias(f"__o{i}") for i, o in enumerate(order)],
        *[F.col(c).alias(c) for c in payload],
    )
    partial = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(*keys, "__pid")
        .agg(F.slice(F.array_sort(F.collect_list(strct)), 1, k).alias("__top"))
    )
    merged = (
        partial.select(*keys, F.explode("__top").alias("__s"))
        .groupBy(*keys)
        .agg(F.slice(F.array_sort(F.collect_list("__s")), 1, k).alias("__top"))
    )
    out = merged.select(*keys, F.posexplode("__top").alias("__pos", "__s"))
    return out.select(
        *keys,
        (F.col("__pos") + 1).cast("long").alias(rank_col),
        *[F.col("__s").getField(c).alias(c) for c in payload],
    )
