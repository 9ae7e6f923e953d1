"""Skew utilities: salted agg equivalence, range partitioning locality."""

import numpy as np
from pyspark.sql import functions as F

from hexspark import cells as cx
from hexspark import cells_np as cnp
from hexspark import skew
from hexspark.geo import grid_encode


def _pages(spark, n=20000):
    # heavily skewed: 70% of rows in one hot hex
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 7, F.lit(10.0)).otherwise(
            (F.col("id") % 179 - 89).cast("double")
        ).alias("lat"),
        F.when(F.col("id") % 10 < 7, F.lit(20.0)).otherwise(
            (F.col("id") % 359 - 179).cast("double")
        ).alias("lon"),
    ).withColumn("cell", grid_encode(F.col("lat"), F.col("lon"), 12))


def test_salted_agg_equivalence(spark):
    pages = _pages(spark).withColumn("tile", cx.to_parent("cell", 3))
    plain = {
        r["tile"]: r["n"]
        for r in pages.groupBy("tile").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["tile"]: r["n_pages"]
        for r in skew.salted_agg(
            pages, "tile", 16,
            [F.count("*").alias("c")],
            [F.sum("c").cast("long").alias("n_pages")],
        ).collect()
    }
    assert salted == plain


def test_hot_keys_diagnostic(spark):
    pages = _pages(spark)
    hot = skew.hot_keys(pages, cx.to_parent("cell", 3), top_n=3).collect()
    assert hot[0]["count"] >= 0.6 * 20000  # the planted hot hex dominates


def test_repartition_by_cell_prefix_locality(spark):
    pages = _pages(spark, n=5000)
    parted = skew.repartition_by_cell_prefix(pages, prefix_res=2, num_partitions=8)
    assert parted.count() == 5000  # no row loss
    # range partitioning: per-partition prefix ranges are (near-)disjoint
    rows = parted.select(
        F.spark_partition_id().alias("pid"),
        cx.to_parent("cell", 2).alias("prefix"),
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["prefix"])
    bounds = sorted((min(v), max(v)) for v in by_pid.values())
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2  # contiguous, non-interleaved ranges
