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


def test_aqe_splits_skewed_join(spark):
    """Executable proof of the 'AQE-assisted skew-join handling' claim:
    a sort-merge join with one pathologically hot key must come out of
    adaptive planning with the hot partition split (the executed plan's
    AQEShuffleRead reports a skewed split)."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        ]
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # hot tile: ~95% of 300k probe rows share one join key
        left = spark.range(300_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(0)).otherwise(F.col("id") % 97)
            .cast("long").alias("tile"),
            F.col("id").alias("payload"),
        )
        right = spark.range(97).select(
            F.col("id").alias("tile"), (F.col("id") * 2).alias("weight")
        )
        joined = left.join(right, on="tile")
        # materialize THIS Dataset: AQE finalizes a plan per executed
        # query, so .count() (a different tree) would leave joined's
        # own plan un-finalized
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


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


def test_salted_count_distinct_with_value_salt(spark):
    """count-distinct partials need a value-derived salt (each distinct
    value → exactly one salt group); random salting would overcount.
    Verified against the plain groupBy."""
    from hexspark import skew as sk

    df = spark.range(20000).select(
        (F.col("id") % 7).alias("tile"),
        F.concat(F.lit("v"), (F.col("id") % 61).cast("string")).alias("val"),
    )
    want = {
        r["tile"]: r["d"]
        for r in df.groupBy("tile").agg(F.count_distinct("val").alias("d")).collect()
    }
    got = {
        r["tile"]: r["n"]
        for r in sk.salted_agg(
            df, "tile", 16,
            [F.count_distinct("val").alias("d")],
            [F.sum("d").alias("n")],
            salt_expr=F.col("val"),
        ).collect()
    }
    assert got == want


def test_repartition_by_cell_prefix_coarse_cells(spark):
    """Cells coarser than prefix_res keep their own range key instead
    of collapsing into one NULL-keyed partition."""
    import numpy as np

    from hexspark import cells_np as cnp
    from hexspark import skew as sk
    from hexspark.geo import grid_encode_np

    rng = np.random.default_rng(5)
    fine = grid_encode_np(rng.uniform(-60, 60, 3000), rng.uniform(-170, 170, 3000), 8)
    coarse = np.unique(cnp.to_parent(fine[:1500], 1))  # res 1 < prefix 2
    cells = np.concatenate([fine, coarse])
    df = spark.createDataFrame([(int(c),) for c in cells], "cell: long")
    out = sk.repartition_by_cell_prefix(df, prefix_res=2, num_partitions=8)
    assert out.count() == len(cells)
    # the COARSE rows themselves must spread across partitions by their
    # own key — pre-fix they all got NULL keys and landed in one
    from pyspark.sql import functions as FF
    coarse_set = {int(c) for c in coarse}
    coarse_parts = {
        r["p"]
        for r in out.withColumn("p", FF.spark_partition_id())
        .filter(FF.col("cell").isin(list(coarse_set)))
        .select("p").distinct().collect()
    }
    assert len(coarse_parts) > 1, coarse_parts
