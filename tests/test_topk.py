"""Two-phase top-k: row-identity with the window form + plan shape."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hexspark.topk import topk_per_key

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def scored(spark):
    n = 5000
    rows = [
        (int(RNG.integers(0, 7)), int(i), float(RNG.uniform(0, 100)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "key: long, rid: long, score: double").repartition(16)


def _window_form(df, k, desc=False):
    o = F.col("score").desc() if desc else F.col("score").asc()
    w = Window.partitionBy("key").orderBy(o, F.col("rid").asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("key", F.col("rank").cast("long").alias("rank"), "rid", "score")
    )


def test_topk_matches_window_asc(scored):
    got = topk_per_key(
        scored, keys=["key"], order=[F.col("score"), F.col("rid")],
        payload=["rid", "score"], k=10,
    )
    want = _window_form(scored, 10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_matches_window_desc(scored):
    got = topk_per_key(
        scored, keys=["key"], order=[-F.col("score"), F.col("rid")],
        payload=["rid", "score"], k=7,
    )
    want = _window_form(scored, 7, desc=True)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_k_exceeds_group(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 2.0), (2, 20, 3.0)], "key: long, rid: long, score: double"
    )
    out = topk_per_key(
        df, keys=["key"], order=[F.col("score"), F.col("rid")],
        payload=["rid"], k=5,
    ).collect()
    assert len(out) == 3  # smaller groups emit all rows, ranks still 1-based
    ranks = {(r["key"], r["rank"]) for r in out}
    assert ranks == {(1, 1), (1, 2), (2, 1)}


def test_no_single_key_exchange_in_ann_plan(spark, sf_dir):
    """The scale guarantee: the ANN ranking tail must not shuffle all
    candidates into one reducer partition per query (no Window / no
    Exchange keyed by query_id alone feeding a Sort)."""
    from hexspark.embed import ann_topk_brute

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    plan = ann_topk_brute(emb, q, 5)._jdf.queryExecution().executedPlan().toString()
    # no per-key global window sort anywhere
    assert "Window" not in plan
    # the candidate stream aggregates by (query_id, __pid) first — only
    # the tiny merged arrays ever exchange by query_id alone
    assert "__pid" in plan
    import re
    sorts_on_bare_key = re.findall(r"Sort \[query_id[^\]]*\], false", plan)
    assert not sorts_on_bare_key, plan
