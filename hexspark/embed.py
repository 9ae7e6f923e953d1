"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exact baseline: native ``zip_with`` /
  ``aggregate`` dot products (JVM-side, no UDF), broadcast query set,
  window top-k.  DuckDB oracle via ``list_dot_product``.
* LSH-bucketed variant — the scale path: random-hyperplane signatures
  bucket the corpus; candidates share a bucket; exact re-rank inside.

Ranking determinism across engines: similarities are rounded to 6
decimals before ranking with id tie-break, so IEEE summation-order
differences (Spark's fold vs DuckDB's) cannot flip ranks except for
true near-ties, which the round+tiebreak resolves identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window top-k.

    The corpus never shuffles except the per-query top-k partial; with
    Q queries the cross join is a broadcast nested loop whose cost is
    Q × N vectorized multiplies — the honest baseline to beat."""
    crossed = corpus.crossJoin(F.broadcast(queries))
    sim = F.round(
        cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec).cast("array<double>")), 6
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("sim").desc(), F.col(key_col).asc()
    )
    return (
        crossed.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, F.col("rank").cast("long").alias("rank"),
                F.col(key_col), "sim")
    )


def dd_ann_topk_brute(k: int, n_queries: int) -> str:
    """DuckDB oracle: queries = the first ``n_queries`` corpus vectors."""
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < {n_queries}
        ),
        scored AS (
            SELECT q.query_id,
                   e.vec_id,
                   ROUND(
                     list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))),
                     6
                   ) AS sim
            FROM embeddings e, q
        )
        SELECT query_id, rank, vec_id, sim FROM (
            SELECT query_id, vec_id, sim,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, "np.ndarray"]:
    """IVF coarse quantizer: seeded MLlib KMeans centroids; returns the
    corpus tagged with its nearest-centroid id plus the centroid matrix.

    The fit runs on a sample-scale pass (KMeans over feature vectors);
    assignment is a deterministic argmin over centroid literals —
    at 10^12 rows the fit uses a sample, the assign is one map."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    src = corpus.withColumn("__feat", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__feat", predictionCol="centroid_id")
    model = km.fit(src)
    assigned = model.transform(src).drop("__feat")
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def _nearest_centroids(qvec: Column, centroids: "np.ndarray", nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids (squared L2) as a
    native expression over centroid literals."""
    dists = []
    for i, c in enumerate(centroids):
        plane = F.array(*[F.lit(float(v)) for v in c])
        diff = F.zip_with(qvec.cast("array<double>"), plane, lambda a, b: (a - b) * (a - b))
        d = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)
        dists.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    arr = F.array_sort(F.array(*dists))
    return F.slice(arr, 1, nprobe).getField("i")


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """IVF ANN: equi-join on centroid id replaces the cross join —
    each query searches only its ``nprobe`` nearest inverted lists
    (~n_centroids/nprobe-fold candidate reduction), exact cosine
    re-rank inside.  Recall grows with ``nprobe``."""
    assigned, centroids = ivf_index(corpus, n_centroids, vec_col)
    q = queries.withColumn(
        "centroid_id",
        F.explode(_nearest_centroids(F.col(query_vec), centroids, nprobe)),
    )
    cand = assigned.join(F.broadcast(q), on="centroid_id", how="inner").drop("centroid_id")
    sim = F.round(
        cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec).cast("array<double>")), 6
    )
    w = Window.partitionBy(query_key).orderBy(F.col("sim").desc(), F.col(key_col).asc())
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, F.col("rank").cast("long").alias("rank"), F.col(key_col), "sim")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH: for each of ``n_tables``
    independent plane sets, the sign pattern of ``n_planes`` fixed
    random projections packed into a BIGINT bucket id (table id in the
    high bits).  One output row per (row, table).  The planes are
    deterministic (seeded) literals baked into the plan — broadcast-free."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    buckets = []
    for t in range(n_tables):
        sig = F.lit(t << n_planes).cast("long")
        for i in range(n_planes):
            plane = F.array(*[F.lit(float(v)) for v in planes[t, i]])
            d = dot(F.col(vec_col).cast("array<double>"), plane)
            sig = sig + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(0)
        buckets.append(sig)
    return df.withColumn("bucket", F.explode(F.array(*buckets)))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Bucketed ANN: equi-join on hyperplane buckets replaces the cross
    join (candidates drop ~2^n_planes/n_tables-fold), then exact
    re-rank over the deduplicated candidates.  Recall < 1 by design;
    tests measure it against the brute baseline — raise ``n_tables``
    (more recall, more candidates) or ``n_planes`` (fewer candidates,
    less recall) to tune."""
    c = hyperplane_signatures(corpus, dim, n_planes, n_tables, vec_col=vec_col)
    q = hyperplane_signatures(queries, dim, n_planes, n_tables, vec_col=query_vec)
    cand = (
        c.join(F.broadcast(q.select("bucket", query_key, query_vec)), on="bucket", how="inner")
        .drop("bucket")
        .dropDuplicates([query_key, key_col])
    )
    sim = F.round(
        cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec).cast("array<double>")), 6
    )
    w = Window.partitionBy(query_key).orderBy(F.col("sim").desc(), F.col(key_col).asc())
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, F.col("rank").cast("long").alias("rank"), F.col(key_col), "sim")
    )
