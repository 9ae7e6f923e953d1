"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exact baseline: native ``zip_with`` /
  ``aggregate`` dot products (JVM-side, no UDF), broadcast query set,
  two-phase top-k (hexspark.topk).  DuckDB oracle via
  ``list_dot_product``.
* LSH-bucketed variant — the scale path: random-hyperplane signatures
  bucket the corpus; candidates share a bucket; exact re-rank inside.

Ranking determinism across engines: similarities are rounded to 6
decimals before ranking with id tie-break, so IEEE summation-order
differences (Spark's fold vs DuckDB's) cannot flip ranks except for
true near-ties, which the round+tiebreak resolves identically.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cachepool import CachePool

_DUPS_POOL = CachePool()


_RESTRICT_POOL = CachePool()


def restrict_to_ids(
    corpus: DataFrame,
    ids: DataFrame,
    on: str = "vec_id",
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Semi-join ``corpus`` down to the rows whose ``on`` key appears
    in ``ids``, picking the join strategy from the MEASURED id-set
    size rather than a plan-time guess: the id set is persisted
    (pooled) and counted — at/below ``broadcast_max_rows`` it
    broadcast-semi-joins (the corpus never shuffles), above it the
    hint is dropped and the semi-join shuffles both sides (AQE may
    still broadcast if bytes allow).  This removes the footgun of a
    FORCED broadcast of a set whose size is unknown at plan time (a
    region spanning most of a corpus would OOM the driver), while
    keeping the corpus-never-shuffles shape whenever it is safe.

    ``ids`` should be reasonably deduplicated — the count decides the
    strategy, so heavy duplication only errs toward the (safe)
    shuffle branch.  The persist is pooled (hexspark.cachepool): the
    count and the join read one materialization, and blocks from two
    calls ago are retired."""
    _RESTRICT_POOL.new_generation()
    ids = _RESTRICT_POOL.add(ids.persist())
    n = ids.count()
    if n <= broadcast_max_rows:
        return corpus.join(F.broadcast(ids), on=on, how="leftsemi")
    return corpus.join(ids, on=on, how="leftsemi")


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
    """Exact cosine top-k: broadcast queries × corpus, two-phase top-k.

    The corpus never shuffles except the per-query top-k — the
    two-phase form (hexspark.topk): per-input-partition partial top-k,
    then a tiny global merge, so no single reducer ever sorts one
    query's full candidate set.  With Q queries the cross join is a
    broadcast nested loop whose cost is Q × N vectorized multiplies —
    the honest baseline to beat."""
    from .skew import widen_input
    from .topk import topk_per_key

    # per-side norms computed once per row/query, not once per
    # (query, corpus) pair — same fold order, bit-identical rounding
    cw = widen_input(corpus).withColumn(
        "__cn", norm(F.col(vec_col).cast("array<double>"))
    )
    qw = queries.withColumn(
        "__qn", norm(F.col(query_vec).cast("array<double>"))
    )
    crossed = cw.crossJoin(F.broadcast(qw))
    sim = F.round(
        dot(
            F.col(vec_col).cast("array<double>"),
            F.col(query_vec).cast("array<double>"),
        )
        / (F.col("__cn") * F.col("__qn")),
        6,
    )
    return topk_per_key(
        crossed.withColumn("sim", sim),
        keys=[query_key],
        order=[-F.col("sim"), F.col(key_col)],
        payload=[key_col, "sim"],
        k=k,
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


# analyzed-plan nodes that can never MULTIPLY rows above a file scan.
# An ALLOWLIST, not a blocklist: an operator we have never heard of
# (new Spark version, exotic rewrite) must fail SAFE to count(), not
# slip through and turn the footer count into an under-estimate.
_FOOTER_SAFE_NODES = (
    "Relation", "Project", "Filter", "Sort", "Repartition",
    "SubqueryAlias", "ResolvedHint",
)
# nodes that also never DROP rows — the exact-count subset (no Filter)
_FOOTER_EXACT_NODES = tuple(n for n in _FOOTER_SAFE_NODES if n != "Filter")


def _footer_row_count(df: DataFrame, exact: bool = False) -> Optional[int]:
    """Row count from Parquet footer metadata when ``df`` scans Parquet
    files — zero Spark jobs, driver-side metadata reads only (the same
    pattern the Checkpointer uses for per-partition metrics).  Returns
    None when the plan isn't a file scan (including when the session
    has the same read CACHED — inputFiles() is empty over an
    InMemoryRelation substitution, and falling back to count() is then
    a cheap cached-scan job anyway).  NOTE: footers count the
    FILES' rows, so with filters above the scan this is an UPPER bound
    on ``df.count()`` — callers using it to size a sample fraction get
    a fraction that is at most too small, never too large (the bounded-
    cost property that matters).  Callers that need the count to EQUAL
    ``df.count()`` (e.g. tf-idf's N) pass ``exact=True``, which also
    rejects row-dropping nodes (Filter)."""
    import re

    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    allowed = _FOOTER_EXACT_NODES if exact else _FOOTER_SAFE_NODES
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        for line in plan.splitlines():
            node = re.sub(r"^[\s:+\-]*", "", line)
            if not node:
                continue
            m = re.match(r"[A-Za-z]+", node)
            if m is None or not m.group(0).startswith(allowed):
                return None
        files = df.inputFiles()
    except Exception:
        return None
    if not files or not all(f.endswith(".parquet") for f in files):
        return None
    total = 0
    for uri in files:
        try:
            fs, path = pafs.FileSystem.from_uri(uri)
            with fs.open_input_file(path) as fh:
                total += pq.ParquetFile(fh).metadata.num_rows
        except Exception:
            return None
    return total


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample_rows: int = 1_000_000,
) -> tuple[DataFrame, "np.ndarray"]:
    """IVF coarse quantizer: seeded MLlib KMeans centroids; returns the
    corpus tagged with its nearest-centroid id plus the centroid matrix.

    The fit is bounded: KMeans runs over a seeded Bernoulli sample of
    ~``fit_sample_rows`` vectors.  The fraction is sized from Parquet
    footer row counts when the corpus is a file scan (driver-side
    metadata, ZERO extra Spark jobs — at 10^12 rows a sizing
    ``count()`` would itself be a full corpus pass), falling back to
    ``count()`` for non-file plans; so at scale the fit cost is capped
    while assignment stays a shuffle-free full-corpus map.  A *uniform*
    sample matters: a ``limit`` would take whichever partitions answer
    first, and on a corpus ingested per-source (pre-clustered in
    embedding space) that yields degenerate centroids.  Centroid
    quality from a uniform 10^6-row sample is statistically
    indistinguishable for coarse quantization (n_centroids ≪ sample).
    Pass ``fit_sample_rows=None`` to force a full-corpus fit."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = corpus.withColumn("__feat", array_to_vector(F.col(vec_col).cast("array<double>")))
    fit_src = src.select("__feat")
    if fit_sample_rows is not None:
        n = _footer_row_count(corpus)
        if n is None:
            n = corpus.count()
        if n > fit_sample_rows:
            fit_src = fit_src.sample(
                fraction=fit_sample_rows / n, seed=seed
            )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__feat", predictionCol="centroid_id")
    model = km.fit(fit_src)
    assigned = model.transform(src).drop("__feat")
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def _nearest_centroids(
    qvec_col: str, centroids: "np.ndarray", nprobe: int
) -> Column:
    """Array of the ``nprobe`` nearest centroid ids (squared L2) as a
    native expression over centroid literals.  Distances round to 6
    decimals with centroid-id tie-break so the DuckDB twin (same
    elementwise ops, same order) picks identical lists.

    Built as ONE ``F.expr`` SQL string: per-literal Column construction
    costs thousands of py4j round trips of driver-side plan-build time
    (same fix as :func:`hyperplane_signatures`)."""
    structs = ", ".join(
        "named_struct('d', ROUND(aggregate(zip_with("
        "CAST(`{v}` AS ARRAY<DOUBLE>), array({p}),"
        " (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x), 6), 'i', {i})".format(
            v=qvec_col,
            p=", ".join(repr(float(x)) + "D" for x in c),
            i=i,
        )
        for i, c in enumerate(centroids)
    )
    return F.expr(
        f"transform(slice(array_sort(array({structs})), 1, {nprobe}), s -> s.i)"
    )


def first_k_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> "np.ndarray":
    """Deterministic, SQL-portable coarse quantizer: the centroids are
    the corpus vectors with the ``n_centroids`` smallest keys (k-means
    'first-k init', no Lloyd iterations).  Lower list balance than a
    fitted KMeans, but every step has an exact DuckDB twin
    (:func:`dd_ann_topk_ivf`), which makes the whole IVF query
    hash-checkable by the correctness oracle."""
    rows = (
        corpus.select(key_col, vec_col)
        .filter(F.col(key_col) < n_centroids)
        .orderBy(key_col)
        .collect()
    )
    return np.array([[float(v) for v in r[vec_col]] for r in rows])


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
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF ANN: equi-join on centroid id replaces the cross join —
    each query searches only its ``nprobe`` nearest inverted lists
    (~n_centroids/nprobe-fold candidate reduction), exact cosine
    re-rank inside (two-phase top-k tail).  Recall grows with
    ``nprobe``.

    ``quantizer``: 'kmeans' (seeded MLlib fit — best lists, centroids
    not SQL-portable) or 'first_k' (:func:`first_k_centroids` —
    deterministic and fully DuckDB-oracle-checkable).  Either way the
    corpus-side assign is one shuffle-free map over centroid literals."""
    from .topk import topk_per_key

    if quantizer == "kmeans":
        assigned, centroids = ivf_index(corpus, n_centroids, vec_col)
    elif quantizer == "first_k":
        centroids = first_k_centroids(corpus, n_centroids, vec_col, key_col)
        assigned = corpus.withColumn(
            "centroid_id",
            F.element_at(_nearest_centroids(vec_col, centroids, 1), 1),
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    q = queries.withColumn(
        "__qn", norm(F.col(query_vec).cast("array<double>"))
    ).withColumn(
        "centroid_id",
        F.explode(_nearest_centroids(query_vec, centroids, nprobe)),
    )
    assigned = assigned.withColumn(
        "__cn", norm(F.col(vec_col).cast("array<double>"))
    )
    cand = assigned.join(F.broadcast(q), on="centroid_id", how="inner").drop("centroid_id")
    sim = F.round(
        dot(
            F.col(vec_col).cast("array<double>"),
            F.col(query_vec).cast("array<double>"),
        )
        / (F.col("__cn") * F.col("__qn")),
        6,
    )
    return topk_per_key(
        cand.withColumn("sim", sim),
        keys=[query_key],
        order=[-F.col("sim"), F.col(key_col)],
        payload=[key_col, "sim"],
        k=k,
    )


def embedding_dups(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (ida, idb, sim) with
    ``sim >= threshold`` and ``ida < idb``.

    Scale path (default): hyperplane-LSH buckets prune the self-join —
    only bucket-sharing pairs get the exact rounded-cosine re-check
    (recall < 1 by design, measured by tests).  ``exact=True`` runs the
    all-pairs form — the DuckDB-oracle twin (:func:`dd_embedding_dups`)
    and the honest baseline the LSH recall is measured against."""
    from .skew import widen_input

    corpus = widen_input(corpus)
    if exact:
        a = corpus.select(
            F.col(key_col).alias("ida"),
            F.col(vec_col).cast("array<double>").alias("__va"),
        ).withColumn("__na", norm(F.col("__va")))
        b = corpus.select(
            F.col(key_col).alias("idb"),
            F.col(vec_col).cast("array<double>").alias("__vb"),
        ).withColumn("__nb", norm(F.col("__vb")))
        cand = a.join(b, F.col("ida") < F.col("idb"))
    else:
        from pyspark import StorageLevel

        # both sides of the self-join read the signature relation; the
        # persist runs the 32-projection signature pipeline once and is
        # pooled so repeated calls retire old generations' blocks
        _DUPS_POOL.new_generation()
        sigs = _DUPS_POOL.add(hyperplane_signatures(
            corpus, dim, n_planes, n_tables, vec_col=vec_col
        ).persist(StorageLevel.MEMORY_AND_DISK))
        sa = sigs.select(
            "bucket", F.col(key_col).alias("ida"),
            F.col(vec_col).cast("array<double>").alias("__va"),
        ).withColumn("__na", norm(F.col("__va")))
        sb = sigs.select(
            "bucket", F.col(key_col).alias("idb"),
            F.col(vec_col).cast("array<double>").alias("__vb"),
        ).withColumn("__nb", norm(F.col("__vb")))
        cand = (
            sa.join(sb, on="bucket").filter(F.col("ida") < F.col("idb"))
            .drop("bucket")
            .dropDuplicates(["ida", "idb"])
        )
    # per-side norms hoisted out of the pair predicate (see
    # semantic_dedup): sqrt-then-multiply order preserved, so the
    # rounded similarity is bit-identical to the inline cosine
    sim = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    return (
        cand.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("ida", "idb", "sim")
    )


def dd_embedding_dups(threshold: float) -> str:
    """DuckDB twin of the exact form of :func:`embedding_dups`."""
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        )
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               ROUND(
                 list_dot_product(a.vec, b.vec)
                 / (sqrt(list_dot_product(a.vec, a.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))),
                 6
               ) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE ROUND(
                list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec))
                 * sqrt(list_dot_product(b.vec, b.vec))),
                6
              ) >= {threshold}
    """


def _dd_sq_dist(a: str, b: str) -> str:
    """DuckDB elementwise squared-L2 — the exact twin of the Spark
    ``zip_with``/``aggregate`` form (same per-index ops, same
    left-to-right summation), rounded to 6 like the Column side."""
    return (
        f"ROUND(COALESCE(list_sum(list_transform(list_zip({a}, {b}),"
        f" x -> (x[1]-x[2])*(x[1]-x[2]))), 0.0), 6)"
    )


def dd_ann_topk_ivf(
    k: int, n_queries: int, n_centroids: int, nprobe: int
) -> str:
    """DuckDB oracle of :func:`ann_topk_ivf` with the 'first_k'
    quantizer: centroids = embeddings with vec_id < n_centroids,
    assignment/probe = argmin of the rounded squared-L2 with
    centroid-id tie-break, exact rounded-cosine re-rank."""
    return f"""
        WITH c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id < {n_centroids}
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY {_dd_sq_dist('e.vec', 'c.cvec')} ASC, c.cid ASC
                       ) AS rn
                FROM e, c
            ) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, vec AS qvec FROM e WHERE vec_id < {n_queries}),
        qprobe AS (
            SELECT query_id, cid FROM (
                SELECT q.query_id, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY {_dd_sq_dist('q.qvec', 'c.cvec')} ASC, c.cid ASC
                       ) AS rn
                FROM q, c
            ) WHERE rn <= {nprobe}
        ),
        cand AS (
            SELECT qp.query_id, a.vec_id
            FROM qprobe qp JOIN assign a ON a.cid = qp.cid
        ),
        scored AS (
            SELECT cand.query_id, cand.vec_id,
                   ROUND(
                     list_dot_product(e.vec, q.qvec)
                     / (sqrt(list_dot_product(e.vec, e.vec))
                      * sqrt(list_dot_product(q.qvec, q.qvec))),
                     6
                   ) AS sim
            FROM cand
            JOIN e ON e.vec_id = cand.vec_id
            JOIN q ON q.query_id = cand.query_id
        )
        SELECT query_id, rank, vec_id, sim FROM (
            SELECT query_id, vec_id, sim,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


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
    deterministic (seeded) literals baked into the plan — broadcast-free.

    The sign test runs on the dot product *rounded to 6 decimals* so an
    engine that sums products in a different IEEE order (DuckDB's
    ``list_dot_product`` in :func:`dd_ann_topk_lsh`) derives bit-identical
    buckets — a raw ``> 0`` could flip on a ±1e-17 summation-order
    residue."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    # one F.expr per table: building the 64 literals × planes × tables
    # as individual Column ops costs thousands of py4j round trips
    # (~5s of driver-side plan construction); a single SQL string per
    # table parses JVM-side in one call with identical semantics
    buckets = []
    for t in range(n_tables):
        bits = " + ".join(
            "(CASE WHEN ROUND(aggregate(zip_with(CAST(`{v}` AS ARRAY<DOUBLE>),"
            " array({p}), (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + v), 6) > 0 THEN {b}L ELSE 0L END)".format(
                v=vec_col,
                p=", ".join(repr(float(x)) + "D" for x in planes[t, i]),
                b=1 << i,
            )
            for i in range(n_planes)
        )
        buckets.append(F.expr(f"({t << n_planes}L + {bits})"))
    return df.withColumn("bucket", F.explode(F.array(*buckets)))


def _dd_plane_sigs(
    dim: int, n_planes: int, n_tables: int, seed: int, vec: str
) -> list[str]:
    """One DuckDB bucket expression per LSH table, generated from the
    SAME seeded rng as :func:`hyperplane_signatures`; ``repr(float)`` is
    shortest-round-trip so the parsed doubles are bit-identical to the
    Spark ``F.lit`` literals."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    exprs = []
    for t in range(n_tables):
        bits = " + ".join(
            "(CASE WHEN ROUND(list_dot_product({v}, [{p}]), 6) > 0"
            " THEN {b} ELSE 0 END)".format(
                v=vec,
                p=", ".join(repr(float(x)) for x in planes[t, i]),
                b=1 << i,
            )
            for i in range(n_planes)
        )
        exprs.append(f"({t << n_planes} + {bits})")
    return exprs


def dd_ann_topk_lsh(
    k: int,
    n_queries: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> str:
    """DuckDB oracle of :func:`ann_topk_lsh`: identical seeded plane
    literals → identical buckets → identical candidate sets, then the
    same rounded-cosine re-rank with vec_id tie-break as the brute/IVF
    twins."""
    sig_list = ", ".join(_dd_plane_sigs(dim, n_planes, n_tables, seed, "vec"))
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ),
        sig AS (
            SELECT vec_id, unnest([{sig_list}]) AS bucket FROM e
        ),
        qsig AS (
            SELECT vec_id AS query_id, bucket FROM sig WHERE vec_id < {n_queries}
        ),
        cand AS (
            SELECT DISTINCT q.query_id, s.vec_id
            FROM qsig q JOIN sig s USING (bucket)
        ),
        scored AS (
            SELECT cand.query_id, cand.vec_id,
                   ROUND(
                     list_dot_product(e.vec, qe.vec)
                     / (sqrt(list_dot_product(e.vec, e.vec))
                      * sqrt(list_dot_product(qe.vec, qe.vec))),
                     6
                   ) AS sim
            FROM cand
            JOIN e ON e.vec_id = cand.vec_id
            JOIN e qe ON qe.vec_id = cand.query_id
        )
        SELECT query_id, rank, vec_id, sim FROM (
            SELECT query_id, vec_id, sim,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


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
    from .skew import widen_input
    from .topk import topk_per_key

    # norms ride the signature rows (computed once per input row BEFORE
    # the bucket explode), not once per candidate pair — same fold
    # order, bit-identical rounded similarity
    c = hyperplane_signatures(
        widen_input(corpus).withColumn(
            "__cn", norm(F.col(vec_col).cast("array<double>"))
        ),
        dim, n_planes, n_tables, vec_col=vec_col,
    )
    q = hyperplane_signatures(
        queries.withColumn(
            "__qn", norm(F.col(query_vec).cast("array<double>"))
        ),
        dim, n_planes, n_tables, vec_col=query_vec,
    )
    cand = (
        c.join(
            F.broadcast(q.select("bucket", query_key, query_vec, "__qn")),
            on="bucket", how="inner",
        )
        .drop("bucket")
        .dropDuplicates([query_key, key_col])
    )
    sim = F.round(
        dot(
            F.col(vec_col).cast("array<double>"),
            F.col(query_vec).cast("array<double>"),
        )
        / (F.col("__cn") * F.col("__qn")),
        6,
    )
    return topk_per_key(
        cand.withColumn("sim", sim),
        keys=[query_key],
        order=[-F.col("sim"), F.col(key_col)],
        payload=[key_col, "sim"],
        k=k,
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    quantizer: str = "kmeans",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-
    quantize every vector to its nearest centroid, compute exact
    rounded cosine only WITHIN each cluster (key_a < key_b), and keep
    the lowest-keyed member of each near-dup group — each dropped row
    carries its minimal witness.

    Output: ``key_col``, ``centroid_id``, ``witness`` (min lower-keyed
    same-cluster neighbor with sim >= threshold; NULL = kept),
    ``kept`` boolean.  One row per corpus row.

    Scale: the pair search is an equi-join on centroid_id — quadratic
    only within a cluster, never corpus-wide; size ``n_centroids``
    ~ corpus_rows / target_cluster_size to bound it (the SemDeDup
    design point).  The witness groupBy combines map-side, and the
    final join-back of the (small) dropped set is AQE-broadcast.
    ``quantizer='kmeans'`` uses the footer-bounded seeded MLlib fit
    (:func:`ivf_index`); ``'first_k'`` is the deterministic,
    DuckDB-twinnable path (:func:`first_k_centroids`).
    """
    from .skew import widen_input

    corpus = widen_input(corpus)
    if quantizer == "kmeans":
        assigned, _ = ivf_index(corpus, n_centroids, vec_col)
    elif quantizer == "first_k":
        centroids = first_k_centroids(corpus, n_centroids, vec_col, key_col)
        assigned = corpus.withColumn(
            "centroid_id",
            F.element_at(_nearest_centroids(vec_col, centroids, 1), 1),
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    # per-row norm hoisted OUT of the pair join: cosine(a, b) evaluates
    # three array folds per PAIR (dot + both norms) while the norms are
    # per-ROW values — within a cluster of c rows that is 2*C(c,2) norm
    # folds replaced by c.  sqrt-then-multiply order is preserved, so
    # the rounded similarity is bit-identical to the inline form.
    assigned = assigned.select(
        F.col(key_col),
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    ).withColumn("__nrm", norm(F.col("__vec")))
    a = assigned.select(
        "centroid_id", F.col(key_col).alias("__ida"),
        F.col("__vec").alias("__va"), F.col("__nrm").alias("__na"),
    )
    b = assigned.select(
        "centroid_id", F.col(key_col).alias("__idb"),
        F.col("__vec").alias("__vb"), F.col("__nrm").alias("__nb"),
    )
    pairs = (
        a.join(b, on="centroid_id")
        .filter(F.col("__ida") < F.col("__idb"))
        .withColumn(
            "__sim",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ),
        )
        .filter(F.col("__sim") >= threshold)
    )
    dups = pairs.groupBy(F.col("__idb").alias(key_col)).agg(
        F.min("__ida").alias("witness")
    )
    return (
        assigned.drop("__vec", "__nrm")
        .join(dups, on=key_col, how="left")
        .withColumn("kept", F.col("witness").isNull())
    )


def dd_semantic_dedup(threshold: float, n_centroids: int = 16) -> str:
    """DuckDB twin of :func:`semantic_dedup` with the 'first_k'
    quantizer over the embeddings table — same assign rule as
    :func:`dd_ann_topk_ivf` (rounded squared-L2 argmin, centroid-id
    tie-break), same rounded-cosine pair rule as
    :func:`dd_embedding_dups`, restricted to same-cluster pairs."""
    cos = (
        "ROUND(list_dot_product(ea.vec, eb.vec)"
        " / (sqrt(list_dot_product(ea.vec, ea.vec))"
        "  * sqrt(list_dot_product(eb.vec, eb.vec))), 6)"
    )
    return f"""
        WITH c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id < {n_centroids}
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY {_dd_sq_dist('e.vec', 'c.cvec')} ASC, c.cid ASC
                       ) AS rn
                FROM e, c
            ) WHERE rn = 1
        ),
        dups AS (
            SELECT b.vec_id, MIN(a.vec_id) AS witness
            FROM assign a
            JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
            JOIN e ea ON ea.vec_id = a.vec_id
            JOIN e eb ON eb.vec_id = b.vec_id
            WHERE {cos} >= {threshold}
            GROUP BY b.vec_id
        )
        SELECT s.vec_id, CAST(s.cid AS BIGINT) AS centroid_id,
               d.witness, d.witness IS NULL AS kept
        FROM assign s LEFT JOIN dups d USING (vec_id)
    """


def project_embeddings(
    corpus: DataFrame,
    dim: int,
    out_dim: int,
    seed: int = 42,
    vec_col: str = "embedding",
    scale: "float | None" = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress ``dim``-d
    embeddings to ``out_dim`` floats with a fixed seeded Gaussian
    matrix scaled by 1/sqrt(out_dim) (pairwise distances/cosines are
    preserved within the JL bound) — the storage/ANN-speed reduction
    step before indexing a 10^12-vector corpus.

    The matrix is deterministic seeded literals baked into the plan
    (broadcast-free, same rationale as :func:`hyperplane_signatures`),
    each output component one ``zip_with``/``aggregate`` SQL expression
    rounded to 6 — so the DuckDB twin (:func:`dd_project_embeddings`,
    same rng stream, same left-to-right summation) is bit-identical
    and the whole map is shuffle-free whole-stage codegen.

    Replaces ``vec_col`` with the ``out_dim`` array; all other columns
    pass through.
    """
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((out_dim, dim))
    s = float(scale) if scale is not None else 1.0 / float(np.sqrt(out_dim))
    comps = ", ".join(
        "ROUND(aggregate(zip_with(CAST(`{v}` AS ARRAY<DOUBLE>),"
        " array({p}), (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, u) -> acc + u) * {s!r}D, 6)".format(
            v=vec_col,
            p=", ".join(repr(float(x)) + "D" for x in mat[i]),
            s=s,
        )
        for i in range(out_dim)
    )
    return corpus.withColumn(vec_col, F.expr(f"array({comps})"))


def dd_project_embeddings(
    dim: int, out_dim: int, seed: int = 42, key: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`project_embeddings` over embeddings."""
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((out_dim, dim))
    s = 1.0 / float(np.sqrt(out_dim))
    comps = ", ".join(
        "ROUND(COALESCE(list_sum(list_transform(list_zip("
        "CAST(embedding AS DOUBLE[]), [{p}]), x -> x[1] * x[2])), 0.0)"
        " * {s!r}, 6)".format(
            p=", ".join(repr(float(x)) for x in mat[i]), s=s
        )
        for i in range(out_dim)
    )
    return f"""
        SELECT {key}, [{comps}] AS embedding FROM embeddings
    """
