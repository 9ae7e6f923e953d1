"""The resumable end-to-end pipeline driver.

Chains every flagship stage through the Checkpointer so a crashed or
re-submitted run resumes at the first incomplete stage with full
per-partition lineage (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

    ingest(pages) ──┬─> quarantine (invalid cells)
                    └─> encode ─> assign ─> region_counts
    region build ───────────────────^            tile rollup

Run on a cluster:  spark-submit --py-files dist/hexspark.zip \
    -c 'from hexspark.pipeline import run_pipeline; ...'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import build as bx
from . import cells as cx
from . import join as jx
from . import ops
from .checkpoint import Checkpointer
from .pages import synth_pages


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    copies: int = 2,
    page_res: int = 12,
    tile_res: int = 6,
    bucket_tiles: int = 0,
) -> dict[str, DataFrame]:
    """Run (or resume) the full spatial pipeline; returns stage outputs.

    ``bucket_tiles > 0`` inserts a ``pages_tiled`` stage materialized as
    a table hash-bucketed on the tile prefix (that many buckets): the
    downstream tile rollup then groups on the stored bucket key and
    joins regions by broadcast, so its executed plan carries NO
    Exchange until the final region-cardinality aggregate — the posture
    for a pages-scale table fanned out to many tile-keyed queries.
    Output is identical to the unbucketed path (asserted in tests)."""
    ck = Checkpointer(spark, work_dir)

    # params are TRANSITIVE: each stage records its own knobs PLUS every
    # ancestor's (a copies change must invalidate region_counts even
    # though region_counts' direct inputs are unchanged — _resume_ok
    # only compares the recorded dict, it cannot see through the DAG)
    p_pages = {"copies": copies, "page_res": page_res}
    p_tiles = {**p_pages, "tile_res": tile_res, "bucket_tiles": bucket_tiles}

    pages = ck.stage(
        "pages",
        lambda: synth_pages(spark, sf_dir, copies=copies, res=page_res, with_html=False),
        params=p_pages,
    )

    # quarantine stage: split valid/invalid probe cells, count both.
    # validate_cells (not a bare ~is_valid filter) so NULL cells land
    # in quarantine instead of vanishing from both outputs
    valid = ck.stage(
        "pages_valid",
        lambda: bx.validate_cells(pages)[0],
        inputs=["pages"],
        quarantine_fn=lambda: bx.validate_cells(pages)[1],
        params=p_pages,
    )

    regions = ck.stage("region_map", lambda: ops.region_map(spark))

    assigned = ck.stage(
        "assigned",
        lambda: jx.get_auto(
            valid.select("page_key", "cell", "lang"), regions, probe_col="cell"
        ),
        inputs=["pages_valid", "region_map"],
        params=p_pages,
    )

    counts = ck.stage(
        "region_counts",
        lambda: assigned.groupBy("region").agg(
            F.count("*").alias("n_pages"),
            F.count_distinct("lang").alias("n_langs"),
        ),
        inputs=["assigned"],
        params=p_pages,
    )

    out: dict[str, DataFrame] = {}
    if bucket_tiles:
        tiled = ck.stage_bucketed(
            "pages_tiled",
            lambda: valid.select(
                "page_key", "lang", cx.to_parent("cell", tile_res).alias("tile")
            ),
            bucket_col="tile",
            n_buckets=bucket_tiles,
            inputs=["pages_valid"],
            params=p_tiles,
        )
        out["pages_tiled"] = tiled
        tiles = ck.stage(
            "tile_rollup",
            lambda: ops.tile_region_rollup_pretiled(tiled, regions),
            inputs=["pages_tiled", "region_map"],
            params=p_tiles,
        )
    else:
        tiles = ck.stage(
            "tile_rollup",
            lambda: ops.tile_region_rollup(valid, regions, tile_res),
            inputs=["pages_valid", "region_map"],
            params=p_tiles,
        )

    active = {"pages", "pages_valid", "region_map", "assigned",
              "region_counts", "tile_rollup"} | set(out)
    out.update({
        "pages": pages,
        "valid": valid,
        "regions": regions,
        "assigned": assigned,
        "region_counts": counts,
        "tile_rollup": tiles,
        # only THIS run's wiring: a leftover manifest from a previous
        # configuration (e.g. pages_tiled after a bucketed run) must
        # not surface as an active stage
        "lineage": {k: v for k, v in ck.lineage().items() if k in active},  # type: ignore[dict-item]
    })
    return out


def select_keepers(
    feats: DataFrame, clusters: DataFrame, min_quality: float
) -> DataFrame:
    """One keeper per dup cluster: the min-``doc_id`` member AMONG those
    at/above the quality floor.  A cluster survives as long as ANY
    member passes — filtering after canonical min-id assignment would
    drop a whole cluster whenever its lowest-id copy happened to be the
    low-quality one.  ``feats`` needs (doc_id, quality, ...); ``clusters``
    is the (id, cluster) output of :func:`hexspark.dedup.dup_clusters`.

    Shape: ``groupBy(cluster).min`` + semi-join-back, NOT a
    ``min().over(partitionBy(cluster))`` window.  A window min has no
    map-side combine — every qualified row shuffles keyed by cluster
    and ONE reducer sorts each cluster, and crawl dedup has
    pathological mega-clusters (millions of copies of boilerplate)
    that make that reducer a straggler at 100 TB.  The groupBy
    combines map-side (a 10^8-row cluster collapses to one row per
    map task before the shuffle), and the semi-join-back keys on
    (doc_id, cluster) — nearly unique, so no skew regardless of
    cluster shape; AQE broadcasts the keeper relation when it fits
    (NOT hint-forced: at corpus scale there is ~one keeper per unique
    document, far past broadcast size)."""
    qualified = feats.join(
        clusters.withColumnRenamed("id", "doc_id"), on="doc_id"
    ).filter(F.col("quality") >= min_quality)
    keeper_ids = qualified.groupBy("cluster").agg(
        F.min("doc_id").alias("doc_id")
    )
    return qualified.join(keeper_ids, on=["doc_id", "cluster"], how="leftsemi")


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    max_hamming: int = 3,
    min_quality: float = 0.0,
    sample_bps: int = 0,
    strata_bps: "dict[str, int] | None" = None,
) -> dict[str, DataFrame]:
    """Run (or resume) the training-corpus curation pipeline end to end
    — the dedup analogue of :func:`run_pipeline`, every stage
    checkpointed with per-partition lineage:

    1. ``doc_features``  — tokens / lang / quality / fingerprint (raw
       ``text`` deliberately NOT checkpointed — no downstream stage
       reads it, and it is the heaviest column of the source table)
    2. ``dup_pairs``     — simhash Hamming-budget near-dup pairs
    3. ``dup_clusters``  — connected components → cluster/keeper ids
    4. ``keepers``       — one doc per cluster: the min-id member
       AMONG those above the quality floor (a cluster survives as long
       as ANY member passes the floor — filtering after canonical
       min-id assignment would drop a whole cluster whenever its
       lowest-id copy happened to be the low-quality one)
    5. ``sampled``       — optional (``sample_bps > 0``): deterministic
       per-stratum downsample of the keepers (hexspark.sample — the
       language-rebalancing step; layout-independent, so a resumed or
       re-run pipeline reproduces the identical corpus)
    6. ``corpus_stats``  — per-language keeper counts + token totals
       (with the pre-dedup counts for the reduction ratio)
    """
    from . import dedup as ddp
    from . import text as tx

    ck = Checkpointer(spark, work_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # transitive params (see run_pipeline): a max_hamming change must
    # invalidate clusters/keepers/stats too, not just dup_pairs
    p_pairs = {"max_hamming": max_hamming}
    p_keep = {**p_pairs, "min_quality": min_quality}
    p_samp = {**p_keep, "sample_bps": sample_bps, "strata_bps": strata_bps}

    feats = ck.stage(
        "doc_features",
        lambda: docs.select(
            "doc_id",
            tx.token_count(F.col("text")).alias("toks"),
            tx.lang_id(F.col("text")).alias("lang_guess"),
            tx.quality_score(F.col("text")).alias("quality"),
            tx.fingerprint(F.col("text")).alias("fp"),
        ),
    )

    pairs = ck.stage(
        "dup_pairs",
        lambda: ddp.simhash_pairs(docs, max_hamming=max_hamming, bits=32),
        params=p_pairs,
    )

    clusters = ck.stage(
        "dup_clusters",
        lambda: ddp.dup_clusters(pairs, all_ids=docs.select("doc_id")),
        inputs=["dup_pairs"],
        params=p_pairs,
    )

    keepers = ck.stage(
        "keepers",
        lambda: select_keepers(feats, clusters, min_quality),
        inputs=["doc_features", "dup_clusters"],
        params=p_keep,
    )

    out: dict[str, DataFrame] = {}
    final = keepers
    stats_inputs = ["keepers"]
    if sample_bps > 0:
        from .sample import deterministic_sample

        final = ck.stage(
            "sampled",
            lambda: deterministic_sample(
                keepers, "doc_id", rate_bps=sample_bps,
                strata_col="lang_guess", strata_bps=strata_bps,
            ),
            inputs=["keepers"],
            params=p_samp,
        )
        out["sampled"] = final
        stats_inputs = ["sampled"]

    stats = ck.stage(
        "corpus_stats",
        lambda: final.groupBy("lang_guess").agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("total_toks"),
        ),
        inputs=stats_inputs,
        params=p_samp if sample_bps > 0 else p_keep,
    )

    active = {"doc_features", "dup_pairs", "dup_clusters", "keepers",
              "corpus_stats"} | set(out)
    out.update({
        "doc_features": feats,
        "dup_pairs": pairs,
        "dup_clusters": clusters,
        "keepers": keepers,
        "corpus_stats": stats,
        "lineage": {k: v for k, v in ck.lineage().items() if k in active},  # type: ignore[dict-item]
    })
    return out
