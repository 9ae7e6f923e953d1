"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is spatial-join throughput (pages/sec geotagged →
region-assigned); ``value`` is total wall time of the query suite.
Pages are amplified deterministically from the documents table
(``BENCH_COPIES``, default 4000) so sf0.1 exercises 20M pages.  Run
``python bench_scaling.py`` for the N-vs-4N cores scaling evidence
(BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hexspark import ops  # noqa: E402
from hexspark import build as bx  # noqa: E402
from hexspark import cells as cx  # noqa: E402
from hexspark import join as jx  # noqa: E402
from hexspark import synth  # noqa: E402
from hexspark.dedup import dedup_exact  # noqa: E402
from hexspark.embed import ann_topk_brute  # noqa: E402
from hexspark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
COPIES = int(os.environ.get("BENCH_COPIES", "4000"))  # 5000 docs * 4000 = 20M pages
# best-of-N per query (same methodology as bench_scaling): each round
# re-invokes the operator, which builds a FRESH Dataset/plan (the
# Dataset-object AQE-stage-reuse trap doesn't apply), so round 2 measures
# steady-state execution instead of first-compile codegen/JIT noise —
# q10/q11-class expression-heavy queries vary ~2x on the cold round.
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "2"))


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def run(spark) -> tuple[dict, dict]:
    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn, rounds: int = ROUNDS):
        from hexspark import cachepool

        best = None
        result = None
        for _ in range(max(1, rounds)):
            # operators with internal persists (polyfill rects, LSH
            # signatures) build identical plans per round; without this
            # the repeat hits the prior round's CacheManager entry and
            # measures a cache lookup, not the operator
            cachepool.clear_all(blocking=True)
            # JVM GC between queries, OUTSIDE the timer: broadcasts and
            # shuffle state from prior queries are reclaimed by the
            # async ContextCleaner only after their refs are GC'd — by
            # late suite positions that backlog inflates queries ~40-70%
            # (q3 measured 3.5s in-suite vs 2.1s isolated, q14 8.9 vs
            # 5.2).  An explicit gc drains the reference queue so each
            # query measures the operator, not prior queries' garbage.
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            result = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return result

    # persist only raw keys: the q1 timing covers the FULL north-metric
    # path (geotag -> encode -> containment join -> agg)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    dim = docs.select("doc_id", "lang")
    # shuffle-free parallel synthesis: partitioned range spine +
    # broadcast-joined doc attributes
    raw = (
        spark.range(0, n_docs * COPIES, 1, int(CPUS) * 2)
        .select(F.col("id").alias("page_key"), (F.col("id") % n_docs).alias("doc_id"))
        .join(F.broadcast(dim), on="doc_id")
        .drop("doc_id")
        .persist()
    )
    # single-round: these time the materialization of persisted
    # relations — a second round would measure the cache hit
    n_pages = timed("materialize_pages", lambda: raw.count(), rounds=1)
    extras["n_pages"] = n_pages

    # time the WHOLE region-map build (polyfill + driver-side
    # EqCompactor build run eagerly inside region_map, not just the
    # materializing count)
    def _build_map():
        r = ops.region_map(spark).persist()
        r.count()
        return r

    regions = timed("build_region_map", _build_map, rounds=1)

    def geotagged():
        lat, lon = synth.latlon_from_key(F.col("page_key"))
        from hexspark.geo import grid_encode

        return (
            raw.withColumn("lat", lat).withColumn("lon", lon)
            .withColumn("cell", grid_encode(F.col("lat"), F.col("lon"), 12))
        )

    pages = geotagged()

    # q1: flagship spatial join — pages/sec headline (best-of-rounds
    # like every query; each round re-plans the full geotag→encode→
    # join→agg pipeline over the persisted raw keys)
    counts = timed(
        "q1_region_assign", lambda: ops.region_counts(pages, regions).collect()
    )
    extras["pages_per_sec"] = round(n_pages / timings["q1_region_assign"], 1)
    extras["region_counts"] = {r["region"]: r["n_pages"] for r in counts}

    # q2: alternate physical forms, for comparison with q1's auto(chained)
    timed(
        "q2_region_assign_explode",
        lambda: ops.region_counts(pages, regions, form="explode").collect(),
    )
    timed(
        "q2b_region_assign_indexed",
        lambda: ops.region_counts(pages, regions, form="indexed").collect(),
    )

    # q3: tile rollup at res 6
    timed("q3_tile_rollup", lambda: ops.tile_region_rollup(pages, regions, 6).collect())

    # q4: build+compact a large synthetic set from lineitem keys
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cells = li.select(synth.cell_from_key(F.col("l_partkey"), 8).alias("cell"))
    timed("q4_build_compact", lambda: bx.build_region(cells, compactor="set").count())

    # q5: subtree aggregation over the compacted set
    region8 = bx.build_region(
        li.select(
            synth.cell_from_key(F.col("l_partkey"), 8).alias("cell"),
            F.col("l_linenumber").alias("qty"),
        ),
        value_col="qty", compactor="none", dedupe_policy="sum",
    )
    probes = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .select(
            cx.to_parent(synth.cell_from_key(F.col("s_suppkey"), 8), 2).alias("probe")
        ).distinct()
    )
    timed(
        "q5_subtree_sum",
        lambda: jx.subtree_agg(region8, probes, [F.sum("qty").alias("s")], probe_col="probe").collect(),
    )

    # q6: exact dedup over documents (reuses the setup docs relation)
    timed("q6_dedup_exact", lambda: dedup_exact(docs).count())

    # q7: ANN brute top-k over embeddings
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    timed("q7_ann_topk", lambda: ann_topk_brute(emb, q, 10).count())

    # q8: skewed tile rollup, plain vs salted two-phase agg
    from hexspark import cells as hx_cells
    from hexspark import skew as hx_skew

    tiles_src = pages.withColumn("tile", hx_cells.to_parent("cell", 2))
    timed(
        "q8_tile_agg_plain",
        lambda: tiles_src.groupBy("tile").agg(F.count("*").alias("n")).count(),
    )
    timed(
        "q8_tile_agg_salted",
        lambda: hx_skew.salted_agg(
            tiles_src, "tile", 16,
            [F.count("*").alias("c")],
            [F.sum("c").alias("n")],
        ).count(),
    )

    # q9: ring-metric kNN, probe table (Spark-side ring generation)
    import numpy as np

    from hexspark.geo import grid_encode, grid_encode_np, knn_rings

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    clat, clon = synth.latlon_from_key(F.col("c_custkey"))
    stored = (
        cust.select(clat.alias("lat"), clon.alias("lon"))
        .select(grid_encode(F.col("lat"), F.col("lon"), 5).alias("cell"))
        .distinct()
    )
    pk = np.arange(20, dtype=np.int64) * 977
    plat, plon = (pk % 140) - 70.0, (pk % 320) - 160.0
    probes = spark.createDataFrame(
        [(int(c),) for c in np.unique(grid_encode_np(plat.astype(float), plon.astype(float), 5))],
        "probe: long",
    )
    timed(
        "q9_knn_rings",
        lambda: knn_rings(stored, probes, k=5, max_ring=60, res=5).count(),
    )

    # q10: hierarchical polyfill, country-scale at res 7
    from hexspark.geo import polyfill_hier

    poly = [(30.0, -10.0), (45.0, -5.0), (44.0, 15.0), (32.0, 12.0)]
    timed("q10_polyfill_hier", lambda: polyfill_hier(spark, poly, 7).count())

    # q11: embedding near-dup mining, LSH-pruned scale path
    from hexspark.embed import embedding_dups

    timed(
        "q11_embed_dups_lsh",
        lambda: embedding_dups(emb, 0.3, dim=64, n_planes=8, n_tables=4).count(),
    )

    # q12: hyperplane-LSH ANN (bucketed equi-join + two-phase top-k)
    from hexspark.embed import ann_topk_lsh

    timed(
        "q12_ann_lsh",
        lambda: ann_topk_lsh(emb, q, 10, dim=64, n_planes=8, n_tables=4).count(),
    )

    # q13: tumbling-window event rollup (partial+final hash agg)
    from hexspark.streaming import event_window_stats

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("q13_event_windows", lambda: event_window_stats(events).count())

    # q14: zoom pyramid — all tile levels 0..6 from ONE pages shuffle,
    # coarser levels rolled up from children's tile counts
    timed("q14_tile_pyramid", lambda: ops.tile_pyramid(pages, 6).count())

    # q16: spatial × web-curation composite — top domains per region
    # (URL regex-parse before the broadcast containment join, one
    # map-side-combinable (region, domain) count, two-phase top-k)
    def _top_domains():
        # bench pages lack a url column (raw spine keeps only key+lang)
        # — derive the deterministic url the pages source would emit
        with_url = pages.withColumn(
            "url",
            F.concat(
                F.lit("https://s"), (F.col("page_key") % 97).cast("string"),
                F.lit(".example.org/doc/"), F.col("page_key").cast("string"),
            ),
        )
        return ops.top_domains_per_region(with_url, regions, k=5).count()

    timed("q16_top_domains", _top_domains)

    # q17: token-budget sequence packing over the full pages spine —
    # the window runs per Lehmer shard (shards = 4× cores, so every
    # core sorts ~n_pages/128 rows; no global-order reducer exists).
    # The groupBy(shard).max(seq_id) sink forces the window (a bare
    # count() could let the optimizer drop the unused Window node).
    from hexspark.sample import pack_sequences

    def _pack():
        toks = F.col("page_key") % 997 + 1
        out = pack_sequences(
            pages, "page_key", toks, budget=2048, shards=int(CPUS) * 4
        )
        return out.groupBy("shard").agg(F.max("seq_id").alias("mx")).count()

    timed("q17_pack_sequences", _pack)

    # q18: PII count+redact regex chain over a synthetic short text per
    # page — measures the native-regex codegen path at corpus row count
    # (the op every privacy scrub runs on every document).
    from hexspark import text as hx_text

    def _pii():
        txt = F.concat(
            F.lit("contact user"), F.col("page_key").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("page_key") % 256).cast("string"),
            F.lit(" lang "), F.col("lang"),
        )
        # single-sweep form: counting the raw text separately would
        # re-run all three regexes (measured 8.0s vs 4.8s — text.py)
        red, ne, ni, nph = hx_text.pii_scrub_with_counts(txt)
        return pages.select(
            (ne + ni + nph).alias("n"), F.length(red).alias("l")
        ).agg(F.sum("n"), F.sum("l")).collect()

    timed("q18_pii_scrub", _pii)

    # q19: radius distance join — bounded probe set against the full
    # pages table (grid-stencil broadcast; pages never shuffle)
    from hexspark.geo import distance_join

    def _distance_join():
        probes = pages.filter(F.col("page_key") % 199 == 0).select(
            F.col("page_key").alias("probe_id"),
            F.col("lat").alias("plat"), F.col("lon").alias("plon"),
        )
        return distance_join(
            probes, pages, 0.5, probe_key="probe_id", point_key="page_key",
            probe_cols=("plat", "plon"), point_cols=("lat", "lon"),
        ).count()

    timed("q19_distance_join", _distance_join)

    # q20/q21: temporal operators over the events table — one exchange
    # + per-key sort each (asof union-window / rolling range frame)
    from hexspark.temporal import asof_join, rolling_stats

    def _asof():
        probes = events.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        build = events.filter(F.col("event_type") == "click")
        return asof_join(probes, build, tolerance="'6' HOUR").count()

    timed("q20_asof_join", _asof)
    timed("q21_rolling_stats", lambda: rolling_stats(events).count())

    # q22/q23: document scorers (explode → combinable aggs; classifier
    # adds the broadcast weight join)
    from hexspark.text import (
        linear_classifier_score, synth_clf_weights, unigram_surprisal,
    )

    timed("q22_surprisal", lambda: unigram_surprisal(docs).count())
    clf_w = synth_clf_weights(spark)
    timed(
        "q23_classifier",
        lambda: linear_classifier_score(docs, clf_w).count(),
    )

    # q24/q25: the k-ring raster family — tile-scale scatter/gather on
    # top of one pages-scale rollup
    from hexspark.ops import hotspot_tiles, smooth_tiles

    def _tiles():
        return pages.groupBy(
            cx.to_parent("cell", 4).alias("tile")
        ).agg(F.count("*").alias("n_pages"))

    timed("q24_tile_smooth", lambda: smooth_tiles(_tiles(), 2, 4).count())
    timed("q25_tile_hotspot", lambda: hotspot_tiles(_tiles(), 2, 4).count())

    # q26: retention matrix (one events-scale distinct)
    from hexspark.temporal import retention_cohorts

    timed("q26_retention", lambda: retention_cohorts(events).count())

    # q27: DSIR importance weights (pooled explode, bucket-bounded LMs)
    from hexspark.text import importance_weights

    def _dsir():
        target = docs.filter(F.col("doc_id") % 10 == 0)
        return importance_weights(docs, target).count()

    timed("q27_importance", _dsir)

    # q28: exact shared-passage mining (inverted-index gram join)
    from hexspark.text import shared_passages

    timed(
        "q28_shared_passages",
        lambda: shared_passages(docs, n=8, min_len=16).count(),
    )

    # q29: semantic dedup over embeddings (within-centroid cosine)
    from hexspark.embed import semantic_dedup

    timed(
        "q29_semantic_dedup",
        lambda: semantic_dedup(emb, 0.35, n_centroids=8, quantizer="first_k")
        .filter(~F.col("kept")).count(),
    )

    # q30: spatial density cap — pages-scale two-phase top-k on tile
    from hexspark.sample import cap_per_tile

    timed(
        "q30_cap_per_tile",
        lambda: cap_per_tile(pages, k=3, tile_res=4).count(),
    )

    # q31/q32/q33: document scorers/gates (char entropy is the
    # zero-shuffle projection; quantile gate one agg + join-back;
    # fuzzy decontamination a broadcast shingle join)
    from hexspark.sample import group_quantile_filter
    from hexspark.text import (
        char_entropy, contaminated_docs_fuzzy, quality_score,
    )

    timed("q31_char_entropy", lambda: char_entropy(docs).count())
    timed(
        "q32_quantile_filter",
        lambda: group_quantile_filter(
            docs, quality_score(F.col("text")), 5000, "source"
        ).count(),
    )

    def _fuzzy():
        ev = docs.filter(F.col("doc_id") % 50 == 0)
        return contaminated_docs_fuzzy(docs, ev, 40).count()

    timed("q33_decontam_fuzzy", _fuzzy)

    # q34/q35: hierarchical distinct rollup — distinct docs per tile at
    # every zoom level 0..2.  Exact form pays ONE pages-scale distinct
    # (20M (tile, doc) pairs — irreducible: the answer depends on the
    # exact pair set) then reduces sets level-by-level; the HLL form is
    # the 10^12-scale path (map-side-combinable sketch agg, sketches
    # merge up the pyramid — measured ~3.8x the exact form here).
    pages_docs = pages.withColumn("doc_id", F.col("page_key") % F.lit(n_docs))
    timed(
        "q34_pyramid_distinct",
        lambda: ops.pyramid_unique_docs(pages_docs, 2).count(),
    )
    timed(
        "q35_pyramid_distinct_hll",
        lambda: ops.pyramid_unique_docs_approx(pages_docs, 2, lg_k=10).count(),
    )

    # q15: the corpus-curation pipeline END TO END (features → simhash
    # pairs → clusters → keepers → stats) INCLUDING its checkpoint
    # Parquet writes — the dedup family's pinned wall number is the
    # pipeline a user actually runs, not just per-operator timings.
    # Fresh work dir each invocation so resume never hides compute.
    import shutil
    import tempfile

    from hexspark.pipeline import run_corpus_pipeline

    def _corpus_pipeline():
        wd = tempfile.mkdtemp(prefix="hexbench_corpus_")
        try:
            out = run_corpus_pipeline(spark, SF_DIR, wd)
            return out["corpus_stats"].count()
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    timed("q15_corpus_pipeline", _corpus_pipeline, rounds=1)

    raw.unpersist()
    regions.unpersist()
    return timings, extras


def _loadavg() -> "float | None":
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        return None


def _cpu_jiffies() -> "tuple[int, int] | None":
    """(steal, total) jiffies from /proc/stat's aggregate cpu line."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    if parts[:1] != ["cpu"] or len(parts) < 9:
        return None
    vals = [int(v) for v in parts[1:]]
    return vals[7], sum(vals)  # field 9 overall = steal


def steal_pct_between(
    before: "tuple[int, int] | None", after: "tuple[int, int] | None"
) -> "float | None":
    """% of CPU the hypervisor stole between two _cpu_jiffies samples.

    loadavg cannot see hypervisor steal (measured on this box: an
    'idle' run with loadavg < 1 lost 7-14% of CPU to a co-tenant and
    inflated single queries 2-4x), so the pollution label samples the
    steal delta across the run as well."""
    if before is None or after is None:
        return None
    dsteal = after[0] - before[0]
    dtotal = after[1] - before[1]
    if dtotal <= 0:
        return None
    return round(100.0 * dsteal / dtotal, 2)


# CLAUDE.md idle-box rule: a concurrent session skews queries 2-5x
# (BENCH_r03 recorded q3 at 9.07s vs 1.76s idle).  Label the run so
# polluted numbers are never compared like-for-like.
LOAD_IDLE_MAX = float(os.environ.get("BENCH_LOAD_IDLE_MAX", "2.0"))
# steal above this across the run marks the artifact polluted (CLAUDE.md:
# 2.8-7.7% bursts measured on honest-looking runs; ≥2% already flips
# sub-2s queries outside their noise band)
STEAL_POLLUTED_PCT = float(os.environ.get("BENCH_STEAL_MAX_PCT", "2.0"))


def main() -> None:
    load_start = _loadavg()
    jiff_start = _cpu_jiffies()
    if load_start is not None and load_start > LOAD_IDLE_MAX:
        print(
            f"WARNING: 1-min loadavg {load_start} > {LOAD_IDLE_MAX} at bench"
            " start — box is not idle; timings will be inflated and the"
            " output is labeled load_polluted",
            file=sys.stderr,
        )
    # NOTE: the ParallelGC+32g combo that helps bench_scaling's
    # persist-free worker REGRESSES this suite 2-4x (it caches `raw`;
    # measured q2_explode 7.2s -> 64.7s) — keep the default G1/8g here.
    spark = get_spark("hexspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings, extras = run(spark)
    finally:
        spark.stop()
    total = round(sum(v for k, v in timings.items() if k.startswith("q")), 3)
    steal = steal_pct_between(jiff_start, _cpu_jiffies())
    print(json.dumps({
        "metric": "spatial-join suite wall time (headline: q1 pages/sec region-assign)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "rounds_per_query": ROUNDS,
        "loadavg_start": load_start,
        "steal_pct": steal,
        "load_polluted": bool(
            (load_start is not None and load_start > LOAD_IDLE_MAX)
            or (steal is not None and steal > STEAL_POLLUTED_PCT)
        ),
        **extras,
    }))


if __name__ == "__main__":
    main()
