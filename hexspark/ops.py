"""Flagship spatial pipeline: geotag → encode → region-assign → rollups.

This is the end-to-end operator set the north_star describes: pages in
a Common-Crawl-style table are geotagged, batch-encoded to cells, and
joined against broadcast compacted region tables for point-in-polygon
membership, tile rollups, and raster↔vector assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import build as bx
from . import cells as cx
from . import join as jx
from .geo import polyfill

# Three disjoint synthetic vector regions (lat, lon vertices).  Chosen
# for the deterministic test/bench pipeline; production regions come
# from any polygon source (geojson etc.).
REGIONS: dict[str, list[tuple[float, float]]] = {
    "alpha": [(25.0, -100.0), (40.0, -95.0), (38.0, -80.0), (28.0, -78.0), (22.0, -90.0)],
    "beta": [(42.0, 0.0), (55.0, 5.0), (57.0, 20.0), (45.0, 25.0), (40.0, 12.0)],
    "gamma": [(-35.0, 120.0), (-18.0, 125.0), (-15.0, 140.0), (-30.0, 150.0), (-38.0, 135.0)],
}
REGION_RES = 4


def region_map(spark: SparkSession, res: int = REGION_RES, compact: bool = True) -> DataFrame:
    """Vector→raster: polyfill each polygon, tag with its name, build
    the compacted broadcast region map (EqCompactor — contiguous same-
    value areas coalesce, /root/reference/src/compaction.rs:63-72)."""
    parts = [
        polyfill(spark, poly, res).withColumn("region", F.lit(name))
        for name, poly in REGIONS.items()
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    if compact:
        # broadcast-scale by construction → driver-side numpy build
        return bx.build_region_local(df, value_col="region", compactor="eq")
    return df


def assign_regions(
    pages: DataFrame,
    regions: DataFrame,
    how: str = "inner",
    form: str = "auto",
) -> DataFrame:
    """Attach (stored_cell, region) to each page by nearest-ancestor
    containment — the flagship spatial join.  ``form``: 'auto' picks
    codegen explode vs searchsorted by region res-set (see
    join.get_auto); 'indexed'/'explode' force a path."""
    fn = {
        "auto": jx.get_auto,
        "chained": jx.get_chained,
        "indexed": jx.get_indexed,
        "explode": jx.get_explode,
    }[form]
    return fn(pages, regions, probe_col="cell", region_col="cell", how=how)


def region_counts(
    pages: DataFrame, regions: DataFrame, form: str = "auto"
) -> DataFrame:
    """Pages per region — the headline throughput query.

    Pages are projected to (cell, lang) *before* the join: Catalyst
    cannot prune columns through ``mapInPandas`` (the UDF signature
    pins the schema), so we prune manually — at 10^12 rows this keeps
    url/html/text bytes out of the Arrow channel entirely."""
    slim = pages.select("cell", "lang")
    assigned = assign_regions(slim, regions, how="inner", form=form)
    return assigned.groupBy("region").agg(
        F.count("*").alias("n_pages"),
        F.count_distinct("lang").alias("n_langs"),
    )


def tile_stats(pages: DataFrame, tile_res: int) -> DataFrame:
    """Raster rollup: per-tile page counts at ``tile_res``.

    One map-side-combinable groupBy on a derived column — the analogue
    of A6 per-region tile stats."""
    return pages.groupBy(
        cx.to_parent("cell", tile_res).alias("tile")
    ).agg(
        F.count("*").alias("n_pages"),
        F.count_distinct("lang").alias("n_langs"),
    )


def tile_stats_approx(
    pages: DataFrame,
    tile_res: int,
    distinct_col: str = "lang",
    rsd: float = 0.05,
) -> DataFrame:
    """Sketch-based tile stats for cardinality at scale: exact
    ``count_distinct`` needs a second shuffle keyed by (tile, value);
    ``approx_count_distinct`` (HyperLogLog++) merges fixed-size sketches
    map-side — one shuffle, O(tiles) state, ``rsd`` relative error.
    The scale path for high-cardinality distinct columns (urls, doc
    fingerprints); exact :func:`tile_stats` stays the oracle-gated
    contract query."""
    return pages.groupBy(
        cx.to_parent("cell", tile_res).alias("tile")
    ).agg(
        F.count("*").alias("n_pages"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("n_distinct_approx"),
    )


def tile_region_rollup(
    pages: DataFrame, regions: DataFrame, tile_res: int
) -> DataFrame:
    """Raster↔vector assignment: aggregate pages to raster tiles, then
    assign each tile to its covering vector region (containment join on
    the *tile* cell).  Tiles straddling no region drop out (inner)."""
    tiles = tile_stats(pages, tile_res)
    return (
        jx.get_auto(tiles, regions, probe_col="tile")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum("n_pages").alias("n_pages"),
        )
    )


def top_domains_per_region(
    pages: DataFrame, regions: DataFrame, k: int = 3
) -> DataFrame:
    """Top-``k`` crawl domains inside each vector region — the spatial
    × web-curation composite (which sources dominate a geography).

    Shape: manual projection (URL parsed BEFORE the join so only the
    short domain string rides it), broadcast containment join, one
    map-side-combinable (region, domain) count, then the two-phase
    top-k tail (hexspark.topk) — no window shuffling all domains of a
    region into one reducer."""
    from .text import domain_of
    from .topk import topk_per_key

    slim = pages.select("cell", domain_of(F.col("url")).alias("domain"))
    assigned = jx.get_auto(slim, regions, probe_col="cell")
    counts = assigned.groupBy("region", "domain").agg(
        F.count("*").alias("n_pages")
    )
    return topk_per_key(
        counts,
        keys=["region"],
        order=[-F.col("n_pages"), F.col("domain")],
        payload=["domain", "n_pages"],
        k=k,
    )


def tile_region_rollup_pretiled(
    tiled: DataFrame, regions: DataFrame
) -> DataFrame:
    """:func:`tile_region_rollup` over a source that already CARRIES the
    tile column — the bucketed-pipeline form: when ``tiled`` is a table
    bucketed on ``tile`` (storage.write_bucketed / Checkpointer.
    stage_bucketed), the tile aggregation groups on the stored bucket
    key and the containment join broadcasts, so the executed plan has
    NO Exchange until the final region-cardinality groupBy (asserted in
    tests/test_pipeline.py).  Output identical to tile_region_rollup
    over the un-tiled pages."""
    tiles = tiled.groupBy("tile").agg(F.count("*").alias("n_pages"))
    return (
        jx.get_auto(tiles, regions, probe_col="tile")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum("n_pages").alias("n_pages"),
        )
    )


def tile_pyramid(
    pages: DataFrame, max_res: int, cell_col: str = "cell"
) -> DataFrame:
    """Full zoom pyramid — (z, tile, n_pages) for every z in
    0..``max_res`` — in ONE pages-scale shuffle plus ONE
    tile-cardinality shuffle: pages aggregate to res-``max_res`` tiles
    (map-side combine), then each base tile explodes to its
    ``max_res + 1`` (z, ancestor) pairs and a single
    ``groupBy(z, tile)`` rolls every level up at once (nesting
    invariant: ``to_parent(to_parent(c, z+1), z) == to_parent(c, z)``,
    so summing base counts per ancestor equals the cascaded rollup).

    Why this shape and not the alternatives:

    * one groupBy per level over ``pages`` — reshuffles the PAGE
      relation max_res times (at 10^12 pages, max_res extra full
      shuffles for identical output);
    * cascaded child rollups (level z from level z+1) with per-level
      persists — shuffles slightly fewer rows (a 7-branching geometric
      tail) but pays max_res plan barriers: per-level codegen + job
      submit + persist bookkeeping, measured ~2.5 s of pure warm-up on
      a 7-level pyramid at sf0.1, and holds max_res cached relations.

    The explode's shuffle volume is distinct-tile count × levels —
    bounded by SPATIAL cardinality (≤ 122·7^max_res cells exist at the
    base res), never page count — and partial aggregation collapses it
    per map task before the exchange.  No persist needed: the base
    aggregate feeds exactly one downstream plan.

    The ancestor list is built with ``transform(sequence(0, max_res))``
    — ONE codegen'd lambda evaluated per level — rather than an
    unrolled ``array(struct(0, ...), ..., struct(max_res, ...))``
    literal: the unrolled form compiles max_res+1 copies of the
    to_parent expression into the generated class (measured: ~1 s
    extra first-round compile AND ~2× steady-state per-row cost at
    sf0.1; the lambda form measured 6.6 → 0.64 s steady-state against
    the previous cascaded-persist implementation's 4.1 s)."""
    base = (
        pages.groupBy(cx.to_parent(cell_col, max_res).alias("tile"))
        .agg(F.count("*").alias("n_pages"))
    )
    ancestors = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(max_res)),
            lambda z: F.struct(
                z.cast("long").alias("z"),
                cx.to_parent("tile", z).alias("tile"),
            ),
        )
    ).alias("a")
    return (
        base.select(ancestors, "n_pages")
        .groupBy(F.col("a.z").alias("z"), F.col("a.tile").alias("tile"))
        .agg(F.sum("n_pages").alias("n_pages"))
    )
