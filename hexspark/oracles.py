"""DuckDB oracle-SQL builders.

Each function returns an ANSI-SQL string (DuckDB dialect) equivalent to
one engine query, runnable on the driver's pre-registered parquet views
(region nation customer supplier part orders lineitem events documents
embeddings).  The SQL is *generated from the same constants/formulas*
as the Spark side (hexspark.synth / hexspark.geo), so the two cannot
drift — this is the engine's analogue of the reference's
``naive_contains`` linear-scan oracle (/root/reference/tests/tests.rs:6-23).
"""

from __future__ import annotations

from . import constants as K
from . import synth
from .geo import dd_grid_encode, pip_sql_predicate
from .pages import dd_pages_cte


def dd_compact_set_cte(src_cte: str, max_res: int, prefix: str = "lvl") -> str:
    """Unrolled bottom-up set compaction: one CTE pair per level from
    ``max_res`` down to 1 (the A2 loop as pure SQL).  ``src_cte`` must
    select a single BIGINT column ``cell`` of pairwise non-related,
    deduplicated cells.  ``prefix`` namespaces the CTE chain (final
    result = ``{prefix}0``) so one query can compact several sets (the
    set-algebra oracles compact A, B and the result)."""
    # MATERIALIZED is load-bearing: every lvl references the previous
    # lvl twice (directly + via step) — DuckDB inlines plain CTEs per
    # reference, so without it the chain re-evaluates the source
    # ~3^max_res times (measured: 128s -> <1s on 2k cells)
    ctes = [f"{prefix}{max_res} AS MATERIALIZED ({src_cte})"]
    for r in range(max_res, 0, -1):
        parent = synth.dd_to_parent("cell", r - 1)
        res = synth.dd_res("cell")
        ctes.append(
            f"""{prefix}step{r} AS MATERIALIZED (
                SELECT parent AS cell FROM (
                    SELECT {parent} AS parent, COUNT(*) AS c
                    FROM {prefix}{r} WHERE {res} = {r} GROUP BY 1
                ) WHERE c = 7
            )"""
        )
        ctes.append(
            f"""{prefix}{r - 1} AS MATERIALIZED (
                SELECT cell FROM {prefix}{r}
                WHERE {res} <> {r}
                   OR {parent} NOT IN (SELECT cell FROM {prefix}step{r})
                UNION ALL
                SELECT cell FROM {prefix}step{r}
            )"""
        )
    return ",\n".join(ctes)


def dd_polyfill_cte(polygon, res: int, name: str) -> str:
    """SQL twin of hexspark.geo.polyfill for one polygon — the lattice
    comes from the SAME helper (geo.polyfill_grid) the Spark side uses,
    so pitch/snap/extent cannot drift between engines."""
    from .geo import polyfill_grid

    px, py, lat0, lon0, nx, ny = polyfill_grid(polygon, res)
    lat = f"({lat0!r} + ((FLOOR(i / {nx}) + 0.5) * {py!r}))"
    lon = f"({lon0!r} + (((i % {nx}) + 0.5) * {px!r}))"
    pip = pip_sql_predicate(lat, lon, polygon)
    cell = dd_grid_encode(lat, lon, res)
    return (
        f"SELECT DISTINCT {cell} AS cell, '{name}' AS region "
        f"FROM (SELECT UNNEST(RANGE({ny * nx})) AS i) WHERE {pip}"
    )


def dd_region_cells_cte(regions: dict, res: int) -> str:
    return " UNION ALL ".join(
        dd_polyfill_cte(poly, res, name) for name, poly in regions.items()
    )


# ---------------------------------------------------------------------------
# per-query oracles
# ---------------------------------------------------------------------------

def q_cell_ops() -> str:
    cell = synth.dd_cell_from_key("o_orderkey", 9)
    return f"""
        SELECT
            o_orderkey AS key,
            {cell} AS cell,
            {synth.dd_res(cell)} AS res,
            {synth.dd_base(cell)} AS base,
            {synth.dd_to_parent(cell, 4)} AS parent4,
            {synth.dd_lo(cell)} AS lo,
            {synth.dd_hi(cell)} AS hi
        FROM orders
    """


def q_build_compact_set() -> str:
    src = f"SELECT DISTINCT {synth.dd_cell_from_key('l_partkey', 6)} AS cell FROM lineitem"
    ctes = dd_compact_set_cte(src, 6)
    return f"WITH {ctes} SELECT cell FROM lvl0"


def q_contains() -> str:
    src = f"SELECT DISTINCT {synth.dd_cell_from_key('l_partkey', 6)} AS cell FROM lineitem"
    ctes = dd_compact_set_cte(src, 6)
    probe = synth.dd_cell_from_key("o_orderkey", 12)
    # containment unaffected by compaction; probe the UNcompacted set via
    # ancestor equality at the single build res (coverage identical)
    return f"""
        WITH {ctes},
        probes AS (SELECT o_orderkey AS key, {probe} AS cell FROM orders)
        SELECT p.key,
               EXISTS (
                 SELECT 1 FROM lvl0 r
                 WHERE {synth.dd_lo('r.cell')} <= {synth.dd_lo('p.cell')}
                   AND {synth.dd_hi('r.cell')} >= {synth.dd_hi('p.cell')}
               ) AS contained
        FROM probes p
    """


def q_get_value() -> str:
    # NullCompactor map at res 6: dedupe (min value) only
    reg = f"""
        SELECT {synth.dd_cell_from_key('l_partkey', 6)} AS cell,
               MIN(l_suppkey) AS supp
        FROM lineitem GROUP BY 1
    """
    probe = synth.dd_cell_from_key("o_orderkey", 12)
    return f"""
        WITH region AS ({reg}),
        probes AS (SELECT o_orderkey AS key, {probe} AS cell FROM orders)
        SELECT p.key, r.cell AS stored_cell, r.supp AS supp
        FROM probes p JOIN region r
          ON r.cell = {synth.dd_to_parent('p.cell', 6)}
    """


def q_region_counts(regions: dict, region_res: int, copies: int, page_res: int) -> str:
    rc = dd_region_cells_cte(regions, region_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc})
        SELECT r.region AS region,
               COUNT(*) AS n_pages,
               COUNT(DISTINCT p.lang) AS n_langs
        FROM pages p
        JOIN rcells r ON r.cell = {synth.dd_to_parent('p.cell', region_res)}
        GROUP BY 1
    """


def q_tile_stats(copies: int, page_res: int, tile_res: int) -> str:
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)})
        SELECT {synth.dd_to_parent('cell', tile_res)} AS tile,
               COUNT(*) AS n_pages,
               COUNT(DISTINCT lang) AS n_langs
        FROM pages GROUP BY 1
    """


def q_tile_xyz(copies: int, page_res: int, tile_res: int) -> str:
    from .geo import dd_cell_to_ij

    tile = synth.dd_to_parent("cell", tile_res)
    i, j = dd_cell_to_ij("tile", tile_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        tiles AS (
            SELECT {tile} AS tile, COUNT(*) AS n_pages
            FROM pages GROUP BY 1
        )
        SELECT CAST({tile_res} AS BIGINT) AS z, {i} AS x, {j} AS y, tile, n_pages
        FROM tiles
    """


def q_tile_smooth(copies: int, page_res: int, tile_res: int, k: int) -> str:
    """Twin of ops.smooth_tiles over the synthetic pages raster —
    scatter/gather entirely in lattice (i, j) space (no SQL inverse
    encoder needed: cells map 1:1 to coords at one res)."""
    from .geo import GRID_DIM, _axis_levels, dd_cell_to_ij

    xl, yl = _axis_levels(tile_res)
    ni, nj = GRID_DIM * 7**xl, GRID_DIM * 7**yl
    tile = synth.dd_to_parent("cell", tile_res)
    i, j = dd_cell_to_ij("tile", tile_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        tiles AS (
            SELECT {tile} AS tile, COUNT(*) AS n_pages
            FROM pages GROUP BY 1
        ),
        tij AS (SELECT tile, n_pages, {i} AS ti, {j} AS tj FROM tiles),
        scat AS (
            SELECT t.ti + a.di AS si, t.tj + b.dj AS sj, t.n_pages
            FROM tij t,
                 LATERAL (SELECT UNNEST(RANGE({-k}, {k + 1}))) a(di),
                 LATERAL (SELECT UNNEST(RANGE({-k}, {k + 1}))) b(dj)
            WHERE t.ti + a.di >= 0 AND t.ti + a.di < {ni}
              AND t.tj + b.dj >= 0 AND t.tj + b.dj < {nj}
        ),
        g AS (
            SELECT si, sj, SUM(n_pages) AS neigh_sum,
                   COUNT(*) AS neigh_cnt
            FROM scat GROUP BY 1, 2
        )
        SELECT t.tile, t.n_pages,
               CAST(g.neigh_sum AS BIGINT) AS neigh_sum,
               CAST(g.neigh_cnt AS BIGINT) AS neigh_cnt
        FROM tij t JOIN g ON g.si = t.ti AND g.sj = t.tj
    """


def q_tile_hotspot(copies: int, page_res: int, tile_res: int, k: int) -> str:
    """Twin of ops.hotspot_tiles — q_tile_smooth plus the global-mean
    excess numerator (integer-cleared of denominators)."""
    from .geo import GRID_DIM, _axis_levels, dd_cell_to_ij

    xl, yl = _axis_levels(tile_res)
    ni, nj = GRID_DIM * 7**xl, GRID_DIM * 7**yl
    tile = synth.dd_to_parent("cell", tile_res)
    i, j = dd_cell_to_ij("tile", tile_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        tiles AS (
            SELECT {tile} AS tile, COUNT(*) AS n_pages
            FROM pages GROUP BY 1
        ),
        tij AS (SELECT tile, n_pages, {i} AS ti, {j} AS tj FROM tiles),
        scat AS (
            SELECT t.ti + a.di AS si, t.tj + b.dj AS sj, t.n_pages
            FROM tij t,
                 LATERAL (SELECT UNNEST(RANGE({-k}, {k + 1}))) a(di),
                 LATERAL (SELECT UNNEST(RANGE({-k}, {k + 1}))) b(dj)
            WHERE t.ti + a.di >= 0 AND t.ti + a.di < {ni}
              AND t.tj + b.dj >= 0 AND t.tj + b.dj < {nj}
        ),
        g AS (
            SELECT si, sj, SUM(n_pages) AS neigh_sum,
                   COUNT(*) AS neigh_cnt
            FROM scat GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(SUM(n_pages) AS BIGINT) AS gs,
                   COUNT(*) AS gn
            FROM tiles
        )
        SELECT t.tile, t.n_pages,
               CAST(g.neigh_sum AS BIGINT) AS neigh_sum,
               CAST(g.neigh_cnt AS BIGINT) AS neigh_cnt,
               CAST(g.neigh_sum * tot.gn - tot.gs * g.neigh_cnt AS BIGINT)
                 AS excess_num,
               (g.neigh_sum * tot.gn - tot.gs * g.neigh_cnt) > 0 AS is_hot
        FROM tij t JOIN g ON g.si = t.ti AND g.sj = t.tj, tot
    """


def q_tile_region_rollup(regions: dict, region_res: int, copies: int, page_res: int, tile_res: int) -> str:
    rc = dd_region_cells_cte(regions, region_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc}),
        tiles AS (
            SELECT {synth.dd_to_parent('cell', tile_res)} AS tile,
                   COUNT(*) AS n_pages
            FROM pages GROUP BY 1
        )
        SELECT r.region AS region,
               COUNT(*) AS n_tiles,
               CAST(SUM(n_pages) AS BIGINT) AS n_pages
        FROM tiles t
        JOIN rcells r ON r.cell = {synth.dd_to_parent('t.tile', region_res)}
        GROUP BY 1
    """


def q_region_unique_docs(regions: dict, region_res: int, copies: int, page_res: int) -> str:
    """Composite: dedup (fingerprint) × spatial (region containment)."""
    from .text import dd_fingerprint

    rc = dd_region_cells_cte(regions, region_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc})
        SELECT r.region AS region,
               COUNT(DISTINCT {dd_fingerprint('p.text')}) AS n_unique_docs,
               COUNT(*) AS n_pages
        FROM pages p
        JOIN rcells r ON r.cell = {synth.dd_to_parent('p.cell', region_res)}
        GROUP BY 1
    """


def q_subtree_sum() -> str:
    reg = f"""
        SELECT {synth.dd_cell_from_key('l_partkey', 8)} AS cell,
               SUM(l_linenumber) AS qty
        FROM lineitem GROUP BY 1
    """
    return f"""
        WITH region AS ({reg}),
        probes AS (
            SELECT DISTINCT {synth.dd_to_parent(synth.dd_cell_from_key('s_suppkey', 8), 2)} AS probe
            FROM supplier
        )
        SELECT p.probe, CAST(SUM(r.qty) AS BIGINT) AS total_qty, COUNT(*) AS n_leaves
        FROM probes p JOIN region r
          ON {synth.dd_lo('r.cell')} <= {synth.dd_hi('p.probe')}
         AND {synth.dd_hi('r.cell')} >= {synth.dd_lo('p.probe')}
        GROUP BY 1
    """


def q_knn(k: int, copies: int, page_res: int = 12) -> str:
    alat, alon = synth.dd_latlon_from_key("(n_nationkey * 7919 + 13)")
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        anchors AS (
            SELECT n_nationkey AS anchor_id, {alat} AS alat, {alon} AS alon
            FROM nation WHERE n_nationkey < 5
        ),
        ranked AS (
            SELECT a.anchor_id, p.page_key,
                   (p.lat - a.alat) * (p.lat - a.alat)
                 + (p.lon - a.alon) * (p.lon - a.alon) AS dist,
                   ROW_NUMBER() OVER (
                     PARTITION BY a.anchor_id
                     ORDER BY (p.lat - a.alat) * (p.lat - a.alat)
                            + (p.lon - a.alon) * (p.lon - a.alon) ASC,
                            p.page_key ASC
                   ) AS rank
            FROM anchors a, pages p
        )
        SELECT anchor_id, rank, page_key FROM ranked WHERE rank <= {k}
    """


def q_cell_hex() -> str:
    cell = synth.dd_cell_from_key("o_orderkey", 7)
    return f"""
        SELECT o_orderkey AS key,
               lower(hex({cell})) AS hexform,
               {cell} AS parsed
        FROM orders
    """


def q_descendants() -> str:
    reg = f"SELECT DISTINCT {synth.dd_cell_from_key('l_partkey', 6)} AS cell FROM lineitem"
    probes = f"""
        SELECT DISTINCT {synth.dd_to_parent(synth.dd_cell_from_key('s_suppkey', 6), 2)} AS probe
        FROM supplier
    """
    return f"""
        WITH region AS ({reg}), probes AS ({probes})
        SELECT p.probe, r.cell, {synth.dd_lo('r.cell')} AS lo
        FROM probes p JOIN region r
          ON {synth.dd_lo('r.cell')} <= {synth.dd_hi('p.probe')}
         AND {synth.dd_hi('r.cell')} >= {synth.dd_lo('p.probe')}
    """


def dd_uncompact(src_cte: str, from_res: int, to_res: int) -> str:
    """Unrolled descendant expansion (inverse of compaction)."""
    ctes = [f"u{from_res} AS ({src_cte})"]
    for r in range(from_res, to_res):
        shift = 1 << ((K.MAX_RES - (r + 1)) * K.DIGIT_BITS)
        bumped = f"((cell & {~K.RES_MASK}) | {(r + 1) << K.RES_OFFSET})"
        ctes.append(
            f"""u{r + 1} AS (
                SELECT ({bumped} - (7 - d) * {shift}) AS cell
                FROM u{r}, (SELECT UNNEST(RANGE(7)) AS d)
            )"""
        )
    return ",\n".join(ctes)


def q_uncompact() -> str:
    src = f"SELECT DISTINCT {synth.dd_cell_from_key('s_suppkey', 4)} AS cell FROM supplier"
    ctes = dd_uncompact(src, 4, 6)
    return f"WITH {ctes} SELECT cell FROM u6"


def q_text_features() -> str:
    from . import text as tx

    return f"""
        SELECT doc_id,
               {tx.dd_token_count('text')} AS toks,
               {tx.dd_word_count('text')} AS words,
               {tx.dd_lang_id('text')} AS lang_guess,
               {tx.dd_quality_score('text')} AS quality,
               {tx.dd_fingerprint('text')} AS fp
        FROM documents
    """


def q_knn_rings(
    k: int, max_ring: int, res: int, probe_latlons=((0.0, 0.0),)
) -> str:
    """Ring-metric kNN oracle: stored = distinct grid cells of customer
    points, probes = the grid cells of ``probe_latlons``; ring = lattice
    Chebyshev distance via the :func:`hexspark.geo.dd_cell_to_ij` twin —
    equivalent by definition to the engine's per-probe k-ring-disk
    expansion + join, ranked per probe."""
    import numpy as np

    from .geo import cell_to_ij_np, dd_cell_to_ij, dd_grid_encode, grid_encode_np

    lats = np.array([p[0] for p in probe_latlons], dtype=float)
    lons = np.array([p[1] for p in probe_latlons], dtype=float)
    pcells = np.unique(grid_encode_np(lats, lons, res))
    pi, pj, _ = cell_to_ij_np(pcells.astype(np.int64))
    values = ", ".join(
        f"(CAST({int(c)} AS BIGINT), {int(a)}, {int(b)})"
        for c, a, b in zip(pcells, pi, pj)
    )
    lat, lon = synth.dd_latlon_from_key("c_custkey")
    cell = dd_grid_encode(lat, lon, res)
    i, j = dd_cell_to_ij("s.cell", res)
    return f"""
        WITH stored AS (SELECT DISTINCT {cell} AS cell FROM customer),
        probes(probe, pi, pj) AS (VALUES {values}),
        scored AS (
            SELECT p.probe, s.cell,
                   GREATEST(ABS({i} - p.pi), ABS({j} - p.pj)) AS ring
            FROM stored s, probes p
        ),
        ranked AS (
            SELECT probe, cell, ring,
                   ROW_NUMBER() OVER (
                     PARTITION BY probe ORDER BY ring, cell
                   ) AS rank
            FROM scored WHERE ring <= {max_ring}
        )
        SELECT probe, rank, cell, ring
        FROM ranked WHERE rank <= {k}
    """


def q_point_in_polygon(regions: dict, copies: int, page_res: int = 12) -> str:
    pip = pip_sql_predicate("lat", "lon", regions["alpha"])
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)})
        SELECT lang, COUNT(*) AS n_pages
        FROM pages WHERE {pip}
        GROUP BY 1
    """


def q_nearest_region(
    regions: dict, region_res: int, copies: int, page_res: int
) -> str:
    """DuckDB twin of ops.nearest_region: containment hits ring 0;
    every miss cross-joins the (small) region-cell set and takes the
    min (Chebyshev, cell) — the engine's two-tier (ring search + brute
    broadcast min) must be row-identical to this single brute pass."""
    from .geo import dd_cell_to_ij

    rc = dd_region_cells_cte(regions, region_res)
    parent = synth.dd_to_parent("cell", region_res)
    pi, pj = dd_cell_to_ij("m.probe", region_res)
    ri, rj = dd_cell_to_ij("r.cell", region_res)
    cheb = f"GREATEST(ABS({pi} - {ri}), ABS({pj} - {rj}))"
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc}),
        keyed AS (SELECT page_key, {parent} AS probe FROM pages),
        hits AS (
            SELECT k.page_key, r.region,
                   CAST(0 AS BIGINT) AS ring, 'contains' AS via
            FROM keyed k JOIN rcells r ON r.cell = k.probe
        ),
        miss AS (
            SELECT * FROM keyed
            WHERE probe NOT IN (SELECT cell FROM rcells)
        ),
        best AS (
            SELECT probe, region, cheb AS ring FROM (
                SELECT m.probe, r.region, {cheb} AS cheb,
                       ROW_NUMBER() OVER (
                         PARTITION BY m.probe
                         ORDER BY {cheb} ASC, r.cell ASC
                       ) AS rn
                FROM (SELECT DISTINCT probe FROM miss) m, rcells r
            ) WHERE rn = 1
        )
        SELECT page_key, region, ring, via FROM hits
        UNION ALL
        SELECT m.page_key, b.region, CAST(b.ring AS BIGINT) AS ring,
               'nearest' AS via
        FROM miss m JOIN best b ON b.probe = m.probe
    """


def q_pyramid_unique(copies: int, page_res: int, max_res: int) -> str:
    """DuckDB twin of ops.pyramid_unique_docs: per-level direct
    COUNT(DISTINCT doc_id) — equal to the engine's set-reduction
    cascade because level z's distinct (tile, doc) set is exactly the
    reprojection of level z+1's (to_parent nesting invariant)."""
    selects = [
        f"""SELECT CAST({z} AS BIGINT) AS z,
                   {synth.dd_to_parent('cell', z)} AS tile,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM pages GROUP BY 2"""
        for z in range(max_res + 1)
    ]
    return (
        f"WITH pages AS ({dd_pages_cte(copies, page_res)})\n"
        + "\nUNION ALL\n".join(selects)
    )


def q_tile_pyramid(copies: int, page_res: int, max_res: int) -> str:
    """DuckDB twin of ops.tile_pyramid: per-level direct aggregation —
    equal to the engine's child-rollup by the to_parent nesting
    invariant."""
    selects = [
        f"""SELECT CAST({z} AS BIGINT) AS z,
                   {synth.dd_to_parent('cell', z)} AS tile,
                   COUNT(*) AS n_pages
            FROM pages GROUP BY 2"""
        for z in range(max_res + 1)
    ]
    return (
        f"WITH pages AS ({dd_pages_cte(copies, page_res)})\n"
        + "\nUNION ALL\n".join(selects)
    )


# ---------------------------------------------------------------------------
# compacted-set algebra (hexspark.setops)
# ---------------------------------------------------------------------------

def dd_uncompact_mixed(src_cte: str, lo_res: int, to_res: int, prefix: str) -> str:
    """Mixed-resolution descendant expansion: each level explodes only
    the cells AT that level, passing finer/other cells through — the
    SQL twin of build.uncompact_df over a compacted (multi-res) set.
    Final CTE = ``{prefix}{to_res}``."""
    res = synth.dd_res("cell")
    ctes = [f"{prefix}{lo_res} AS MATERIALIZED ({src_cte})"]
    for r in range(lo_res, to_res):
        shift = 1 << ((K.MAX_RES - (r + 1)) * K.DIGIT_BITS)
        bumped = f"((cell & {~K.RES_MASK}) | {(r + 1) << K.RES_OFFSET})"
        ctes.append(
            f"""{prefix}{r + 1} AS MATERIALIZED (
                SELECT ({bumped} - (7 - d) * {shift}) AS cell
                FROM {prefix}{r}, (SELECT UNNEST(RANGE(7)) AS d)
                WHERE {res} = {r}
                UNION ALL
                SELECT cell FROM {prefix}{r} WHERE {res} <> {r}
            )"""
        )
    return ",\n".join(ctes)


def dd_drop_covered_cte(src_cte: str, prefix: str) -> str:
    """Ancestor-wins prune (build.drop_covered twin): drop any cell
    strictly covered by a coarser cell in the same set.  Result CTE =
    ``{prefix}``."""
    lo_x, hi_x = synth.dd_lo("x.cell"), synth.dd_hi("x.cell")
    lo_y, hi_y = synth.dd_lo("y.cell"), synth.dd_hi("y.cell")
    res_x, res_y = synth.dd_res("x.cell"), synth.dd_res("y.cell")
    return f"""{prefix}src AS MATERIALIZED ({src_cte}),
        {prefix} AS MATERIALIZED (
            SELECT cell FROM {prefix}src x WHERE NOT EXISTS (
                SELECT 1 FROM {prefix}src y
                WHERE {res_y} < {res_x}
                  AND {lo_y} <= {lo_x} AND {hi_y} >= {hi_x}
            )
        )"""


SETOPS_RES_A = 6
SETOPS_PTS_RES = 7
SETOPS_FRESH_OFFSET = 999983


def dd_setops_ab_srcs() -> tuple[str, str]:
    """The shared A/B fixture formulas for the set-algebra oracles
    (mirrored Spark-side in __spark_entry__._setops_ab): A = supplier
    keys at res 6; B overlaps A three ways — coarser parents (k%5==0),
    res-7 digit-3 children (k%7==1), fresh mostly-disjoint cells
    (k%11==2)."""
    ra = SETOPS_RES_A
    cell = synth.dd_cell_from_key("s_suppkey", ra)
    a_src = f"SELECT DISTINCT {cell} AS cell FROM supplier"
    child_shift = 1 << ((K.MAX_RES - (ra + 1)) * K.DIGIT_BITS)
    bumped = f"(({cell} & {~K.RES_MASK}) | {(ra + 1) << K.RES_OFFSET})"
    child3 = f"({bumped} - 4 * {child_shift})"
    parent = synth.dd_to_parent(cell, ra - 1)
    fresh = synth.dd_cell_from_key(f"(s_suppkey + {SETOPS_FRESH_OFFSET})", ra)
    b_src = f"""
        SELECT DISTINCT cell FROM (
            SELECT {parent} AS cell FROM supplier WHERE s_suppkey % 5 = 0
            UNION ALL
            SELECT {child3} AS cell FROM supplier WHERE s_suppkey % 7 = 1
            UNION ALL
            SELECT {fresh} AS cell FROM supplier WHERE s_suppkey % 11 = 2
        )
    """
    return a_src, b_src


def q_set_op(op: str) -> str:
    """Oracle for set_{intersect,union,difference}: uncompact both
    compacted operands to the common point resolution, apply the plain
    SQL set operation, re-compact — the from-first-principles point-set
    definition the closed-form join algebra must reproduce exactly.
    ``op``: INTERSECT | UNION | EXCEPT."""
    a_src, b_src = dd_setops_ab_srcs()
    ra, rp = SETOPS_RES_A, SETOPS_PTS_RES
    res = synth.dd_res("cell")
    parts = [
        dd_compact_set_cte(a_src, ra, prefix="ca"),
        dd_drop_covered_cte(b_src, "bp"),
        dd_compact_set_cte("SELECT cell FROM bp", rp, prefix="cb"),
        dd_uncompact_mixed("SELECT cell FROM ca0", 0, rp, "ua"),
        dd_uncompact_mixed("SELECT cell FROM cb0", 0, rp, "ub"),
        f"""pts AS MATERIALIZED (
            SELECT cell FROM ua{rp} WHERE {res} = {rp}
            {op}
            SELECT cell FROM ub{rp} WHERE {res} = {rp}
        )""",
        dd_compact_set_cte("SELECT cell FROM pts", rp, prefix="rc"),
    ]
    return "WITH " + ",\n".join(parts) + "\nSELECT cell FROM rc0"


def q_top_domains(regions: dict, region_res: int, copies: int, page_res: int, k: int) -> str:
    """Oracle for ops.top_domains_per_region: ROW_NUMBER window over
    per-(region, domain) page counts (count desc, domain asc tie-break
    — the same unique ordering the two-phase top-k uses)."""
    from .text import dd_domain_of

    rc = dd_region_cells_cte(regions, region_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc}),
        counts AS (
            SELECT r.region AS region,
                   {dd_domain_of('p.url')} AS domain,
                   COUNT(*) AS n_pages
            FROM pages p
            JOIN rcells r ON r.cell = {synth.dd_to_parent('p.cell', region_res)}
            GROUP BY 1, 2
        )
        SELECT region, rank, domain, n_pages FROM (
            SELECT region, domain, n_pages,
                   ROW_NUMBER() OVER (
                     PARTITION BY region ORDER BY n_pages DESC, domain ASC
                   ) AS rank
            FROM counts
        ) WHERE rank <= {k}
    """


def q_stratified_sample(rate_bps: int, strata_bps: dict) -> str:
    """Oracle for sample.deterministic_sample over documents."""
    from .sample import dd_deterministic_sample

    return dd_deterministic_sample(
        "doc_id, lang", "documents", "doc_id", rate_bps,
        strata_col="lang", strata_bps=strata_bps,
    )


def q_url_normalize(copies: int, page_res: int) -> str:
    """Oracle for text.url_normalize over deterministic messy variants
    of the pages URLs (upper-cased scheme+host, fragments, default
    ports, bare hosts) keyed by page_key % 4 — the same variant
    formulas as the Spark side."""
    from .text import dd_domain_of, dd_url_normalize

    dom = dd_domain_of("url")
    raw = f"""(CASE page_key % 4
        WHEN 0 THEN 'HTTPS://' || upper({dom}) || '/CasePath'
        WHEN 1 THEN url || '#frag'
        WHEN 2 THEN 'https://' || {dom} || ':443/p'
        ELSE 'https://' || {dom}
    END)"""
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)})
        SELECT page_key, {dd_url_normalize(raw)} AS norm_url
        FROM pages
    """


def q_top_ngrams(n: int, k: int) -> str:
    from .text import dd_top_ngrams

    return dd_top_ngrams(n, k)


def q_ann_in_region(
    regions: dict, region_res: int, copies: int, page_res: int,
    region: str, k: int, n_queries: int,
) -> str:
    """Oracle for the spatial × similarity composite: corpus = vectors
    of documents with ≥1 page inside ``region``; exact cosine top-k
    with the same round+tie-break ranking as the engine."""
    rc = dd_region_cells_cte(regions, region_res)
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        rcells AS ({rc}),
        docs_in AS (
            SELECT DISTINCT (p.page_key // {copies}) AS vec_id
            FROM pages p
            JOIN rcells r ON r.cell = {synth.dd_to_parent('p.cell', region_res)}
            WHERE r.region = '{region}'
        ),
        corpus AS (
            SELECT e.* FROM embeddings e
            WHERE e.vec_id IN (SELECT vec_id FROM docs_in)
        ),
        q AS (
            SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < {n_queries}
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   ROUND(
                     list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))),
                     6
                   ) AS sim
            FROM corpus c, q
        )
        SELECT query_id, rank, vec_id FROM (
            SELECT query_id, vec_id, sim,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def q_distance_join(radius: float, copies: int, page_res: int = 12) -> str:
    """Brute-force twin of geo.distance_join (sq metric): a plain
    cross-join + filter, deliberately INDEPENDENT of the engine's grid
    stencil so it checks the candidate cover, not just the refine.
    The squared-distance expression mirrors geo.sq_dist's association
    order (lat term first) for bit-equal doubles."""
    alat, alon = synth.dd_latlon_from_key("(n_nationkey * 7919 + 13)")
    r2 = repr(float(radius) * float(radius))
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        anchors AS (
            SELECT n_nationkey AS anchor_id, {alat} AS alat, {alon} AS alon
            FROM nation
        )
        SELECT a.anchor_id, p.page_key,
               (a.alat - p.lat) * (a.alat - p.lat)
             + (a.alon - p.lon) * (a.alon - p.lon) AS dist
        FROM anchors a, pages p
        WHERE (a.alat - p.lat) * (a.alat - p.lat)
            + (a.alon - p.lon) * (a.alon - p.lon) <= {r2}
    """


def q_distance_join_wrap(radius: float, copies: int, page_res: int = 12) -> str:
    """Brute-force twin of geo.distance_join(wrap_lon=True): cross join
    + the WRAPPED sq metric (Δlon the short way around ±180°), with
    seam-straddling anchors derived from nation keys.  Mirrors
    geo.sq_dist_wrapped's association order (lat term first; least of
    |Δlon| and 360−|Δlon|)."""
    alat, _ = synth.dd_latlon_from_key("(n_nationkey * 7919 + 13)")
    alon = synth.dd_anchor_wrap_lon("n_nationkey")
    r2 = repr(float(radius) * float(radius))
    dx = "LEAST(ABS(a.alon - p.lon), 360.0 - ABS(a.alon - p.lon))"
    d = f"(a.alat - p.lat) * (a.alat - p.lat) + {dx} * {dx}"
    return f"""
        WITH pages AS ({dd_pages_cte(copies, page_res)}),
        anchors AS (
            SELECT n_nationkey AS anchor_id, {alat} AS alat, {alon} AS alon
            FROM nation
        )
        SELECT a.anchor_id, p.page_key, {d} AS dist
        FROM anchors a, pages p
        WHERE {d} <= {r2}
    """


def q_asof_events(tolerance_hours: int) -> str:
    """Independent DuckDB twin of temporal.asof_join over events:
    nested-loop LEFT JOIN + QUALIFY row_number picks the same latest
    build row the running-last window does (ties: ts DESC, event_id
    DESC == the window's ascending (ts, ord) last)."""
    return f"""
        WITH probes AS (SELECT * FROM events WHERE event_type = 'purchase'),
        build AS (SELECT * FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
               epoch_us(b.ts) AS ts_m_us, b.event_id AS event_id_m,
               b.value AS value_m
        FROM probes p LEFT JOIN build b
          ON b.user_id = p.user_id AND b.ts <= p.ts
         AND b.ts >= p.ts - INTERVAL {tolerance_hours} HOUR
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY p.event_id
            ORDER BY b.ts DESC NULLS LAST, b.event_id DESC NULLS LAST
        ) = 1
    """


def q_range_events() -> str:
    """Independent DuckDB twin of temporal.range_join: plain cross join
    + half-open interval predicate (no chunking)."""
    from .temporal import dd_intervals_cte

    return f"""
        WITH iv AS ({dd_intervals_cte()})
        SELECT i.window_id, e.event_id, epoch_us(e.ts) AS ts_us
        FROM iv i, events e
        WHERE i.start_ts <= e.ts AND e.ts < i.end_ts
    """
