"""Geometry layer: point→cell encoding, point-in-polygon, polyfill, kNN.

The reference consumes real H3 geometry through dev-dependencies (h3o /
h3ron polyfills and ``latlng_to_cell`` — /root/reference/tests/tests.rs:39-41,
/root/reference/src/iteration.rs:349-371); the engine itself is geometry-
agnostic bit math.  We keep that separation:

* ``H3Encoder`` — uses the real ``h3`` python library when importable
  (vectorized int API inside pandas UDFs).  Not bundled in this sandbox.
* ``GridEncoder`` — a deterministic, pure-arithmetic hierarchical
  encoder producing valid H3 *bit layouts* from (lat, lon): an 11×11
  base-cell grid, then alternating-axis 7-ary refinement
  (``digit_i = floor(coord * 7^k) mod 7``).  Children nest exactly
  inside parents, so every engine operator (compaction, containment,
  tiling) behaves identically to real H3 — and every formula has a
  DuckDB-SQL twin for the correctness oracle.

Everything is native Column expressions — no UDF in the encode path.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cells as cx
from . import constants as K

try:  # pragma: no cover - not available in this sandbox
    import h3 as _h3  # noqa: F401

    HAS_H3 = True
except Exception:  # pragma: no cover
    HAS_H3 = False


# ---------------------------------------------------------------------------
# GridEncoder: (lat, lon) -> cell, native Column exprs
# ---------------------------------------------------------------------------

GRID_DIM = 11  # 11*11 = 121 base cells (base 121 unused)


def _axis_digit(norm: Column, k: int) -> Column:
    """k-th 7-ary digit of a [0,1) coordinate: floor(x*7^k) mod 7."""
    return (F.floor(norm * F.lit(float(7**k))) % 7).cast("long")


def grid_encode(lat: Column, lon: Column, res: int) -> Column:
    """Encode a point to a res-``res`` cell (valid H3 bit layout).

    Level i refines longitude for odd i, latitude for even i; the
    nesting invariant ``to_parent(encode(p, r2), r1) == encode(p, r1)``
    holds for all r1 <= r2 by construction.
    """
    x = (lon + 180.0) / 360.0
    y = (lat + 90.0) / 180.0
    # clamp the open upper edge
    x = F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0 - 1e-12))
    y = F.least(F.greatest(y, F.lit(0.0)), F.lit(1.0 - 1e-12))
    base = (
        F.floor(y * GRID_DIM).cast("long") * GRID_DIM + F.floor(x * GRID_DIM).cast("long")
    )
    # refine within the base square
    bx = x * GRID_DIM - F.floor(x * GRID_DIM)
    by = y * GRID_DIM - F.floor(y * GRID_DIM)
    digits = F.lit(K.trailing_mask(res)).cast("long")
    for i in range(1, res + 1):
        k = (i + 1) // 2
        d = _axis_digit(bx if i % 2 == 1 else by, k)
        digits = digits + d * F.lit(1 << ((K.MAX_RES - i) * K.DIGIT_BITS))
    return cx.make_cell(base, F.lit(res).cast("long"), digits)


def dd_grid_encode(lat: str, lon: str, res: int) -> str:
    """DuckDB SQL twin of :func:`grid_encode`."""
    x = f"LEAST(GREATEST((({lon}) + 180.0) / 360.0, 0.0), 1.0 - 1e-12)"
    y = f"LEAST(GREATEST((({lat}) + 90.0) / 180.0, 0.0), 1.0 - 1e-12)"
    base = f"(CAST(FLOOR(({y}) * {GRID_DIM}) AS BIGINT) * {GRID_DIM} + CAST(FLOOR(({x}) * {GRID_DIM}) AS BIGINT))"
    bx = f"(({x}) * {GRID_DIM} - FLOOR(({x}) * {GRID_DIM}))"
    by = f"(({y}) * {GRID_DIM} - FLOOR(({y}) * {GRID_DIM}))"
    terms = [str(K.trailing_mask(res))]
    for i in range(1, res + 1):
        k = (i + 1) // 2
        c = bx if i % 2 == 1 else by
        terms.append(
            f"((CAST(FLOOR({c} * {float(7 ** k)}) AS BIGINT) % 7) * {1 << ((K.MAX_RES - i) * K.DIGIT_BITS)})"
        )
    digits = " + ".join(terms)
    return (
        f"({K.MODE_CELL << K.MODE_OFFSET} + ({base} * {1 << K.BASE_OFFSET})"
        f" + {res << K.RES_OFFSET} + ({digits}))"
    )


def grid_encode_np(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """numpy twin (for UDF-internal use and tests)."""
    x = np.clip((lon + 180.0) / 360.0, 0.0, 1.0 - 1e-12)
    y = np.clip((lat + 90.0) / 180.0, 0.0, 1.0 - 1e-12)
    base = np.floor(y * GRID_DIM).astype(np.int64) * GRID_DIM + np.floor(
        x * GRID_DIM
    ).astype(np.int64)
    bx = x * GRID_DIM - np.floor(x * GRID_DIM)
    by = y * GRID_DIM - np.floor(y * GRID_DIM)
    digits = np.full(len(x), K.trailing_mask(res), dtype=np.int64)
    for i in range(1, res + 1):
        k = (i + 1) // 2
        c = bx if i % 2 == 1 else by
        d = (np.floor(c * float(7**k)) % 7).astype(np.int64)
        digits += d << ((K.MAX_RES - i) * K.DIGIT_BITS)
    return (
        np.int64(K.MODE_CELL << K.MODE_OFFSET)
        + (np.int64(res) << K.RES_OFFSET)
        + (base << K.BASE_OFFSET)
        + digits
    )


def grid_cell_center(cell: int) -> tuple[float, float]:
    """Driver-side inverse: center (lat, lon) of a grid-encoded cell."""
    res = (cell >> K.RES_OFFSET) & 0xF
    base = (cell >> K.BASE_OFFSET) & 0x7F
    y0, x0 = (base // GRID_DIM) / GRID_DIM, (base % GRID_DIM) / GRID_DIM
    wx, wy = 1.0 / GRID_DIM, 1.0 / GRID_DIM
    bx = by = 0.0
    sx = sy = 1.0
    for i in range(1, res + 1):
        d = (cell >> ((K.MAX_RES - i) * K.DIGIT_BITS)) & 0x7
        if i % 2 == 1:
            sx /= 7.0
            bx += d * sx
        else:
            sy /= 7.0
            by += d * sy
    cx_ = x0 + (bx + sx / 2.0) * wx
    cy_ = y0 + (by + sy / 2.0) * wy
    return cy_ * 180.0 - 90.0, cx_ * 360.0 - 180.0


# ---------------------------------------------------------------------------
# polyfill (vector polygon -> covered cell set), ContainsCentroid mode
# ---------------------------------------------------------------------------

def point_in_polygon_np(
    lat: np.ndarray, lon: np.ndarray, polygon: Sequence[tuple[float, float]]
) -> np.ndarray:
    """Vectorized ray-casting PIP; ``polygon`` is [(lat, lon), ...]."""
    inside = np.zeros(len(lat), dtype=bool)
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lon < xint)
    return inside


def pip_sql_predicate(
    lat: str, lon: str, polygon: Sequence[tuple[float, float]], flit=repr
) -> str:
    """SQL twin of :func:`point_in_polygon_np` — an odd/even sum of
    edge-crossing indicators, one term per edge.  ``flit`` formats the
    float literals: default ``repr`` (DuckDB parses bare decimals as
    DOUBLE); pass :func:`_spark_flit` for Spark SQL, whose bare
    decimals are DECIMAL and would change arithmetic."""
    n = len(polygon)
    terms = []
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses
        xint = (
            f"(({flit(x2)} - {flit(x1)}) * (({lat}) - {flit(y1)})"
            f" / ({flit(y2)} - {flit(y1)}) + {flit(x1)})"
        )
        cross = (
            f"((({flit(y1)} > ({lat})) <> ({flit(y2)} > ({lat})))"
            f" AND (({lon}) < {xint}))"
        )
        terms.append(f"(CASE WHEN {cross} THEN 1 ELSE 0 END)")
    return f"((({' + '.join(terms)}) % 2) = 1)"


def _spark_flit(v: float) -> str:
    """Spark-SQL double literal (``1.5D``) — bare ``1.5`` is DECIMAL."""
    return f"{float(v)!r}D"


def _segment_intersects_rect_sql(
    x1: float, y1: float, x2: float, y2: float,
    xmin: str, xmax: str, ymin: str, ymax: str,
    flit=_spark_flit,
) -> str:
    """SQL-string twin of :func:`_segment_intersects_rect` (same
    Liang-Barsky terms, sign branches resolved in Python)."""
    dx, dy = x2 - x1, y2 - y1
    enters = ["0.0D" if flit is _spark_flit else "0.0"]
    exits = ["1.0D" if flit is _spark_flit else "1.0"]
    par = []
    if dx == 0:
        par.append(f"(({flit(x1)} >= {xmin}) AND ({flit(x1)} <= {xmax}))")
    else:
        t1 = f"(({xmin} - {flit(x1)}) / {flit(dx)})"
        t2 = f"(({xmax} - {flit(x1)}) / {flit(dx)})"
        if dx < 0:
            t1, t2 = t2, t1
        enters.append(t1)
        exits.append(t2)
    if dy == 0:
        par.append(f"(({flit(y1)} >= {ymin}) AND ({flit(y1)} <= {ymax}))")
    else:
        t1 = f"(({ymin} - {flit(y1)}) / {flit(dy)})"
        t2 = f"(({ymax} - {flit(y1)}) / {flit(dy)})"
        if dy < 0:
            t1, t2 = t2, t1
        enters.append(t1)
        exits.append(t2)
    hit = (
        f"(GREATEST({', '.join(enters)}) <= LEAST({', '.join(exits)}))"
        if len(enters) > 1
        else "TRUE"
    )
    for c in par:
        hit = f"({hit} AND {c})"
    return hit


def _polygon_crosses_rect_sql(
    polygon: Sequence[tuple[float, float]],
    xmin: str, xmax: str, ymin: str, ymax: str,
    flit=_spark_flit,
) -> str:
    """SQL-string twin of :func:`_polygon_crosses_rect`."""
    n = len(polygon)
    parts = []
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        parts.append(
            _segment_intersects_rect_sql(
                x1, y1, x2, y2, xmin, xmax, ymin, ymax, flit
            )
        )
    return "(" + " OR ".join(parts) + ")"


def pip_column(lat: Column, lon: Column, polygon: Sequence[tuple[float, float]]) -> Column:
    """Native Column PIP predicate (same edge terms, no UDF)."""
    n = len(polygon)
    acc = F.lit(0)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        xint = (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1)) / (F.lit(y2) - F.lit(y1)) + F.lit(x1)
        cross = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (lon < xint)
        acc = acc + F.when(cross, 1).otherwise(0)
    return (acc % 2) == 1


def polyfill_grid(
    polygon: Sequence[tuple[float, float]], res: int
) -> tuple[float, float, float, float, int, int]:
    """Centroid-lattice derivation shared by :func:`polyfill`, the
    hierarchical variant's coarse start, and the DuckDB oracle twin
    (hexspark.oracles.dd_polyfill_cte) — ONE source of truth for grid
    pitch, bbox snap, and extent, so the two engines cannot drift.
    Returns (px, py, lat0, lon0, nx, ny)."""
    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    # grid pitch at res: x-axis refined ceil(res/2) times, y floor(res/2)
    px = 360.0 / (GRID_DIM * 7 ** ((res + 1) // 2))
    py = 180.0 / (GRID_DIM * 7 ** (res // 2))
    lat0 = math.floor((min(lats) + 90.0) / py) * py - 90.0
    lon0 = math.floor((min(lons) + 180.0) / px) * px - 180.0
    ny = int(math.ceil((max(lats) - lat0) / py)) + 1
    nx = int(math.ceil((max(lons) - lon0) / px)) + 1
    return px, py, lat0, lon0, nx, ny


def polyfill(
    spark,
    polygon: Sequence[tuple[float, float]],
    res: int,
    flat_budget: int = 65536,
    holes: "Sequence[Sequence[tuple[float, float]]] | None" = None,
) -> DataFrame:
    """Vector→raster: all res-``res`` grid cells whose centroid lies in
    the polygon (the reference tests use ContainsCentroid polyfill via
    h3o, /root/reference/src/iteration.rs:349-371 — which also honors
    interior rings, matched here by ``holes``).

    Strategy: enumerate candidate cell centers over the polygon's
    bounding box at the res-``res`` grid pitch *as a DataFrame range*
    (distributed, no driver materialization), PIP-filter, encode.
    When the bbox enumeration would exceed ``flat_budget`` candidates
    (fine res over a large polygon), dispatch to the coarse-to-fine
    :func:`polyfill_hier`, whose cost is bounded by boundary length
    instead of area — same output set (tested).

    ``holes``: interior rings (same (lat, lon) vertex convention).  The
    fill is exterior-fill minus each hole's own ContainsCentroid fill —
    exact at the cell level because :func:`polyfill_grid` snaps every
    bbox to the same global lattice, so a centroid inside a hole
    encodes to the identical cell id in both fills.  Boundary cells
    follow the same crossing-rule tie-break as the exterior ring."""
    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    px, py, lat0, lon0, nx, ny = polyfill_grid(polygon, res)
    if ((max(lats) - min(lats)) / py + 2) * ((max(lons) - min(lons)) / px + 2) > flat_budget:
        ext = polyfill_hier(spark, polygon, res)
    else:
        grid = (
            spark.range(ny * nx)
            .select(
                (F.lit(lat0) + (F.floor(F.col("id") / nx) + 0.5) * py).alias("lat"),
                (F.lit(lon0) + (F.col("id") % nx + 0.5) * px).alias("lon"),
            )
        )
        ext = (
            grid.filter(pip_column(F.col("lat"), F.col("lon"), polygon))
            .select(grid_encode(F.col("lat"), F.col("lon"), res).alias("cell"))
            .distinct()
        )
    for hole in holes or ():
        # holes are boundary-scale relative to the exterior: anti-join
        # them out (AQE broadcasts the small side on its own estimate)
        ext = ext.join(
            polyfill(spark, hole, res, flat_budget), "cell", "left_anti"
        )
    return ext


def polyfill_np(
    polygon: "Sequence[tuple[float, float]]",
    res: int,
    flat_budget: int = 4_000_000,
    holes: "Sequence[Sequence[tuple[float, float]]] | None" = None,
) -> "np.ndarray":
    """Driver-side numpy :func:`polyfill` (same ContainsCentroid rule,
    same :func:`polyfill_grid` lattice — identical output, tested):
    enumerate bbox centers, vectorized PIP, encode.  For broadcast-
    scale polygon collections (a GeoJSON region file) this turns
    one-Spark-job-per-polygon into microseconds per polygon; callers
    must keep it off corpus-scale paths.  Raises when the bbox
    enumeration exceeds ``flat_budget`` candidates — fall back to the
    distributed :func:`polyfill` for continent-at-fine-res shapes.

    ``holes``: interior rings — exterior fill minus each hole's fill
    (exact at the cell level; the shared global lattice makes the two
    fills encode identical cell ids — see :func:`polyfill`)."""
    px, py, lat0, lon0, nx, ny = polyfill_grid(polygon, res)
    if nx * ny > flat_budget:
        raise ValueError(
            f"polyfill_np: {nx * ny} candidate centers exceed "
            f"flat_budget={flat_budget}; use the distributed polyfill"
        )
    ii = np.arange(nx * ny, dtype=np.int64)
    lat = lat0 + (ii // nx + 0.5) * py
    lon = lon0 + (ii % nx + 0.5) * px
    keep = point_in_polygon_np(lat, lon, polygon)
    cells = np.unique(grid_encode_np(lat[keep], lon[keep], res))
    for hole in holes or ():
        cells = np.setdiff1d(
            cells, polyfill_np(hole, res, flat_budget), assume_unique=True
        )
    return cells


def _segment_intersects_rect(
    x1: float, y1: float, x2: float, y2: float,
    xmin: Column, xmax: Column, ymin: Column, ymax: Column,
) -> Column:
    """Liang-Barsky: does the literal segment (x1,y1)→(x2,y2) intersect
    the per-row axis-aligned rectangle?  The segment endpoints are plan
    literals (polygon edges), so the sign branches resolve in Python
    and the Column expression is pure min/max/compare arithmetic.
    Segments fully inside the rectangle intersect (clip non-empty)."""
    dx, dy = x2 - x1, y2 - y1
    enters = [F.lit(0.0)]
    exits = [F.lit(1.0)]
    parallel_ok = []
    if dx == 0:
        parallel_ok.append((F.lit(x1) >= xmin) & (F.lit(x1) <= xmax))
    else:
        t1 = (xmin - F.lit(x1)) / F.lit(dx)
        t2 = (xmax - F.lit(x1)) / F.lit(dx)
        if dx < 0:
            t1, t2 = t2, t1
        enters.append(t1)
        exits.append(t2)
    if dy == 0:
        parallel_ok.append((F.lit(y1) >= ymin) & (F.lit(y1) <= ymax))
    else:
        t1 = (ymin - F.lit(y1)) / F.lit(dy)
        t2 = (ymax - F.lit(y1)) / F.lit(dy)
        if dy < 0:
            t1, t2 = t2, t1
        enters.append(t1)
        exits.append(t2)
    hit = F.greatest(*enters) <= F.least(*exits) if len(enters) > 1 else F.lit(True)
    for c in parallel_ok:
        hit = hit & c
    return hit


def _polygon_crosses_rect(
    polygon: Sequence[tuple[float, float]],
    xmin: Column, xmax: Column, ymin: Column, ymax: Column,
) -> Column:
    """OR of edge-rectangle intersections over the polygon's (literal)
    edges — true iff the polygon boundary touches the rectangle."""
    hit = F.lit(False)
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        hit = hit | _segment_intersects_rect(x1, y1, x2, y2, xmin, xmax, ymin, ymax)
    return hit


def _cell_rect_df(cur: DataFrame, res: int) -> tuple[DataFrame, float, float]:
    """Project the cell rectangle's (xmin, ymin) ONCE per level and
    persist — a plan barrier.  Without it every corner-PIP / edge-
    crossing reference re-inlines the whole ``cell_to_ij`` subtree
    (Catalyst's CollapseProject duplicates it ~30×) and the classify
    step costs ~20s of analysis/codegen per level on 7k rows.  (An
    eager ``localCheckpoint`` barrier was measured 2× slower end-to-end:
    per-level jobs pay codegen serially instead of inside one action.)

    The persists are registered with ``_POLYFILL_POOL`` — each
    polyfill call retires the blocks of two calls ago, so long-running
    drivers don't accumulate caches for the session lifetime."""
    xl, yl = _axis_levels(res)
    px = 360.0 / (GRID_DIM * 7**xl)
    py = 180.0 / (GRID_DIM * 7**yl)
    i, j = cell_to_ij(F.col("cell"), res)
    rect = _POLYFILL_POOL.add(cur.select(
        "cell",
        (F.lit(-180.0) + i * px).alias("__xmin"),
        (F.lit(-90.0) + j * py).alias("__ymin"),
    ).persist())
    return rect, px, py


from .cachepool import CachePool

_POLYFILL_POOL = CachePool()
_KNN_RINGS_POOL = CachePool()


def polyfill_hier(
    spark,
    polygon: Sequence[tuple[float, float]],
    res: int,
    coarse_budget: int = 4096,
) -> DataFrame:
    """Coarse-to-fine polyfill — identical output to the flat
    :func:`polyfill` but candidates bounded by *boundary length*, not
    bbox area: a res-12 continent never enumerates ~10^12 centers.

    Per level: a candidate cell whose rectangle lies fully inside the
    polygon (all 4 corners inside, no polygon edge intersects — exact,
    Liang-Barsky over literal edges) is emitted as a whole subtree;
    fully-outside rectangles prune; only *boundary* cells refine to
    their 7 children.  At the target res, boundary cells take the
    ContainsCentroid test.  Inside-subtrees uncompact to ``res`` at the
    end (the descendants' centroids are inside by rectangle
    containment, so the set equals the flat enumeration — tested)."""
    from . import build as bx

    _POLYFILL_POOL.new_generation()

    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    # coarsest start res whose bbox enumeration fits the budget
    r0 = res
    for r in range(res + 1):
        xl, yl = _axis_levels(r)
        px = 360.0 / (GRID_DIM * 7**xl)
        py = 180.0 / (GRID_DIM * 7**yl)
        nx = int(math.ceil((max(lons) - min(lons)) / px)) + 2
        ny = int(math.ceil((max(lats) - min(lats)) / py)) + 2
        if nx * ny > coarse_budget:
            r0 = max(r - 1, 0)
            break
    else:
        r0 = res
    # bbox candidates at r0 (tiny by construction)
    xl, yl = _axis_levels(r0)
    px = 360.0 / (GRID_DIM * 7**xl)
    py = 180.0 / (GRID_DIM * 7**yl)
    lat0 = math.floor((min(lats) + 90.0) / py) * py - 90.0
    lon0 = math.floor((min(lons) + 180.0) / px) * px - 180.0
    ny = int(math.ceil((max(lats) - lat0) / py)) + 1
    nx = int(math.ceil((max(lons) - lon0) / px)) + 1
    cur = (
        spark.range(ny * nx)
        .select(
            (F.lit(lat0) + (F.floor(F.col("id") / nx) + 0.5) * py).alias("lat"),
            (F.lit(lon0) + (F.col("id") % nx + 0.5) * px).alias("lon"),
        )
        .select(grid_encode(F.col("lat"), F.col("lon"), r0).alias("cell"))
        .distinct()
    )
    inside_acc: list[DataFrame] = []
    for r in range(r0, res):
        rect, px, py = _cell_rect_df(cur, r)
        # whole classify step as TWO F.expr SQL strings: building the
        # 4 corner-PIPs + Liang-Barsky per edge as Column ops costs
        # thousands of py4j round trips per level (pure driver-side
        # plan-construction latency); the SQL string parses JVM-side
        # in one call with identical arithmetic (D-suffixed doubles)
        xmin, ymin = "(__xmin)", "(__ymin)"
        xmax = f"((__xmin) + {_spark_flit(px)})"
        ymax = f"((__ymin) + {_spark_flit(py)})"
        corners = " + ".join(
            f"(CASE WHEN {pip_sql_predicate(la, lo, polygon, _spark_flit)}"
            " THEN 1 ELSE 0 END)"
            for la, lo in [(ymin, xmin), (ymin, xmax), (ymax, xmin), (ymax, xmax)]
        )
        crossed = _polygon_crosses_rect_sql(polygon, xmin, xmax, ymin, ymax)
        tagged = _POLYFILL_POOL.add(rect.select(
            "cell",
            F.expr(f"((({corners}) = 4) AND NOT {crossed})").alias("__in"),
            F.expr(f"((({corners}) = 0) AND NOT {crossed})").alias("__out"),
        ).persist())
        inside_acc.append(tagged.filter(F.col("__in")).select("cell"))
        boundary = tagged.filter(~F.col("__in") & ~F.col("__out")).select("cell")
        cur = bx.uncompact_df(boundary, r + 1, min_res=r)
    # target res: boundary cells take the centroid test
    rect, px, py = _cell_rect_df(cur, res)
    centroid_in = F.expr(pip_sql_predicate(
        f"((__ymin) + {_spark_flit(py / 2.0)})",
        f"((__xmin) + {_spark_flit(px / 2.0)})",
        polygon,
        _spark_flit,
    ))
    out = rect.filter(centroid_in).select("cell")
    if inside_acc:
        # union the mixed-res inside subtrees and expand them in ONE
        # uncompact chain (uncompact_df handles mixed resolutions) —
        # one chain instead of one per level keeps the plan shallow
        inside = inside_acc[0]
        for ins in inside_acc[1:]:
            inside = inside.unionByName(ins)
        out = out.unionByName(bx.uncompact_df(inside, res, min_res=r0))
    return out.distinct()


# ---------------------------------------------------------------------------
# real-H3 encoder (gated on the h3 python lib; production geometry path)
# ---------------------------------------------------------------------------

def _h3_encode_batch(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """One Arrow batch through real-H3 ``latlng_to_cell``.

    Prefers the broadcasting numpy-int API (one C call per batch);
    builds whose ``latlng_to_cell`` is scalar-only raise TypeError on
    array input and fall back to a per-element loop *inside the batch*
    (still amortized by Arrow transfer).  Returns int64 cells (the
    engine's sign-safe representation — H3 indexes never set bit 63)."""
    from h3.api import numpy_int as h3n

    try:
        cells = h3n.latlng_to_cell(lat, lon, res)
    except TypeError:  # scalar-only build
        cells = np.array(
            [h3n.latlng_to_cell(float(a), float(b), res) for a, b in zip(lat, lon)],
            dtype=np.uint64,
        )
    return np.asarray(cells, dtype=np.uint64).astype(np.int64)


def h3_encode_udf(res: int):
    """Vectorized real-H3 ``latlng_to_cell`` pandas UDF (J5) — the
    production encoder when the ``h3`` lib is installed (the reference
    consumes the same geometry via h3o dev-deps,
    /root/reference/tests/tests.rs:39-41).  The batch kernel is
    :func:`_h3_encode_batch`; this sandbox has no real ``h3``, so tests
    execute the path through a deterministic shim package
    (tests/fake_libs/h3) and the GridEncoder covers the pipeline."""
    if not HAS_H3:
        raise ImportError("h3 python library not available; use grid_encode")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _enc(lat, lon):
        return pd.Series(_h3_encode_batch(lat.to_numpy(), lon.to_numpy(), res))

    return _enc


# ---------------------------------------------------------------------------
# lattice coordinates / k-ring (grid_disk)
# ---------------------------------------------------------------------------

def _axis_levels(res: int) -> tuple[int, int]:
    """(x_levels, y_levels) consumed by a res-``res`` grid cell."""
    return (res + 1) // 2, res // 2


def cell_to_ij_np(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode grid cells to global integer lattice coords (i=x, j=y).

    All cells must share one resolution.  The lattice at res r is
    (GRID_DIM*7^xl) × (GRID_DIM*7^yl)."""
    from . import cells_np as cnp

    res = int(cnp.res(cells[:1])[0])
    xl, yl = _axis_levels(res)
    base = cnp.base_cell(cells)
    bi = (base % GRID_DIM).astype(np.int64)
    bj = (base // GRID_DIM).astype(np.int64)
    i = bi
    j = bj
    xi_seen = yi_seen = 0
    for lvl in range(1, res + 1):
        d = cnp.digit(cells, lvl)
        if lvl % 2 == 1:
            i = i * 7 + d
            xi_seen += 1
        else:
            j = j * 7 + d
            yi_seen += 1
    return i, j, np.full(len(cells), res, dtype=np.int64)


def ij_to_cell_np(i: np.ndarray, j: np.ndarray, res: int) -> np.ndarray:
    """Inverse of :func:`cell_to_ij_np` (same digit interleaving)."""
    from . import cells_np as cnp
    from . import constants as K2

    xl, yl = _axis_levels(res)
    # peel digits back off in reverse level order
    xd: list[np.ndarray] = []
    yd: list[np.ndarray] = []
    ii, jj = i.copy(), j.copy()
    for lvl in range(res, 0, -1):
        if lvl % 2 == 1:
            xd.append(ii % 7)
            ii //= 7
        else:
            yd.append(jj % 7)
            jj //= 7
    base = jj * GRID_DIM + ii
    digits = np.full(len(i), K2.trailing_mask(res), dtype=np.int64)
    xd.reverse()
    yd.reverse()
    xi = yi = 0
    for lvl in range(1, res + 1):
        d = xd[xi] if lvl % 2 == 1 else yd[yi]
        if lvl % 2 == 1:
            xi += 1
        else:
            yi += 1
        digits += d.astype(np.int64) << ((K2.MAX_RES - lvl) * K2.DIGIT_BITS)
    return cnp.make_cell(base, np.full(len(i), res, dtype=np.int64), digits)


def grid_disk_np(cell: int, k: int) -> np.ndarray:
    """All cells within lattice Chebyshev distance ``k`` of ``cell`` —
    the engine's ``grid_disk``/k-ring (the reference consumes h3's via
    dev-deps; ours is exact on the grid-encoder lattice)."""
    from . import cells_np as cnp

    c = np.array([cell], dtype=np.int64)
    res = int(cnp.res(c)[0])
    xl, yl = _axis_levels(res)
    ni = GRID_DIM * 7**xl
    nj = GRID_DIM * 7**yl
    i0, j0, _ = cell_to_ij_np(c)
    di, dj = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    i = i0[0] + di.ravel()
    j = j0[0] + dj.ravel()
    ok = (i >= 0) & (i < ni) & (j >= 0) & (j < nj)
    return ij_to_cell_np(i[ok], j[ok], res)


def grid_ring_distance_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lattice Chebyshev distance between same-res cells (the k-ring
    index that would first include the other cell)."""
    ia, ja, _ = cell_to_ij_np(a)
    ib, jb, _ = cell_to_ij_np(b)
    return np.maximum(np.abs(ia - ib), np.abs(ja - jb))


def ij_to_cell(i: Column, j: Column, res: int) -> Column:
    """Native-Column inverse of :func:`cell_to_ij`: lattice coords →
    res-``res`` grid cell (same alternating digit interleave as
    :func:`ij_to_cell_np`).  Literal-res only."""
    xl, yl = _axis_levels(res)
    bi = F.floor(i / F.lit(float(7**xl))).cast("long")
    bj = F.floor(j / F.lit(float(7**yl))).cast("long")
    base = bj * GRID_DIM + bi
    digits = F.lit(K.trailing_mask(res)).cast("long")
    xi = yi = 0
    for lvl in range(1, res + 1):
        if lvl % 2 == 1:
            xi += 1
            d = (F.floor(i / F.lit(float(7 ** (xl - xi)))) % 7).cast("long")
        else:
            yi += 1
            d = (F.floor(j / F.lit(float(7 ** (yl - yi)))) % 7).cast("long")
        digits = digits + d * F.lit(1 << ((K.MAX_RES - lvl) * K.DIGIT_BITS))
    return cx.make_cell(base, F.lit(res).cast("long"), digits)


def _ring_disk(
    probes: DataFrame, probe_col: str, cell_col: str, res: int, radius: int
) -> DataFrame:
    """(probe, cell, ring) relation: every lattice cell within Chebyshev
    distance ``radius`` of each probe, generated Spark-side — decode
    each probe to lattice coords (native Columns), cross the ±radius
    offset sequences, re-encode.  No driver loop, so a probe *table*
    works."""
    xl, yl = _axis_levels(res)
    ni, nj = GRID_DIM * 7**xl, GRID_DIM * 7**yl
    pi, pj = cell_to_ij(F.col(probe_col), res)
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    return (
        probes.select(probe_col, pi.alias("__pi"), pj.alias("__pj"))
        .withColumn("__di", F.explode(offs))
        .withColumn("__dj", F.explode(offs))
        .select(
            F.col(probe_col),
            (F.col("__pi") + F.col("__di")).alias("__i"),
            (F.col("__pj") + F.col("__dj")).alias("__j"),
            F.greatest(F.abs("__di"), F.abs("__dj")).cast("long").alias("ring"),
        )
        .filter(
            (F.col("__i") >= 0) & (F.col("__i") < ni)
            & (F.col("__j") >= 0) & (F.col("__j") < nj)
        )
        .select(
            probe_col,
            ij_to_cell(F.col("__i"), F.col("__j"), res).alias(cell_col),
            "ring",
        )
    )


def knn_rings(
    stored: DataFrame,
    probes,
    k: int,
    max_ring: int = 8,
    cell_col: str = "cell",
    probe_col: str = "probe",
    res: Optional[int] = None,
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """J7 kNN, reference recipe: expand each probe's k-ring disks, join
    against the stored cell set, rank by ring then cell.

    Exact for ring-metric kNN whenever k neighbors exist within
    ``max_ring`` (widen otherwise).  ``probes`` is a DataFrame with a
    ``probe_col`` cell column (a python list of cells is accepted and
    wrapped; duplicate probe rows duplicate their candidates — dedupe
    the probe table first, join semantics like the batch ``get``).
    The final per-probe rank is always the two-phase top-k
    (hexspark.topk) — no global per-probe window sort.

    The disk relation is probes × (2R+1)² rows, so its physical form is
    chosen by size (mirrors ``join.get_auto``'s measured-form-chooser):

    * small (≤ ``broadcast_rows``): ONE pass — broadcast the full-radius
      disk relation; the stored side (the big table) never shuffles.
      This is the reference's shape (a handful of probes).
    * large (a probe *table* × a wide ``max_ring``): iterative
      **ring-doubling** — start at the widest radius whose disk still
      fits the broadcast budget, keep only probes that found < k
      neighbors, double the radius, repeat.  Each round's disk stays
      bounded; most probes resolve in the first round (k hits inside a
      small disk finalize the top-k: any cell beyond radius R ranks
      below R in-disk hits).  A round whose shrunken probe set still
      exceeds the budget falls back to a shuffle equi-join on the cell
      key for that round — never an unbounded broadcast.
    """
    from .topk import topk_per_key

    spark = stored.sparkSession
    if isinstance(probes, (list, tuple)):
        probes = spark.createDataFrame(
            [(int(p),) for p in probes], f"{probe_col}: long"
        )
    stats = probes.agg(
        F.count("*").alias("n"),
        F.collect_set(cx.res(probe_col)).alias("rs"),
    ).first()
    n_probes = int(stats["n"])
    res_set = sorted(int(r) for r in stats["rs"])
    if n_probes == 0:
        # empty probe table: empty result with the contract schema
        return probes.select(
            F.col(probe_col),
            F.lit(0).cast("long").alias("rank"),
            F.col(probe_col).alias(cell_col),
            F.lit(0).cast("long").alias("ring"),
        )
    if len(res_set) > 1:
        raise ValueError(
            f"knn_rings: mixed probe resolutions {res_set} — ring lattices"
            " are per-resolution; split the probe table by res() first"
        )
    if res is None:
        res = res_set[0]
    elif res_set != [res]:
        raise ValueError(
            f"knn_rings: probe resolutions {res_set} != declared res {res}"
        )

    def disk_rows(n: int, r: int) -> int:
        return n * (2 * r + 1) ** 2

    def join_round(sub: DataFrame, radius: int, n: int) -> DataFrame:
        ring_df = _ring_disk(sub, probe_col, cell_col, res, radius)
        if disk_rows(n, radius) <= broadcast_rows:
            ring_df = F.broadcast(ring_df)
        joined = stored.join(ring_df, on=cell_col, how="inner")
        return topk_per_key(
            joined,
            keys=[probe_col],
            order=[F.col("ring"), F.col(cell_col)],
            payload=[cell_col, "ring"],
            k=k,
        )

    if disk_rows(n_probes, max_ring) <= broadcast_rows:
        return join_round(probes.select(probe_col), max_ring, n_probes)

    # iterative ring-doubling.  Each round's top-k (≤ k·n_probes rows)
    # and shrunken probe set persist with lineage kept (fault-tolerant,
    # unlike localCheckpoint); the in-loop count materializes them, so
    # no round recomputes.  Pool-registered: a later knn_rings call
    # retires these blocks.
    _KNN_RINGS_POOL.new_generation()
    r0 = int(((broadcast_rows / n_probes) ** 0.5 - 1) // 2)
    radius = max(1, min(r0, max_ring))
    remaining = probes.select(probe_col)
    n_rem = n_probes
    resolved: list[DataFrame] = []
    while True:
        part = _KNN_RINGS_POOL.add(join_round(remaining, radius, n_rem).persist())
        if radius >= max_ring:
            resolved.append(part)
            break
        done = (
            part.groupBy(probe_col)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") >= k)
            .select(probe_col)
        )
        resolved.append(part.join(done, on=probe_col, how="leftsemi"))
        remaining = _KNN_RINGS_POOL.add(
            remaining.join(done, on=probe_col, how="leftanti").persist()
        )
        n_rem = remaining.count()
        if n_rem == 0:
            break
        radius = min(radius * 2, max_ring)
    out = resolved[0]
    for p in resolved[1:]:
        out = out.unionByName(p)
    return out


def cell_to_ij(cell: Column, res: int) -> tuple[Column, Column]:
    """Native-Column lattice coordinates of a res-``res`` grid cell —
    the raster (z, x, y) export: z=res, x=i, y=j.  Literal-res only
    (each digit is one shift+mask fold)."""
    base = cx.base_cell(cell)
    i = (base % GRID_DIM).cast("long")
    j = (base / GRID_DIM).cast("long")
    for lvl in range(1, res + 1):
        d = cx.digit(cell, lvl)
        if lvl % 2 == 1:
            i = i * 7 + d
        else:
            j = j * 7 + d
    return i, j


def dd_cell_to_ij(cell: str, res: int) -> tuple[str, str]:
    """DuckDB SQL twin of :func:`cell_to_ij`."""
    from . import synth

    base = synth.dd_base(cell)
    i = f"({base} % {GRID_DIM})"
    j = f"({base} // {GRID_DIM})"
    for lvl in range(1, res + 1):
        d = f"((({cell}) >> {(15 - lvl) * 3}) & 7)"
        if lvl % 2 == 1:
            i = f"({i} * 7 + {d})"
        else:
            j = f"({j} * 7 + {d})"
    return i, j


# ---------------------------------------------------------------------------
# distance + kNN
# ---------------------------------------------------------------------------

def sq_dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Equirectangular squared distance (deterministic plain arithmetic;
    preferred for oracle-checked ranking)."""
    dy = lat1 - lat2
    dx = lon1 - lon2
    return dy * dy + dx * dx


def sq_dist_wrapped(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """:func:`sq_dist` with the longitude difference taken the short
    way around the antimeridian: dx = min(|Δlon|, 360 − |Δlon|).  Same
    deterministic plain arithmetic (abs/least, no trig)."""
    dy = lat1 - lat2
    adx = F.abs(lon1 - lon2)
    dx = F.least(adx, F.lit(360.0) - adx)
    return dy * dy + dx * dx


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (native trig Columns)."""
    r1, r2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) ** 2 + F.cos(r1) * F.cos(r2) * F.sin(dlmb / 2) ** 2
    return 2 * 6371.0088 * F.asin(F.sqrt(a))


def knn_join(
    points: DataFrame,
    anchors: DataFrame,
    k: int,
    point_cols: tuple[str, str] = ("lat", "lon"),
    anchor_cols: tuple[str, str] = ("alat", "alon"),
    anchor_key: str = "anchor_id",
    metric: str = "sq",
) -> DataFrame:
    """Exact kNN: for each anchor, the k nearest points.

    Broadcast the (small) anchor table against the (huge) points table —
    the points side never shuffles except the two-phase per-anchor
    top-k (hexspark.topk): per-input-partition partial top-k, then a
    tiny global merge — never a single reducer sorting all candidates
    for one anchor.  Ties break deterministically by the point's
    natural column order.  Returns anchor key + ``rank`` + points
    columns + ``dist``.

    Scale path: pre-filter candidates by shared coarse cell prefix
    (see :func:`knn_join_pruned`) before the exact ranking.

    Antimeridian: the ``sq`` metric treats longitude flat (no ±180°
    wrap — matches the DuckDB oracle); ``metric='haversine'`` is
    seam-correct.  For a wrapped planar metric compose with
    :func:`sq_dist_wrapped` via :func:`distance_join(wrap_lon=True)`.
    """
    from .topk import topk_per_key

    plat, plon = point_cols
    alat, alon = anchor_cols
    dist_fn = sq_dist if metric == "sq" else haversine_km
    crossed = points.crossJoin(F.broadcast(anchors))
    d = dist_fn(F.col(plat), F.col(plon), F.col(alat), F.col(alon))
    scored = crossed.withColumn("dist", d)
    payload = [c for c in scored.columns if c != anchor_key]
    return topk_per_key(
        scored,
        keys=[anchor_key],
        order=[F.col("dist"), *[F.col(c) for c in points.columns]],
        payload=payload,
        k=k,
    )


def knn_join_pruned(
    points: DataFrame,
    anchors: DataFrame,
    k: int,
    cell_col: str = "cell",
    anchor_cell_col: str = "acell",
    prune_res: int = 2,
    point_cols: tuple[str, str] = ("lat", "lon"),
    anchor_cols: tuple[str, str] = ("alat", "alon"),
    anchor_key: str = "anchor_id",
    metric: str = "sq",
) -> DataFrame:
    """Cell-pruned kNN, the scale path: keep only points sharing a
    res-``prune_res`` ancestor with the anchor, then rank exactly.

    At 10^12 rows the coarse equi-join replaces the cross join —
    candidates per anchor drop ~121*7^prune_res-fold; the points side
    still never shuffles (anchor side broadcasts).  Approximate at
    bucket boundaries: exact iff the true k nearest share the anchor's
    coarse cell (recall is measured by tests, widen ``prune_res``
    downward to trade cost for recall)."""
    from .topk import topk_per_key

    plat, plon = point_cols
    alat, alon = anchor_cols
    a = anchors.withColumn("__coarse", cx.to_parent(anchor_cell_col, prune_res))
    p = points.withColumn("__coarse", cx.to_parent(cell_col, prune_res))
    cand = p.join(F.broadcast(a), on="__coarse", how="inner").drop("__coarse")
    dist_fn = sq_dist if metric == "sq" else haversine_km
    d = dist_fn(F.col(plat), F.col(plon), F.col(alat), F.col(alon))
    scored = cand.withColumn("dist", d)
    payload = [c for c in scored.columns if c != anchor_key]
    return topk_per_key(
        scored,
        keys=[anchor_key],
        order=[F.col("dist"), *[F.col(c) for c in points.columns]],
        payload=payload,
        k=k,
    )


# ---------------------------------------------------------------------------
# radius (epsilon) distance join
# ---------------------------------------------------------------------------

def distance_join_res(radius: float) -> int:
    """Finest grid resolution whose cell is at least ``radius`` degrees
    wide on BOTH axes, so the exact candidate stencil is the 3x3 lattice
    neighborhood.  Falls back to res 0 (the 32.7x16.4 degree base grid)
    for very wide radii — :func:`distance_join` then widens the stencil
    instead."""
    if radius <= 0:
        raise ValueError(f"distance_join_res: radius must be > 0, got {radius}")
    res = 0
    while res < 15:
        xl, yl = _axis_levels(res + 1)
        wx = 360.0 / (GRID_DIM * 7**xl)
        wy = 180.0 / (GRID_DIM * 7**yl)
        if wx < radius or wy < radius:
            break
        res += 1
    return res


def distance_join(
    probes: DataFrame,
    points: DataFrame,
    radius: float,
    probe_key: str = "probe_id",
    point_key: str = "point_id",
    probe_cols: tuple[str, str] = ("lat", "lon"),
    point_cols: tuple[str, str] = ("lat", "lon"),
    res: Optional[int] = None,
    pairs_once: bool = False,
    broadcast_rows: int = 4_000_000,
    wrap_lon: bool = False,
) -> DataFrame:
    """All (probe, point) pairs within ``radius`` — the classic spatial
    epsilon/radius join the reference composes from k-ring expansion
    plus refinement (grid_disk + contains over /root/reference/src/
    iteration.rs-style traversal); here it is ONE equi-join:

    1. grid-encode both sides at a resolution where the cell is at
       least ``radius`` wide per axis (auto-chosen; or pass ``res`` and
       the stencil widens to ceil(radius/cell_width) per axis),
    2. explode each probe into its (2kx+1) x (2ky+1) lattice stencil —
       exact candidate cover: any point within ``radius`` of the probe
       lies in a stencil cell (cell widths are exact on the lattice),
    3. equi-join candidates to the points' cells, refine with the
       deterministic squared equirectangular metric (``sq_dist``, plain
       IEEE arithmetic — bit-identical in the DuckDB oracle).

    Scale posture: the points side NEVER shuffles when the probe
    stencil fits the broadcast budget (the reference's shape: a bounded
    probe set against a huge stored table); above the budget it
    degrades to a shuffled equi-join on the cell key — never an
    unbounded broadcast, never a cross join.

    Antimeridian: by default longitude is flat (no ±180° wrap),
    matching the GridEncoder's planar lattice and the DuckDB oracle.
    ``wrap_lon=True`` makes the stencil wrap on the i axis (indices
    taken modulo ``ni``) and refines with :func:`sq_dist_wrapped`
    (Δlon the short way around), so Pacific data pairs across the seam.
    Latitude never wraps (the poles are lattice edges, not a seam).

    ``radius`` is in degrees of the sq metric.  ``pairs_once`` keeps
    each unordered pair once (probe_key < point_key) for self-joins.
    Output: probe_key, point_key, ``dist`` (squared degrees).
    """
    n_probes = probes.count()
    if res is None:
        # adaptive refinement: distance_join_res picks the COARSEST res
        # whose 3x3 stencil is exact, but a coarse cell over-covers the
        # radius disk (cell width >> radius -> most candidate pairs fail
        # the refine; measured 434M sq_dist evaluations for 92 output
        # pairs at sf0.1/r=0.5).  Go finer while the widened stencil
        # still fits the broadcast budget: candidate volume shrinks with
        # the covered AREA ((2r+wx)*(2r+wy)) while the stencil row count
        # (probes x cells) stays broadcastable — the refine stage then
        # evaluates ~an order of magnitude fewer false pairs at any
        # scale, since both effects are geometry, not data-size.
        res = distance_join_res(radius)
        while res < 15:
            xl2, yl2 = _axis_levels(res + 1)
            wx2 = 360.0 / (GRID_DIM * 7**xl2)
            wy2 = 180.0 / (GRID_DIM * 7**yl2)
            kx2 = max(1, int(math.ceil(radius / wx2)))
            ky2 = max(1, int(math.ceil(radius / wy2)))
            if n_probes * (2 * kx2 + 1) * (2 * ky2 + 1) > broadcast_rows:
                break
            res += 1
    plat, plon = probe_cols
    qlat, qlon = point_cols
    xl, yl = _axis_levels(res)
    ni, nj = GRID_DIM * 7**xl, GRID_DIM * 7**yl
    wx, wy = 360.0 / ni, 180.0 / nj
    kx = max(1, int(math.ceil(radius / wx)))
    ky = max(1, int(math.ceil(radius / wy)))

    out_pk, out_qk = probe_key, point_key
    if out_pk == out_qk:
        out_pk, out_qk = f"{probe_key}_l", f"{probe_key}_r"

    pcell = grid_encode(F.col(plat), F.col(plon), res)
    pi, pj = cell_to_ij(pcell, res)
    base = probes.select(
        F.col(probe_key).alias(out_pk),
        F.col(plat).alias("__plat"),
        F.col(plon).alias("__plon"),
        pi.alias("__pi"),
        pj.alias("__pj"),
    )
    raw_i = F.col("__pi") + F.col("__di")
    # wrap: stencil indices modulo ni on the i axis (pmod keeps the
    # result non-negative for seam-left probes); flat: clip at the edge
    i_expr = F.pmod(raw_i, F.lit(ni)) if wrap_lon else raw_i
    cand = (
        base.withColumn("__di", F.explode(F.sequence(F.lit(-kx), F.lit(kx))))
        .withColumn("__dj", F.explode(F.sequence(F.lit(-ky), F.lit(ky))))
        .select(
            out_pk,
            "__plat",
            "__plon",
            i_expr.alias("__i"),
            (F.col("__pj") + F.col("__dj")).alias("__j"),
        )
        .filter(
            (F.col("__i") >= 0) & (F.col("__i") < ni)
            & (F.col("__j") >= 0) & (F.col("__j") < nj)
        )
        .select(
            out_pk, "__plat", "__plon",
            ij_to_cell(F.col("__i"), F.col("__j"), res).alias("__cell"),
        )
    )
    if wrap_lon and 2 * kx + 1 >= ni:
        # a stencil at least the full i range wraps onto itself —
        # dedupe so each (probe, cell) candidate joins once
        cand = cand.dropDuplicates([out_pk, "__cell"])
    if n_probes * (2 * kx + 1) * (2 * ky + 1) <= broadcast_rows:
        cand = F.broadcast(cand)
    pts = points.select(
        F.col(point_key).alias(out_qk),
        F.col(qlat).alias("__qlat"),
        F.col(qlon).alias("__qlon"),
        grid_encode(F.col(qlat), F.col(qlon), res).alias("__cell"),
    )
    metric = sq_dist_wrapped if wrap_lon else sq_dist
    d = metric(
        F.col("__plat"), F.col("__plon"), F.col("__qlat"), F.col("__qlon")
    )
    out = (
        pts.join(cand, on="__cell", how="inner")
        .withColumn("dist", d)
        .filter(F.col("dist") <= F.lit(float(radius) * float(radius)))
        .select(out_pk, out_qk, "dist")
    )
    if pairs_once:
        out = out.filter(F.col(out_pk) < F.col(out_qk))
    return out


def trace_cells(
    segments: DataFrame,
    res: int,
    seg_col: str = "seg_id",
    endpoint_cols: "tuple[str, str, str, str]" = ("lat1", "lon1", "lat2", "lon2"),
) -> DataFrame:
    """Rasterize straight lat/lon segments onto the res-``res`` grid —
    trajectory support (flight paths, road links, user tracks → the
    cells they traverse), the line analogue of polyfill.

    Each segment is sampled at half the lattice pitch along its
    dominant axis (``n-1 = 2*ceil(max(|dlon|/px, |dlat|/py))`` interior
    steps), every sample encodes, and duplicates collapse to one row
    per traversed cell carrying the FIRST sample index (``step`` —
    orders cells along the path).  Half-pitch sampling means adjacent
    samples land in the same or an adjacent cell, so the trace has no
    gaps on the centroid lattice.

    All native Columns (explode of a per-row sequence → encode →
    map-side-combinable min), so fan-out is bounded by path length in
    cells — a segment table never shuffles except the final (seg,
    cell) combine.  Every arithmetic step (ceil/lerp/encode) is the
    same IEEE double chain as the DuckDB twin.
    """
    la1, lo1, la2, lo2 = (F.col(c) for c in endpoint_cols)
    px = 360.0 / (GRID_DIM * 7 ** ((res + 1) // 2))
    py = 180.0 / (GRID_DIM * 7 ** (res // 2))
    n1 = (
        F.ceil(
            F.greatest(F.abs(lo2 - lo1) / F.lit(px), F.abs(la2 - la1) / F.lit(py))
        ).cast("long")
        * 2
    )
    i = F.explode(F.sequence(F.lit(0).cast("long"), n1)).alias("__i")
    sampled = segments.select(
        F.col(seg_col), la1.alias("__la1"), lo1.alias("__lo1"),
        la2.alias("__la2"), lo2.alias("__lo2"), n1.alias("__n1"), i
    )
    t = F.when(F.col("__n1") > 0, F.col("__i") / F.col("__n1")).otherwise(
        F.lit(0.0)
    )
    lat = F.col("__la1") + (F.col("__la2") - F.col("__la1")) * t
    lon = F.col("__lo1") + (F.col("__lo2") - F.col("__lo1")) * t
    return (
        sampled.select(
            F.col(seg_col),
            grid_encode(lat, lon, res).alias("cell"),
            F.col("__i"),
        )
        .groupBy(seg_col, "cell")
        .agg(F.min("__i").alias("step"))
    )


def dd_trace_cells(
    segments_cte: str, res: int, seg: str = "seg_id"
) -> str:
    """DuckDB twin of :func:`trace_cells` over a segments CTE with
    columns (seg_id, lat1, lon1, lat2, lon2)."""
    px = 360.0 / (GRID_DIM * 7 ** ((res + 1) // 2))
    py = 180.0 / (GRID_DIM * 7 ** (res // 2))
    enc = dd_grid_encode("llat", "llon", res)
    return f"""
        WITH segs AS ({segments_cte}),
        sized AS (
            SELECT *, CAST(CEIL(GREATEST(
                ABS(lon2 - lon1) / {px!r}, ABS(lat2 - lat1) / {py!r}
            )) AS BIGINT) * 2 AS n1
            FROM segs
        ),
        sampled AS (
            SELECT {seg}, n1, CAST(i AS BIGINT) AS i,
                   lat1 + (lat2 - lat1) * (CASE WHEN n1 > 0
                     THEN CAST(i AS DOUBLE) / n1 ELSE 0.0 END) AS llat,
                   lon1 + (lon2 - lon1) * (CASE WHEN n1 > 0
                     THEN CAST(i AS DOUBLE) / n1 ELSE 0.0 END) AS llon
            FROM sized, LATERAL (
                SELECT UNNEST(RANGE(0, n1 + 1))
            ) t(i)
        )
        SELECT {seg}, {enc} AS cell, MIN(i) AS step
        FROM sampled GROUP BY 1, 2
    """
