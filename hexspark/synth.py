"""Deterministic synthetic cells / geo columns, with twin SQL generators.

The DuckDB correctness oracle can only see the driver's pre-registered
parquet views, so every oracle-gated query derives its spatial columns
*deterministically from table keys* with pure integer arithmetic that
both engines (Spark Columns / DuckDB SQL) express identically.  This
module is the single source of truth for those formulas: each helper
has a Spark-Column form and a DuckDB-SQL-string form generated from the
same constants, so the two sides cannot drift.

Construction: for a non-negative key k and resolution r,
    base     = k mod 122
    digit_i  = (k div 7^(i-1)) mod 7      for i = 1..r
    digits >r = 0b111 fill
This is not H3 *geometry* — it is a valid H3 *bit layout* whose
hierarchy (parents share prefixes) is exactly what the engine operates
on; the geometric encoder is pluggable (see hexspark.geo).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import constants as K


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def cell_from_key(key: Column, res: int) -> Column:
    """Deterministic valid cell at resolution ``res`` from a key column."""
    base = (key % K.NUM_BASE_CELLS).cast("long")
    digits = F.lit(K.trailing_mask(res)).cast("long")
    for i in range(1, res + 1):
        d = (F.floor(key / F.lit(7 ** (i - 1))) % 7).cast("long")
        digits = digits + d * F.lit(1 << ((K.MAX_RES - i) * K.DIGIT_BITS))
    return (
        F.lit(K.MODE_CELL << K.MODE_OFFSET)
        .bitwiseOR(F.shiftleft(base, K.BASE_OFFSET))
        .bitwiseOR(F.lit(res << K.RES_OFFSET))
        .bitwiseOR(digits)
    )


def latlon_from_key(key: Column) -> tuple[Column, Column]:
    """Deterministic (lat, lon) in degrees from a key column.

    Multiplicative scramble keeps points spread; all math is exact
    integer arithmetic until one final double division, so Spark and
    DuckDB agree bit-for-bit (keys must stay < ~3.4e9 to avoid 64-bit
    overflow — true for every testdata key)."""
    h1 = (key * 2654435761) % 180000000
    h2 = (key * 2246822519 + 12345) % 360000000
    lat = (h1 / F.lit(1000000.0)) - 90
    lon = (h2 / F.lit(1000000.0)) - 180
    return lat.alias("lat"), lon.alias("lon")


# ---------------------------------------------------------------------------
# DuckDB-SQL side (strings)
# ---------------------------------------------------------------------------

def dd_cell_from_key(key: str, res: int) -> str:
    """DuckDB SQL expression equal to :func:`cell_from_key`."""
    base = f"(({key}) % {K.NUM_BASE_CELLS})"
    terms = [str(K.trailing_mask(res))]
    for i in range(1, res + 1):
        p = 7 ** (i - 1)
        shift = 1 << ((K.MAX_RES - i) * K.DIGIT_BITS)
        terms.append(f"(((({key}) // {p}) % 7) * {shift})")
    digits = " + ".join(terms)
    return (
        f"({K.MODE_CELL << K.MODE_OFFSET} + ({base} * {1 << K.BASE_OFFSET})"
        f" + {res << K.RES_OFFSET} + ({digits}))"
    )


def dd_latlon_from_key(key: str) -> tuple[str, str]:
    h1 = f"((({key}) * 2654435761) % 180000000)"
    h2 = f"((({key}) * 2246822519 + 12345) % 360000000)"
    lat = f"(({h1} / 1000000.0) - 90)"
    lon = f"(({h2} / 1000000.0) - 180)"
    return lat, lon


def anchor_wrap_lon(key: Column) -> Column:
    """Seam-straddling anchor longitude for the antimeridian fixtures:
    ±(179.9 − (key % 7)·0.15), alternating sides of ±180° by key
    parity.  Twin: :func:`dd_anchor_wrap_lon` — keep the two in sync
    (CLAUDE.md: oracle twins generated from the SAME formulas)."""
    return (F.lit(1) - F.lit(2) * (key % 2)) * (
        F.lit(179.9) - (key % 7) * F.lit(0.15)
    )


def dd_anchor_wrap_lon(key: str) -> str:
    """DuckDB twin of :func:`anchor_wrap_lon`.  CAST the literals:
    DuckDB parses 179.9/0.15 as DECIMAL and would do exact decimal
    arithmetic, diverging from Spark's float64 by ULPs."""
    return (
        f"((1 - 2 * (({key}) % 2)) * "
        f"(CAST(179.9 AS DOUBLE) - (({key}) % 7) * CAST(0.15 AS DOUBLE)))"
    )


def dd_res(x: str) -> str:
    return f"((({x}) >> {K.RES_OFFSET}) & 15)"


def dd_base(x: str) -> str:
    return f"((({x}) >> {K.BASE_OFFSET}) & 127)"


def dd_to_parent(x: str, r: int) -> str:
    """DuckDB SQL for literal-res promotion (NULL when res(x) < r)."""
    cleared = f"((({x}) & {~K.RES_MASK}) | {r << K.RES_OFFSET} | {K.trailing_mask(r)})"
    return (
        f"(CASE WHEN {dd_res(x)} < {r} THEN NULL "
        f"WHEN {dd_res(x)} = {r} THEN ({x}) "
        f"ELSE {cleared} END)"
    )


def dd_lo(x: str) -> str:
    t = f"((15 - {dd_res(x)}) * 3)"
    mask = f"((1::BIGINT << {t}) - 1)"
    cleared = f"(({x}) - (({x}) & {mask}))"
    return f"(({cleared} & {_not_res_mask()}) | {K.MAX_RES << K.RES_OFFSET})"


def dd_hi(x: str) -> str:
    t = f"((15 - {dd_res(x)}) * 3)"
    mask = f"((1::BIGINT << {t}) - 1)"
    filled = f"(({x}) | {mask})"
    return f"(({filled} & {_not_res_mask()}) | {K.MAX_RES << K.RES_OFFSET})"


def _not_res_mask() -> int:
    # ~RES_MASK as a signed 64-bit literal
    return ~K.RES_MASK
