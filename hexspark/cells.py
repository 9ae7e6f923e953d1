"""Native Column-expression library for H3 cell-index math.

Every function here is a pure ``pyspark.sql.Column`` expression over a
``BIGINT`` cell column — no UDFs, no Python in the hot path — so all cell
math participates in whole-stage codegen, predicate pushdown, and
partition pruning.

Semantics mirror the reference implementation bit-for-bit:

* bitfield accessors        — /root/reference/src/cell.rs:28-129
* validation (``from_raw``) — /root/reference/src/cell.rs:154-168
* parent promotion          — /root/reference/src/cell.rs:182-194
* relatedness               — /root/reference/src/cell.rs:217-226
* canonical hex form        — /root/reference/src/cell.rs:318-338
* ``lo``/``hi`` subtree bounds — derived from promotion + the DFS
  iteration-order invariant (/root/reference/src/disktree/mod.rs:226-230):
  compacted leaves are pairwise non-related, so DFS digit order equals
  ascending ``lo(cell)``; containment is a range predicate on (lo, hi).

``res`` arguments accept either a Python int (fast literal path) or a
Column (variable-resolution path via ``call_function`` shifts).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import constants as K

ColumnOrName = Union[Column, str]
ResArg = Union[Column, int]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _shiftright(x: Column, n: ResArg) -> Column:
    if isinstance(n, int):
        return F.shiftrightunsigned(x, n)
    return F.call_function("shiftrightunsigned", x, n)


def _shiftleft(x: Column, n: ResArg) -> Column:
    if isinstance(n, int):
        return F.shiftleft(x, n)
    return F.call_function("shiftleft", x, n)


# ---------------------------------------------------------------------------
# bitfield accessors
# ---------------------------------------------------------------------------

def reserved(cell: ColumnOrName) -> Column:
    """Reserved high bit; as BIGINT this is simply the sign bit."""
    return _col(cell) < 0


def mode(cell: ColumnOrName) -> Column:
    return _shiftright(_col(cell), K.MODE_OFFSET).bitwiseAND(F.lit(0xF))


def mode_dep(cell: ColumnOrName) -> Column:
    return _shiftright(_col(cell), K.MODE_DEP_OFFSET).bitwiseAND(F.lit(0x7))


def res(cell: ColumnOrName) -> Column:
    """Resolution 0..15."""
    return _shiftright(_col(cell), K.RES_OFFSET).bitwiseAND(F.lit(0xF))


def base_cell(cell: ColumnOrName) -> Column:
    """Base cell [0, 122)."""
    return _shiftright(_col(cell), K.BASE_OFFSET).bitwiseAND(F.lit(0x7F))


def digit(cell: ColumnOrName, r: ResArg) -> Column:
    """3-bit digit at resolution ``r`` (1..15)."""
    if isinstance(r, int):
        shift = (K.MAX_RES - r) * K.DIGIT_BITS
    else:
        shift = (F.lit(K.MAX_RES) - r) * K.DIGIT_BITS
    return _shiftright(_col(cell), shift).bitwiseAND(F.lit(0x7))


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

def is_valid(cell: ColumnOrName) -> Column:
    """``Cell::from_raw`` validity: reserved==0, mode==1, base<122."""
    c = _col(cell)
    return (
        (c >= 0)
        & (mode(c) == K.MODE_CELL)
        & (base_cell(c) < K.NUM_BASE_CELLS)
    )


def validate(cell: ColumnOrName) -> Column:
    """Return the cell if valid, else NULL (invalid rows are the caller's
    quarantine side-channel, the analogue of ``Error::Index``)."""
    c = _col(cell)
    return F.when(is_valid(c), c)


# ---------------------------------------------------------------------------
# promotion / hierarchy
# ---------------------------------------------------------------------------

def to_parent(cell: ColumnOrName, r: ResArg) -> Column:
    """Promote ``cell`` to resolution ``r``.

    NULL when ``r > res(cell)`` (cannot demote); identity when equal;
    otherwise set the res field and fill all finer digits with 0b111.
    """
    c = _col(cell)
    cr = res(c)
    if isinstance(r, int):
        fill = F.lit(K.trailing_mask(r))
        new_res = F.lit(r << K.RES_OFFSET)
        r_col = F.lit(r)
    else:
        fill = _shiftleft(F.lit(1).cast("long"), (F.lit(K.MAX_RES) - r) * K.DIGIT_BITS) - 1
        new_res = _shiftleft(r.cast("long"), K.RES_OFFSET)
        r_col = r
    cleared = c.bitwiseAND(F.lit(~K.RES_MASK))
    promoted = cleared.bitwiseOR(new_res).bitwiseOR(fill)
    return (
        F.when(cr < r_col, F.lit(None).cast("long"))
        .when(cr == r_col, c)
        .otherwise(promoted)
    )


def is_related(a: ColumnOrName, b: ColumnOrName) -> Column:
    """True iff one cell is an ancestor-or-self of the other."""
    ca, cb = _col(a), _col(b)
    common = F.least(res(ca), res(cb))
    return to_parent(ca, common) == to_parent(cb, common)


# ---------------------------------------------------------------------------
# subtree range keys (the engine's core containment device)
# ---------------------------------------------------------------------------

def _trail_mask_col(cell: Column) -> Column:
    t = (F.lit(K.MAX_RES) - res(cell)) * K.DIGIT_BITS
    return _shiftleft(F.lit(1).cast("long"), t) - 1


def lo(cell: ColumnOrName) -> Column:
    """Smallest res-15 descendant key: trailing digits -> 0, res -> 15.

    For pairwise non-related compacted leaves, ascending ``lo`` equals the
    reference's DFS emission order (/root/reference/src/disktree/mod.rs:226-230).
    """
    c = _col(cell)
    mask = _trail_mask_col(c)
    cleared = c - c.bitwiseAND(mask)
    return cleared.bitwiseAND(F.lit(~K.RES_MASK)).bitwiseOR(
        F.lit(K.MAX_RES << K.RES_OFFSET)
    )


def hi(cell: ColumnOrName) -> Column:
    """Largest res-15 descendant key: trailing digits -> 7, res -> 15."""
    c = _col(cell)
    mask = _trail_mask_col(c)
    filled = c.bitwiseOR(mask)
    return filled.bitwiseAND(F.lit(~K.RES_MASK)).bitwiseOR(
        F.lit(K.MAX_RES << K.RES_OFFSET)
    )


def covers(anc: ColumnOrName, desc: ColumnOrName) -> Column:
    """True iff ``anc`` is an ancestor-or-self of ``desc`` (range form)."""
    return (lo(anc) <= lo(desc)) & (hi(anc) >= hi(desc))


def overlaps(a: ColumnOrName, b: ColumnOrName) -> Column:
    """True iff the two subtree ranges intersect == cells are related.

    In the H3 hierarchy two cells' res-15 ranges are either nested or
    disjoint, so overlap ⟺ relatedness; this single predicate implements
    ``descendants`` (both the subtree case and the covering-leaf case)."""
    return (lo(a) <= hi(b)) & (hi(a) >= lo(b))


# ---------------------------------------------------------------------------
# construction / display
# ---------------------------------------------------------------------------

def make_cell(base: Column, r: Column, digits: Column) -> Column:
    """Assemble a cell from base, res, and a packed 45-bit digit field.

    ``digits`` must already contain 0b111 fill for resolutions > r.
    """
    return (
        F.lit(K.MODE_CELL << K.MODE_OFFSET)
        .bitwiseOR(_shiftleft(r.cast("long"), K.RES_OFFSET))
        .bitwiseOR(_shiftleft(base.cast("long"), K.BASE_OFFSET))
        .bitwiseOR(digits.cast("long"))
    )


def digits_array(cell: ColumnOrName) -> Column:
    """Array of the cell's digits for res 1..res(cell) — the ``Digits``
    iterator (/root/reference/src/digits.rs:10-36) as one expression.
    Rarely needed (joins replace tree walks); provided for parity."""
    c = _col(cell)
    return F.filter(
        F.array(*[
            F.when(res(c) >= r, digit(c, r)).otherwise(F.lit(None))
            for r in range(1, K.MAX_RES + 1)
        ]),
        lambda x: x.isNotNull(),
    )


def to_hex(cell: ColumnOrName) -> Column:
    """Canonical string form: bare lowercase hex, no padding
    (/root/reference/src/cell.rs:318-338)."""
    return F.lower(F.hex(_col(cell)))


def from_hex(s: ColumnOrName) -> Column:
    """Parse canonical hex form back to a BIGINT cell."""
    return F.conv(_col(s), 16, 10).cast("long")
