"""Set algebra over compacted cell sets: intersect / union / difference.

The reference's ``HexTreeSet`` models a region as a compacted set of
pairwise non-related cells; combining regions (coverage overlap,
region merge, exclusion zones) needs the three set operations *under
subtree semantics*: a point is in the set iff some stored cell is an
ancestor-or-self of its cell.  The reference exposes the building
blocks (contains / iteration — /root/reference/src/hex_tree_set.rs);
the closed-form algebra here is the Spark-first composition:

* every step is a broadcast containment join (``join.get_chained`` —
  one plain hash join per resolution present in the other set, no
  row blowup), so the operations cost O(|A| + |B|) shuffled rows —
  never an uncompact-to-max-res explosion except the strictly
  necessary sub-cell refinement in ``set_difference``;
* results re-compact through the reference's all-7-children rule
  (hexspark.build), so outputs are canonical compacted sets —
  ``intersect(A, A) == A`` etc. hold structurally, not just
  semantically.

Correctness identities (DuckDB-oracled in __spark_entry__ by
uncompacting both operands to a common res, applying the plain SQL
set op, and re-compacting):

    pts(intersect(A,B)) == pts(A) ∩ pts(B)
    pts(union(A,B))     == pts(A) ∪ pts(B)
    pts(difference(A,B))== pts(A) \\ pts(B)

where pts(S) is the res-R point set covered by S for any R ≥ both
sets' max resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import build as bx
from . import cells as cx
from . import constants as K
from .join import get_chained, region_res_set


def _cells(df: DataFrame, cell_col: str) -> DataFrame:
    return df.select(F.col(cell_col).alias("cell"))


def synth_overlapping_sets(
    keys: DataFrame, res: int, fresh_offset: int, key_col: str = "k"
) -> tuple[DataFrame, DataFrame]:
    """The canonical (A, B) fixture for exercising every set-algebra
    branch: A = keyed cells at ``res``; B overlaps A three ways —
    coarser parents (k%5==0), res+1 digit-3 children (k%7==1), and
    fresh mostly-disjoint cells (k%11==2, keys shifted by
    ``fresh_offset``).  ONE definition shared by the oracle contract
    query (__spark_entry__) and the unit tests, with the SQL twin
    generated from the same formulas in oracles.dd_setops_ab_srcs —
    three hand-copies of the bit math would drift silently."""
    from . import synth

    k = F.col(key_col)
    cell = synth.cell_from_key(k, res)
    a = bx.build_region(keys.select(cell.alias("cell")), compactor="set")
    child_shift = (K.MAX_RES - (res + 1)) * K.DIGIT_BITS
    bumped = (
        cell.bitwiseAND(F.lit(~K.RES_MASK))
        .bitwiseOR(F.lit((res + 1) << K.RES_OFFSET))
    )
    child3 = bumped - F.lit(4).cast("long") * F.lit(1 << child_shift)
    bsrc = (
        keys.filter(k % 5 == 0)
        .select(cx.to_parent(cell, res - 1).alias("cell"))
        .unionByName(keys.filter(k % 7 == 1).select(child3.alias("cell")))
        .unionByName(
            keys.filter(k % 11 == 2).select(
                synth.cell_from_key(k + fresh_offset, res).alias("cell")
            )
        )
    )
    b = bx.build_region(bsrc, compactor="set")
    return a, b


def _covered(
    probes: DataFrame, other: DataFrame, how: str = "inner"
) -> DataFrame:
    """(cell, stored_cell) pairs: each probe cell with the ``other``-set
    cell that is its ancestor-or-self (at most one — compacted sets are
    pairwise non-related).  ``how='left'`` keeps misses with NULL."""
    return get_chained(probes, other.withColumnRenamed("cell", "__oc"),
                       probe_col="cell", region_col="__oc", how=how)


def set_intersect(
    a: DataFrame, b: DataFrame, cell_col: str = "cell"
) -> DataFrame:
    """Cells covering exactly pts(A) ∩ pts(B), compacted.

    For non-related compacted sets, two related cells are always
    nested — so the intersection of an overlapping (a, b) pair IS the
    finer of the two.  Result = B-cells covered by A (finer-or-equal
    side, equal pairs counted here once) ∪ A-cells *strictly* covered
    by B; the two parts are pairwise non-related by the sets' own
    non-relatedness (proof: two kept cells with one ⊂ the other would
    force two related cells inside a single compacted operand)."""
    A, B = _cells(a, cell_col), _cells(b, cell_col)
    part_b = _covered(B, A).select("cell")
    part_a = (
        _covered(A, B)
        .filter(F.col("stored_cell") != F.col("cell"))  # strict: b ⊋ a
        .select("cell")
    )
    both = part_b.unionByName(part_a)
    # adjacent complete families can emerge (A holds all 7 children of
    # x, B holds x → the 7 children survive) — re-compact to canonical
    return bx.compact_df(both, "cell", None, "set")


def set_union(
    a: DataFrame, b: DataFrame, cell_col: str = "cell"
) -> DataFrame:
    """Cells covering exactly pts(A) ∪ pts(B), compacted.

    Keep a ∈ A unless some b ⊋ a (a's coverage is then redundant);
    keep b ∈ B unless some a ⊇ b (equal cells keep the A copy).
    Survivors are pairwise non-related (a kept ∧ b kept with b ⊂ a
    would contradict b's survival), and dropped cells stay covered
    (their coverer survives: its own coverer would be a related pair
    inside one operand)."""
    A, B = _cells(a, cell_col), _cells(b, cell_col)
    keep_a = (
        _covered(A, B, how="left")
        .filter(
            F.col("stored_cell").isNull()
            | (F.col("stored_cell") == F.col("cell"))
        )
        .select("cell")
    )
    keep_b = (
        _covered(B, A, how="left")
        .filter(F.col("stored_cell").isNull())
        .select("cell")
    )
    return bx.compact_df(keep_a.unionByName(keep_b), "cell", None, "set")


def _uncompact_to_targets(
    df: DataFrame, lo_res: int, hi_res: int, target_col: str = "__t"
) -> DataFrame:
    """Per-cell bounded expansion: each cell explodes level-by-level
    until its OWN ``target_col`` resolution (same child bit-math as
    build.uncompact_df), so a cell overlapped only by coarse cells
    never pays the global-max 7^Δ blowup."""
    out = df
    for r in range(lo_res, hi_res):
        child_shift = (K.MAX_RES - (r + 1)) * K.DIGIT_BITS
        is_here = (cx.res("cell") == r) & (F.col(target_col) > r)
        children = F.array([F.lit(d) for d in range(7)])
        out = out.withColumn(
            "__d",
            F.explode(F.when(is_here, children).otherwise(F.array(F.lit(-1)))),
        )
        bumped = (
            F.col("cell")
            .bitwiseAND(F.lit(~K.RES_MASK))
            .bitwiseOR(F.lit((r + 1) << K.RES_OFFSET))
        )
        child = bumped - (F.lit(7).cast("long") - F.col("__d")) * F.lit(
            1 << child_shift
        )
        out = out.withColumn(
            "cell", F.when(F.col("__d") >= 0, child).otherwise(F.col("cell"))
        ).drop("__d")
    return out


def set_difference(
    a: DataFrame, b: DataFrame, cell_col: str = "cell"
) -> DataFrame:
    """Cells covering exactly pts(A) \\ pts(B), compacted.

    Three disjoint cases per a ∈ A (overlap ⟺ nesting for compacted
    operands):

    1. no related b       → a survives whole;
    2. some b ⊇ a         → a vanishes;
    3. finer bs ⊂ a       → a is refined: expanded level-by-level to
       the max res of ITS OWN overlapping bs (per-cell target, not the
       global max — the only place uncompaction is semantically
       unavoidable, cost 7^(target-res(a)) per refined cell), then the
       descendants covered by B are dropped and the remainder
       re-compacts (removals leave complete sibling families above the
       excision which the all-7 rule merges back)."""
    A, B = _cells(a, cell_col), _cells(b, cell_col)
    lab = _covered(A, B, how="left")
    survivors = lab.filter(F.col("stored_cell").isNull()).select("cell")

    # per-a refinement targets: deepest b strictly under a
    finer = (
        _covered(B, A)
        .filter(cx.res("cell") > cx.res("stored_cell"))
        .groupBy(F.col("stored_cell").alias("cell"))
        .agg(F.max(cx.res("cell")).alias("__t"))
    )
    rs_a, rs_b = region_res_set(A), region_res_set(B)
    if not rs_a or not rs_b:
        return bx.compact_df(survivors, "cell", None, "set")
    tagged = survivors.join(F.broadcast(finer), on="cell", how="left")
    whole = tagged.filter(F.col("__t").isNull()).select("cell")
    refined = _uncompact_to_targets(
        tagged.filter(F.col("__t").isNotNull()), min(rs_a), max(rs_b)
    )
    kept = (
        _covered(refined.select("cell"), B, how="left")
        .filter(F.col("stored_cell").isNull())
        .select("cell")
    )
    return bx.compact_df(whole.unionByName(kept), "cell", None, "set")
