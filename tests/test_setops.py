"""Compacted-set algebra: point-set semantics + canonical-form identities.

Truth model: pts_R(S) = the res-R descendant set covered by S (computed
with the engine's own uncompact, which is independently oracle-gated).
Every operation must satisfy the exact point-set identity AND return a
canonically compacted (pairwise non-related, no complete 7-family) set.
"""

import pytest
from pyspark.sql import functions as F

from hexspark import build as bx
from hexspark.setops import set_difference, set_intersect, set_union

RES_A = 6
PTS_RES = 7


def _pts(spark, df, res=PTS_RES):
    if df.rdd.isEmpty():
        return set()
    return {
        r["cell"]
        for r in bx.uncompact_df(df, res, min_res=0).collect()
    }


def _canonical(df):
    """Pairwise non-related + no complete sibling family remains."""
    from collections import Counter

    import numpy as np

    from hexspark import cells_np as cnp

    rows = [r["cell"] for r in df.collect()]
    cells = np.array(rows, dtype=np.int64)
    lo, hi = cnp.lo(cells), cnp.hi(cells)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    assert (lo[1:] > hi[:-1]).all(), "related/overlapping cells in output"
    res = cnp.res(cells)
    for r in range(int(res.max()), 0, -1):
        at_r = cells[res == r]
        if len(at_r) < 7:
            continue
        parents = Counter(int(p) for p in cnp.to_parent(at_r, r - 1))
        assert all(n < 7 for n in parents.values()), \
            f"compactible family at res {r}"
    return rows


@pytest.fixture(scope="module")
def ab(spark):
    """The SHARED overlapping-sets fixture (setops.synth_overlapping_sets
    — same builder the oracle contract query uses, same fresh-offset
    constant) over a larger key range than the supplier table, so the
    unit tests exercise the identical three overlap regimes without a
    hand-copied second version of the bit math."""
    from hexspark.oracles import SETOPS_FRESH_OFFSET
    from hexspark.setops import synth_overlapping_sets

    keys = spark.range(0, 400).select(F.col("id").alias("k"))
    a, b = synth_overlapping_sets(keys, RES_A, SETOPS_FRESH_OFFSET)
    a, b = a.persist(), b.persist()
    yield a, b
    a.unpersist()
    b.unpersist()


def test_intersect_pointset_and_canonical(spark, ab):
    a, b = ab
    got = set_intersect(a, b)
    assert _pts(spark, got) == _pts(spark, a) & _pts(spark, b)
    _canonical(got)


def test_union_pointset_and_canonical(spark, ab):
    a, b = ab
    got = set_union(a, b)
    assert _pts(spark, got) == _pts(spark, a) | _pts(spark, b)
    _canonical(got)


def test_difference_pointset_and_canonical(spark, ab):
    a, b = ab
    got = set_difference(a, b)
    assert _pts(spark, got) == _pts(spark, a) - _pts(spark, b)
    _canonical(got)
    # and the mirror direction exercises refine-under-coarse-b
    got2 = set_difference(b, a)
    assert _pts(spark, got2) == _pts(spark, b) - _pts(spark, a)
    _canonical(got2)


def test_identities_and_empty(spark, ab):
    a, _ = ab
    empty = spark.createDataFrame([], "cell: long")
    acells = {r["cell"] for r in a.collect()}
    assert {r["cell"] for r in set_intersect(a, a).collect()} == acells
    assert {r["cell"] for r in set_union(a, empty).collect()} == acells
    assert set_difference(a, a).count() == 0
    assert set_intersect(a, empty).count() == 0
    assert {r["cell"] for r in set_difference(a, empty).collect()} == acells


def test_union_compacts_completed_family(spark):
    """A = 6 children of x, B = the 7th → union must emit exactly x
    (the all-7 rule fires across operands); intersect(A, parent) = A."""
    import numpy as np

    import hexspark.constants as K
    from hexspark import cells_np as cnp

    parent = int(
        cnp.make_cell(np.array([5]), np.array([3]),
                      np.array([K.trailing_mask(3)]))[0]
    )
    shift = (15 - 4) * 3
    bump = (parent & ~K.RES_MASK) | (4 << K.RES_OFFSET)
    kids = [bump - (7 - d) * (1 << shift) for d in range(7)]
    a = spark.createDataFrame([(c,) for c in kids[:6]], "cell: long")
    b = spark.createDataFrame([(kids[6],)], "cell: long")
    u = [r["cell"] for r in set_union(a, b).collect()]
    assert u == [parent]
    p = spark.createDataFrame([(parent,)], "cell: long")
    assert {r["cell"] for r in set_intersect(a, p).collect()} == set(kids[:6])
    # difference(parent, one child) = the other six children
    d = {r["cell"] for r in set_difference(p, b).collect()}
    assert d == set(kids[:6])
