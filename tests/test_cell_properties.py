"""Property-based tests (hypothesis) for the cell algebra.

Pure-numpy twins are exercised — they are proven element-wise equal to
the Column exprs in test_cells.py, so these properties transfer."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hexspark import cells_np as cnp
from hexspark import constants as K


@st.composite
def cells(draw):
    base = draw(st.integers(0, K.NUM_BASE_CELLS - 1))
    res = draw(st.integers(0, K.MAX_RES))
    digits = K.trailing_mask(res)
    for r in range(1, res + 1):
        digits |= draw(st.integers(0, 6)) << ((K.MAX_RES - r) * K.DIGIT_BITS)
    return int(
        cnp.make_cell(np.array([base]), np.array([res]), np.array([digits]))[0]
    )


def arr(*xs):
    return np.array(xs, dtype=np.int64)


@given(cells())
@settings(max_examples=300, deadline=None)
def test_validity_and_accessor_roundtrip(c):
    a = arr(c)
    assert cnp.is_valid(a).all()
    assert 0 <= cnp.res(a)[0] <= 15
    assert 0 <= cnp.base_cell(a)[0] < 122
    rebuilt = cnp.make_cell(
        cnp.base_cell(a), cnp.res(a), a & np.int64(K.ALL_DIGIT_BITS)
    )
    assert rebuilt[0] == c


@given(cells(), st.integers(0, K.MAX_RES), st.integers(0, K.MAX_RES))
@settings(max_examples=300, deadline=None)
def test_to_parent_transitive(c, r1, r2):
    a = arr(c)
    res = int(cnp.res(a)[0])
    lo_r, hi_r = min(r1, r2), max(r1, r2)
    if hi_r > res:
        return
    via = cnp.to_parent(cnp.to_parent(a, hi_r), lo_r)
    direct = cnp.to_parent(a, lo_r)
    assert via[0] == direct[0]


@given(cells())
@settings(max_examples=300, deadline=None)
def test_lo_hi_bounds(c):
    a = arr(c)
    lo, hi = cnp.lo(a)[0], cnp.hi(a)[0]
    assert lo <= hi
    assert cnp.res(arr(lo))[0] == 15 and cnp.res(arr(hi))[0] == 15
    res = int(cnp.res(a)[0])
    # lo zeros / hi ones over 3*(15-res) trailing bits => exact width
    assert hi - lo == 8 ** (K.MAX_RES - res) - 1


@given(cells(), cells())
@settings(max_examples=300, deadline=None)
def test_related_iff_ranges_nest(a_, b_):
    a, b = arr(a_), arr(b_)
    related = bool(cnp.is_related(a, b)[0])
    alo, ahi = cnp.lo(a)[0], cnp.hi(a)[0]
    blo, bhi = cnp.lo(b)[0], cnp.hi(b)[0]
    overlap = alo <= bhi and ahi >= blo
    nested = (alo <= blo and ahi >= bhi) or (blo <= alo and bhi >= ahi)
    assert related == overlap == nested  # hierarchy: overlap <=> nesting


@given(cells(), st.integers(0, K.MAX_RES))
@settings(max_examples=300, deadline=None)
def test_parent_covers_child(c, r):
    a = arr(c)
    if r > int(cnp.res(a)[0]):
        assert cnp.to_parent(a, r)[0] == -1  # cannot demote
        return
    p = cnp.to_parent(a, r)
    assert cnp.lo(p)[0] <= cnp.lo(a)[0] and cnp.hi(p)[0] >= cnp.hi(a)[0]
    assert cnp.is_related(p, a)[0]


@given(st.lists(cells(), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_compaction_preserves_coverage(cs):
    """compact(X) covers exactly the same res-15 key set as
    ancestor-wins(X), for arbitrary random cell sets."""
    from hexspark.build import compact_np

    cells_arr = np.unique(np.array(cs, dtype=np.int64))
    # ancestor-wins: drop cells covered by another (numpy reference impl)
    keep = []
    for i, c in enumerate(cells_arr):
        covered = False
        for j, d in enumerate(cells_arr):
            if i != j and cnp.res(arr(d))[0] < cnp.res(arr(c))[0]:
                if cnp.lo(arr(d))[0] <= cnp.lo(arr(c))[0] and cnp.hi(arr(d))[0] >= cnp.hi(arr(c))[0]:
                    covered = True
                    break
        if not covered:
            keep.append(c)
    base = np.array(keep, dtype=np.int64)
    compacted, _ = compact_np(base, None, "set")

    def key_set(cs_):
        out = set()
        for c in cs_:
            out.add((int(cnp.lo(arr(c))[0]), int(cnp.hi(arr(c))[0])))
        return out

    # coverage equality: union of [lo,hi] ranges identical
    def total(cs_):
        ivs = sorted(key_set(cs_))
        merged = []
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    assert total(base) == total(compacted)
    # compacted leaves are pairwise non-related
    for i, c in enumerate(compacted):
        for j, d in enumerate(compacted):
            if i < j:
                assert not cnp.is_related(arr(c), arr(d))[0]
