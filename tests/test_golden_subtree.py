"""Named reference golden: descendants-sum over an enumerated map
(/root/reference/src/iteration.rs:340-399).

The reference builds a HexTreeMap from the res-12 ContainsCentroid
polyfill of the Eiffel-tower block with values = enumeration order,
asserts the subtree sum under the res-1 parent 0x811fbffffffffff is
**22,578**, and that two res-9 masks partition that sum.  The polyfill
needs real H3 geometry (h3o dev-dep); this sandbox has no h3 wheel and
no network, so:

* the *exact* Eiffel golden runs when a real ``h3`` lib is installed
  (skipped under the tests/fake_libs shim), and
* the same golden *structure* runs unconditionally on the reference's
  own real-H3 Monaco res-12 fixture (assets/monaco.res12.h3idx):
  enumerate the sorted cells, subtree-sum under the res-1 parents,
  assert n(n-1)/2, and assert the res-9 partition property.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark import build as bx
from hexspark import cells_np as cnp
from hexspark import join as jx
from hexspark.fixtures import ensure_fixtures


@pytest.fixture(scope="module")
def monaco(spark):
    paths = ensure_fixtures()
    return spark.read.parquet(paths["monaco_res12"]).cache()

EIFFEL_RES1_PARENT = 0x811FBFFFFFFFFFF
EIFFEL_WEST_RES9 = 0x891FB46741BFFFF
EIFFEL_EAST_RES9 = 0x891FB467413FFFF
EIFFEL_GOLDEN_SUM = 22578
# exterior ring (lon, lat) from /root/reference/src/iteration.rs:350-357
EIFFEL_POLY_LONLAT = [
    (2.2918576408729336, 48.85772170856845),
    (2.295281693366718, 48.86007711794011),
    (2.2968743826623665, 48.859023236935656),
    (2.293404431342765, 48.85672213596601),
    (2.2918484611075485, 48.85772774822141),
    (2.2918576408729336, 48.85772170856845),
]


def _enumerated_map(spark, cells: np.ndarray):
    cells = np.unique(cells)
    rows = [(int(c), i) for i, c in enumerate(cells)]
    df = spark.createDataFrame(rows, "cell: long, value: long")
    return bx.build_region(df, value_col="value", compactor="none"), len(cells)


def _subtree_total(region, probes_np, spark):
    probes = spark.createDataFrame(
        [(int(p),) for p in np.unique(probes_np)], "probe: long"
    )
    out = jx.subtree_agg(
        region, probes, [F.sum("value").alias("s")], probe_col="probe"
    ).collect()
    return {r["probe"]: r["s"] for r in out}


def test_monaco_enumerated_subtree_sum(spark, monaco):
    """Golden structure on real H3 cells: sum of 0..n-1 under the res-1
    parents == n(n-1)/2; any finer partition (res 9) sums identically."""
    raw = np.array([r["cell"] for r in monaco.collect()], dtype=np.int64)
    res12 = np.array(
        [r["cell"] for r in bx.uncompact_df(monaco, 12).collect()], dtype=np.int64
    )
    assert len(res12) == 7581  # FIXTURES.md: expansion of the 825 stored leaves
    region, n = _enumerated_map(spark, res12)
    want = n * (n - 1) // 2
    sums1 = _subtree_total(region, cnp.to_parent(res12, 1), spark)
    assert sum(sums1.values()) == want
    sums9 = _subtree_total(region, cnp.to_parent(res12, 9), spark)
    assert sum(sums9.values()) == want
    assert len(sums9) > len(sums1)  # genuinely finer partition


def test_eiffel_tower_descendants_sum_golden(spark):
    """The exact reference golden — needs real H3 (h3o/h3 polyfill)."""
    h3 = pytest.importorskip("h3")
    if getattr(h3, "__hexspark_fake__", False):
        pytest.skip("real h3 wheel not installed (shim active)")
    poly = h3.LatLngPoly([(lat, lon) for lon, lat in EIFFEL_POLY_LONLAT])
    cells = np.array(
        sorted(int(c, 16) for c in h3.h3shape_to_cells(poly, 12)), dtype=np.int64
    )
    region, n = _enumerated_map(spark, cells)
    total = _subtree_total(region, np.array([EIFFEL_RES1_PARENT]), spark)
    assert total[EIFFEL_RES1_PARENT] == EIFFEL_GOLDEN_SUM
    westeast = _subtree_total(
        region, np.array([EIFFEL_WEST_RES9, EIFFEL_EAST_RES9]), spark
    )
    assert sum(westeast.values()) == EIFFEL_GOLDEN_SUM
