"""Shimmed ``h3.api.numpy_int``: deterministic latlng_to_cell.

Vectorized over numpy arrays like the real broadcasting builds; set
``SCALAR_ONLY = True`` to emulate a scalar-only build (array input then
raises TypeError, exercising the chunked fallback in
hexspark.geo._h3_encode_batch).

Pinned golden: the H3 documentation example cell 0x85283473fffffff
(res 5, base 20, digits [0,6,4,3,4] — /root/reference/src/cell.rs
golden vectors) is returned for its true center coordinate, so the
production UDF path can be round-tripped against real H3 bit patterns.
"""

import numpy as np

SCALAR_ONLY = False

GOLDEN_CELL = np.uint64(0x85283473FFFFFFF)
GOLDEN_LAT = 37.345793375368
GOLDEN_LON = -121.976375972551
GOLDEN_RES = 5


def _grid(lat, lon, res):
    from hexspark.geo import grid_encode_np

    return grid_encode_np(
        np.asarray(lat, dtype=np.float64), np.asarray(lon, dtype=np.float64), res
    ).astype(np.uint64)


def latlng_to_cell(lat, lon, res):
    # scalar inputs always take the scalar path, in both shim modes
    if np.ndim(lat) == 0:
        return np.uint64(_scalar(float(lat), float(lon), res))
    if SCALAR_ONLY:
        raise TypeError("latlng_to_cell: scalar-only build (shim)")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    cells = _grid(lat, lon, res)
    if res == GOLDEN_RES:
        hit = (np.abs(lat - GOLDEN_LAT) < 1e-9) & (np.abs(lon - GOLDEN_LON) < 1e-9)
        cells = np.where(hit, GOLDEN_CELL, cells)
    return cells


def _scalar(lat: float, lon: float, res: int):
    if (
        res == GOLDEN_RES
        and abs(lat - GOLDEN_LAT) < 1e-9
        and abs(lon - GOLDEN_LON) < 1e-9
    ):
        return GOLDEN_CELL
    return _grid(np.array([lat]), np.array([lon]), res)[0]
