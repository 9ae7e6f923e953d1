"""Reference fixture ingestion → Parquet.

Converts the reference's geometry fixtures (read-only data assets, not
code) into Parquet tables under ``fixtures/`` so every test and bench
reads them the same way the engine reads any region table:

* ``monaco_res12``: 825 res-12 cells, raw little-endian u64
  (/root/reference/assets/monaco.res12.h3idx — S1 load pattern,
  /root/reference/src/hex_tree_map.rs:31-37)
* ``us915_compact``: 42,383 compacted cells as hex strings
  (/root/reference/assets/us915.kepler.csv — S2 load pattern)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REFERENCE_ASSETS = "/root/reference/assets"
FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def _write(name: str, cells: np.ndarray) -> str:
    path = os.path.join(FIXTURES_DIR, f"{name}.parquet")
    tbl = pa.table({"cell": pa.array(cells.astype(np.int64), type=pa.int64())})
    pq.write_table(tbl, path)
    return path


def load_h3idx(path: str) -> np.ndarray:
    """S1: raw little-endian u64 cell file."""
    with open(path, "rb") as f:
        return np.frombuffer(f.read(), dtype="<u8").astype(np.int64)


def load_kepler_csv(path: str) -> np.ndarray:
    """S2: one lowercase-hex cell per line, header ``h3_id``."""
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    assert lines[0] == "h3_id"
    return np.array([int(h, 16) for h in lines[1:] if h], dtype=np.int64)


def load_boundary_geojson(path: str) -> list[tuple[float, float]]:
    """Parse a single-polygon GeoJSON boundary into [(lat, lon), ...]
    (geojson stores [lon, lat])."""
    import json

    with open(path) as f:
        gj = json.load(f)
    geom = gj["features"][0]["geometry"]
    assert geom["type"] == "Polygon"
    ring = geom["coordinates"][0]
    return [(float(lat), float(lon)) for lon, lat in ring]


def monaco_boundary() -> list[tuple[float, float]]:
    return load_boundary_geojson(
        os.path.join(REFERENCE_ASSETS, "monaco.boundary.geojson")
    )


def ensure_fixtures() -> dict[str, str]:
    """Materialize fixture parquet files if missing; return name→path."""
    os.makedirs(FIXTURES_DIR, exist_ok=True)
    out = {}
    monaco = os.path.join(FIXTURES_DIR, "monaco_res12.parquet")
    if not os.path.exists(monaco):
        cells = load_h3idx(os.path.join(REFERENCE_ASSETS, "monaco.res12.h3idx"))
        _write("monaco_res12", cells)
    out["monaco_res12"] = monaco
    us915 = os.path.join(FIXTURES_DIR, "us915_compact.parquet")
    if not os.path.exists(us915):
        cells = load_kepler_csv(os.path.join(REFERENCE_ASSETS, "us915.kepler.csv"))
        _write("us915_compact", cells)
    out["us915_compact"] = us915
    return out
