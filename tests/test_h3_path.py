"""Executed coverage for the production real-H3 encoder path (J5).

The sandbox has no real ``h3`` wheel; conftest puts tests/fake_libs
(a deterministic shim, clearly marked ``__hexspark_fake__``) on
sys.path + PYTHONPATH so hexspark.geo's gated import resolves and the
UDF body runs for real — broadcast batch path, scalar-only fallback,
and the reference golden cell 0x85283473fffffff round-trip
(/root/reference/src/cell.rs golden vectors).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import h3 as _h3
from h3.api import numpy_int as _h3n

from hexspark import cells as cx
from hexspark import geo
from hexspark.geo import _h3_encode_batch, grid_encode_np, h3_encode_udf

RNG = np.random.default_rng(23)
LAT = RNG.uniform(-89, 89, 64)
LON = RNG.uniform(-179, 179, 64)


def test_shim_active():
    assert geo.HAS_H3
    assert getattr(_h3, "__hexspark_fake__", False)


def test_batch_broadcast_path():
    got = _h3_encode_batch(LAT, LON, 9)
    assert got.dtype == np.int64
    assert (got == grid_encode_np(LAT, LON, 9).astype(np.int64)).all()


def test_batch_scalar_fallback(monkeypatch):
    """Scalar-only builds raise TypeError on arrays → per-element loop."""
    monkeypatch.setattr(_h3n, "SCALAR_ONLY", True)
    got = _h3_encode_batch(LAT[:16], LON[:16], 7)
    assert (got == grid_encode_np(LAT[:16], LON[:16], 7).astype(np.int64)).all()


def test_udf_end_to_end(spark):
    """The pandas UDF itself runs on executors (worker import path)."""
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LAT, LON)], "lat: double, lon: double"
    )
    enc = h3_encode_udf(11)
    got = [r["c"] for r in df.select(enc(F.col("lat"), F.col("lon")).alias("c")).collect()]
    want = grid_encode_np(LAT, LON, 11).astype(np.int64).tolist()
    assert got == want


def test_golden_cell_roundtrip(spark):
    """Reference golden 0x85283473fffffff through the production UDF:
    encode its true center, then take the engine's bit ops apart —
    mode/res/base/digits must match /root/reference/src/cell.rs:344-367."""
    df = spark.createDataFrame(
        [(_h3n.GOLDEN_LAT, _h3n.GOLDEN_LON)], "lat: double, lon: double"
    )
    enc = h3_encode_udf(5)
    out = df.select(
        enc(F.col("lat"), F.col("lon")).alias("cell")
    ).select(
        "cell",
        cx.res("cell").alias("r"),
        cx.base_cell("cell").alias("b"),
        *[cx.digit("cell", i).alias(f"d{i}") for i in range(1, 6)],
        cx.to_hex("cell").alias("hex"),
    ).collect()[0]
    assert out["cell"] == 0x85283473FFFFFFF
    assert out["r"] == 5 and out["b"] == 20
    assert [out[f"d{i}"] for i in range(1, 6)] == [0, 6, 4, 3, 4]
    assert out["hex"] == "85283473fffffff"


def test_udf_raises_cleanly_without_h3(monkeypatch):
    monkeypatch.setattr(geo, "HAS_H3", False)
    with pytest.raises(ImportError):
        h3_encode_udf(9)
