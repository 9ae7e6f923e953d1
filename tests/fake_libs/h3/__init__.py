"""Deterministic test shim for the ``h3`` python library.

NOT real H3 geometry — a stand-in so the production real-H3 encoder
path (hexspark.geo.h3_encode_udf / _h3_encode_batch) has *executed*
coverage in a sandbox without the h3 wheel.  ``latlng_to_cell``
delegates to the engine's GridEncoder (valid H3 bit layouts, exact
hierarchy), except for pinned reference golden coordinates which map to
their true H3 cells so golden round-trips exercise real bit patterns.

Tests that need REAL H3 output (e.g. the Eiffel-tower polyfill golden)
must check ``__hexspark_fake__`` and skip when this shim is active.
"""

__hexspark_fake__ = True
__version__ = "0.0-hexspark-shim"
