"""hexspark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of
JayKickliter/HexTree (compacted hierarchical H3 cell sets/maps with
nearest-ancestor lookup) as idiomatic Spark: cells are BIGINT columns,
cell math is native Column expressions, region tables are broadcast
DataFrames of compacted leaves, and lookups are joins.
"""

__version__ = "0.1.0"
