"""osmquadtree_rust_spark — a PySpark-native spatial-join + tiling engine.

Re-creates the capabilities of jharris2268/osmquadtree-rust (quadtree-cell
assignment, weight-balanced tile grouping, sort/merge-into-tiles, bbox and
polygon spatial filtering, snapshot merge, incremental update) as an
idiomatic Spark DataFrame engine, generalized to hierarchical-cell-indexed
spatial joins over image+caption tables, plus the dedup / similarity /
text-analysis operators a large-scale training-data pipeline needs.
"""

__version__ = "0.1.0"
