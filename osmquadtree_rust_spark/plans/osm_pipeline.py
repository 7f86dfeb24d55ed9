"""End-to-end OSM-shaped tiling: calcqts -> weight-balanced groups ->
tile routing (the reference's calcqts + sortblocks chain).

Weight model: nodes + 8*ways + 20*relations
(reference src/elements/primitive_block.rs:134-136); group histogram at
level 17 (prep_block, prepgraph.rs:53-101); routing = deepest group
ancestor (QuadtreeTree::find).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import qt_numpy as qtn
from ..functions import qt_spark as qs
from ..operators import calcqts as C
from . import pipeline as P

WEIGHTS = {0: 1, 1: 8, 2: 20}  # node, way, relation


def element_qts(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame
) -> DataFrame:
    """(etype, id, qt) for every element."""
    nq, wq, rq = C.calc_qts(nodes, ways, relations)
    return (
        nq.select(F.lit(0).alias("etype"), "id", "qt")
        .unionByName(wq.select(F.lit(1).alias("etype"), "id", "qt"))
        .unionByName(rq.select(F.lit(2).alias("etype"), "id", "qt"))
    )


def tile_elements(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    target: int = P.DEFAULT_TARGET,
    graph_level: int = qtn.QT_GRAPH_LEVEL,
) -> tuple[DataFrame, np.ndarray]:
    """Full chain; returns ((etype,id,qt,tile), group cells).  The final
    store is written sorted by (etype, id) within tile partitions —
    the reference's global element order (traits.rs:52-59)."""
    eq = element_qts(nodes, ways, relations)
    weight = F.when(F.col("etype") == 0, 1).when(F.col("etype") == 1, 8).otherwise(20)
    assigned, groups = P.assign_tiles(
        eq.withColumn("w", weight), "qt", "w", target, graph_level
    )
    return assigned.select("etype", "id", "qt", "tile"), groups


def write_element_tiles(assigned: DataFrame, path: str) -> None:
    (
        assigned.repartition(F.col("tile"))
        .sortWithinPartitions("etype", "id")
        .write.mode("overwrite")
        .partitionBy("tile")
        .parquet(path)
    )
