"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full tile-assignment pipeline on the sf0.001-
                scale synthetic image-footprint table (footprint -> qt cell
                -> weight-balanced tile via the find_tree_groups port).
queries()     — one entry per implemented operator (SURVEY.md §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB SQL equivalents (osmquadtree_rust_spark.gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmquadtree_rust_spark import gate as _gate  # noqa: E402
from osmquadtree_rust_spark import gate_text as _gate_text  # noqa: E402  (registers entries)
from osmquadtree_rust_spark.shipping import ensure_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tile assignment + per-tile rollup at smoke scale."""
    from pyspark.sql import functions as F

    from osmquadtree_rust_spark.plans import pipeline as P

    ensure_shipped(spark)
    assigned, _groups = P.tile_synthetic_images(spark, 6000, target=2000)
    return (
        assigned.groupBy("tile")
        .agg(
            F.count("*").alias("n_images"),
            F.min("qt").alias("min_qt"),
            F.max("qt").alias("max_qt"),
        )
        .orderBy("tile")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)  # --py-files pattern for foreign sessions
            return fn(spark, sf_dir)

        return run

    return {
        name: wrap(spec["spark"])
        for name, spec in _gate.GATE.items()
        if "spark" in spec
    }


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, spec in _gate.GATE.items():
        if "oracle" in spec and "spark" in spec:
            out[name] = spec["oracle"]()
    return out
