"""Exact distribution statistics for dataset profiling.

Rank-based quantiles (percentile_disc semantics plus an exact doubled
median) computed with window functions — integer-exact, so Spark and
DuckDB agree bit-for-bit, unlike approx_percentile/quantile built-ins
whose sketches differ per engine.  One shuffle on the group key; the
per-group sort is the same work any exact quantile requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group: str,
    value: str,
    id_col: str,
) -> DataFrame:
    """Per-group (n, min, max, median_x2, p90) of an integer column.

    median_x2 = value[(n+1)//2] + value[(n+2)//2] (1-indexed ranks) — the
    doubled median is an exact integer for both parities; p90 is
    percentile_disc(0.9): the value at rank ceil(0.9 * n).  Ties broken
    by id for full determinism."""
    w = Window.partitionBy(group).orderBy(F.col(value), F.col(id_col))
    ranked = df.select(
        F.col(group),
        F.col(value).cast("long").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group)).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    p90 = F.ceil(F.col("n") * 9 / 10)
    return ranked.groupBy(group).agg(
        F.max("n").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum(
            F.when((F.col("rn") == lo) | (F.col("rn") == hi), F.col("v")).otherwise(
                F.lit(0)
            )
        ).alias("__mraw"),
        F.sum(F.when(F.col("rn") == p90, F.col("v")).otherwise(F.lit(0))).alias("p90"),
    ).withColumn(
        "median_x2",
        F.when(F.col("n") % 2 == 1, F.col("__mraw") * 2).otherwise(F.col("__mraw")),
    ).select(group, "n", "vmin", "vmax", "median_x2", "p90")
