"""Bucketed storage for co-located joins.

At 100 TB, joins between the element store and per-element side tables
(cell assignments, dedup verdicts, embeddings) should not reshuffle the
big side every query.  Writing both sides bucketed by the join key lets
Spark plan a sort-merge join with NO Exchange on either side (verified by
tests/test_bucketing.py, which asserts the physical plan is
exchange-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
