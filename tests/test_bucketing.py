"""Bucketed co-located join: no Exchange on either side."""

import os

from pyspark.sql import functions as F

from osmquadtree_rust_spark.plans import bucketing as B


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(20000).select(
            F.col("id"), (F.col("id") * 31 % 997).alias("qt")
        )
        right = spark.range(20000).select(
            F.col("id"), (F.col("id") % 7).alias("verdict")
        )
        B.write_bucketed(left, "b_left", "id", n_buckets=8, sort_col="id")
        B.write_bucketed(right, "b_right", "id", n_buckets=8, sort_col="id")

        joined = B.bucketed_join(spark, "b_left", "b_right", "id")
        assert joined.count() == 20000
        assert not B.plan_has_exchange(joined), "bucketed join still shuffles"

        # control: the same join over unbucketed frames DOES exchange
        plain = left.join(right, "id")
        assert B.plan_has_exchange(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
