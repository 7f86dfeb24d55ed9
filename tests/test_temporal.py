"""as-of join + bucketed range join semantics."""

from pyspark.sql import functions as F

from osmquadtree_rust_spark.operators import temporal as TMP


def test_asof_join_semantics(spark):
    ev = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 150), (5, 30, 500)],
        "event_id long, user_id long, ets long",
    )
    upd = spark.createDataFrame(
        # user 10: updates at 100 (tie with event 1), 200, 400
        # user 20: update only AFTER its event -> NULL
        [(10, 100, 1.0), (10, 200, 2.0), (10, 400, 4.0), (20, 999, 9.0)],
        "user_id long, ets long, price double",
    )
    got = {
        r.event_id: r.price
        for r in TMP.asof_join(ev, upd, key="user_id", ts="ets").collect()
    }
    assert got == {
        1: 1.0,   # tie: update at ts == event ts counts (<=)
        2: 2.0,   # latest at 205 is the 200 update
        3: 2.0,   # 400 is in the future
        4: None,  # no update at or before 150
        5: None,  # user with no updates at all
    }


def test_bucketed_range_join(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 05:00:00"),
         (3, "2024-01-01 07:59:59"), (4, "2024-01-01 08:00:00")],
        "event_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    iv = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-01 08:00:00"),
         (200, "2024-01-01 04:30:00", "2024-01-01 05:30:00")],
        "iv_id long, s string, e string",
    ).select(
        "iv_id",
        F.to_timestamp("s").alias("start"),
        F.to_timestamp("e").alias("end"),
    )
    got = sorted(
        (r.event_id, r.iv_id)
        for r in TMP.bucketed_range_join(ev, iv, "ts", "start", "end").collect()
    )
    # event 4 at 08:00:00 is OUTSIDE [.., 08:00) — half-open interval
    assert got == [(1, 100), (2, 100), (2, 200), (3, 100)]
    # plan shape: the join is an equi-join on the bucket, not a theta join
    plan = TMP.bucketed_range_join(ev, iv)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
