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


def test_asof_join_null_payload_not_resurrected(spark):
    """The latest update wins ATOMICALLY: a genuinely-NULL payload value
    in the newest update must come through as NULL (not resurrect an
    older value), and multiple payload columns must never be stitched
    from different updates."""
    ev = spark.createDataFrame([(1, 10, 300)], "event_id long, user_id long, ets long")
    upd = spark.createDataFrame(
        [(10, 100, 5.0, 50), (10, 200, None, 70)],
        "user_id long, ets long, price double, qty long",
    )
    r = TMP.asof_join(ev, upd, key="user_id", ts="ets").collect()[0]
    assert r.price is None and r.qty == 70  # both from the ts=200 update


def test_asof_join_rejects_colliding_payload(spark):
    import pytest

    ev = spark.createDataFrame([(1, 10, 1)], "event_id long, user_id long, ets long")
    upd = spark.createDataFrame(
        [(10, 1, 2)], "user_id long, ets long, event_id long"
    )
    with pytest.raises(ValueError, match="collide"):
        TMP.asof_join(ev, upd, key="user_id", ts="ets")


def test_bucketed_range_join_ignores_degenerate_intervals(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00")], "event_id long, ts_s string"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
         (2, "2024-01-01 02:00:00", "2024-01-01 00:00:00"),   # inverted
         (3, "2024-01-01 01:00:00", "2024-01-01 01:00:00")],  # empty
        "iv_id long, s string, e string",
    ).select("iv_id", F.to_timestamp("s").alias("start"), F.to_timestamp("e").alias("end"))
    got = [(r.event_id, r.iv_id) for r in TMP.bucketed_range_join(ev, iv).collect()]
    assert got == [(1, 1)]


def test_connected_components_guards(spark):
    import pytest

    from osmquadtree_rust_spark.operators.dedup import connected_components

    sverts = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    pairs = spark.createDataFrame([], "a long, b long")
    with pytest.raises(TypeError, match="integral"):
        connected_components(sverts, pairs)

    # a long chain must either converge or raise loudly — never return
    # silently split components
    verts = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    chain = spark.createDataFrame([(i, i + 1) for i in range(7)], "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(verts, chain, max_iter=2)
    ok = connected_components(verts, chain, max_iter=10)
    assert {r.comp for r in ok.collect()} == {0}


def test_asof_tolerance_cuts_stale_matches(spark):
    from pyspark.sql import functions as F

    from osmquadtree_rust_spark.operators.temporal import asof_join

    ev = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 100)], "id long, ts long"
    )
    up = spark.createDataFrame([(1, 90, 5.0)], "id long, ts long, px double")
    out = {(r.id, r.ts): r.px for r in asof_join(ev, up, tolerance=50).collect()}
    assert out[(1, 100)] == 5.0      # 10 old, fresh
    assert out[(1, 200)] is None     # 110 old, stale -> NULL
    assert out[(2, 100)] is None     # never matched
    # exact boundary is inclusive (uts >= ts - tol)
    out2 = {(r.id, r.ts): r.px for r in asof_join(ev, up, tolerance=110).collect()}
    assert out2[(1, 200)] == 5.0
    import pytest as _pt

    with _pt.raises(ValueError, match="tolerance"):
        asof_join(ev, up, tolerance=-1)


def test_asof_bucketed_tolerance_matches_plain(spark):
    """The skew-safe form must honor tolerance identically to asof_join,
    including across bucket boundaries (carried seeds keep the ORIGINAL
    update ts, not the bucket start)."""
    import numpy as np
    import pandas as pd

    from osmquadtree_rust_spark.operators.temporal import (
        asof_join,
        asof_join_bucketed,
    )

    rng = np.random.RandomState(5)
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": rng.randint(0, 6, 500).astype(np.int64),
                "ts": rng.randint(0, 100000, 500).astype(np.int64),
            }
        )
    ).distinct()
    up = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": rng.randint(0, 6, 60).astype(np.int64),
                "ts": rng.randint(0, 100000, 60).astype(np.int64),
                "px": rng.rand(60),
            }
        )
    ).dropDuplicates(["id", "ts"])
    for tol in (None, 5000, 40000):
        a = {
            (r.id, r.ts): r.px
            for r in asof_join(ev, up, tolerance=tol).collect()
        }
        b = {
            (r.id, r.ts): r.px
            for r in asof_join_bucketed(
                ev, up, bucket=7000, tolerance=tol
            ).collect()
        }
        assert a == b, tol


def test_asof_bucketed_handles_map_payload(spark):
    """Map-typed payloads are not orderable; the bucketed form must use
    max_by on ts alone, matching plain asof_join."""
    from osmquadtree_rust_spark.operators.temporal import (
        asof_join,
        asof_join_bucketed,
    )

    ev = spark.createDataFrame(
        [(1, 100), (1, 9000), (2, 50)], "id long, ts long"
    )
    up = spark.createDataFrame(
        [(1, 90, {"a": "x"}), (1, 8000, {"a": "y"})],
        "id long, ts long, attrs map<string,string>",
    )
    a = {(r.id, r.ts): r.attrs for r in asof_join(ev, up).collect()}
    b = {
        (r.id, r.ts): r.attrs
        for r in asof_join_bucketed(ev, up, bucket=1000).collect()
    }
    assert a == b
    assert a[(1, 100)] == {"a": "x"} and a[(1, 9000)] == {"a": "y"}
    assert a[(2, 50)] is None
