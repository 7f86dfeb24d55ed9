"""Stateful streaming road transitions: cross-batch carry + exact batch
equivalence with map_match.route_edges (no flush needed — transitions
leave nothing open)."""

import collections
import os
import shutil

from osmquadtree_rust_spark.streaming import routes as SR

SCHEMA = "user_id long, event_id long, ts long, road_id long"


def _write_batch(spark, indir, name, rows):
    tmp = f"{indir}/tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(f"{tmp}/{f}", f"{indir}/{name}.parquet")
    shutil.rmtree(tmp)


def _run_stream(spark, indir, ckpt, name):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    q = (
        SR.stream_routes(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_routes_matches_batch(spark, tmp_path):
    import random

    from osmquadtree_rust_spark.operators.map_match import route_edges

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    rng = random.Random(11)
    rows, eid = [], 0
    for u in range(6):
        t = 0
        for _ in range(rng.randrange(5, 30)):
            t += rng.randrange(1, 1000)
            rows.append((u, eid, t, rng.randrange(4)))  # 4 roads, many runs
            eid += 1
    rows.sort(key=lambda r: r[2])
    third = len(rows) // 3
    _write_batch(spark, indir, "b1", rows[:third])
    _write_batch(spark, indir, "b2", rows[third:2 * third])
    _write_batch(spark, indir, "b3", rows[2 * third:])

    got = collections.Counter()
    for r in _run_stream(spark, indir, ckpt, "routes_out"):
        got[(r.road_from, r.road_to)] += 1
    batch = {
        (r["road_from"], r["road_to"]): r["n_trans"]
        for r in route_edges(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert dict(got) == batch and batch  # non-trivial


def test_stream_routes_transition_spans_batches(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    # user stays on road 5 through batch 1; batch 2 opens on road 9 —
    # the cross-batch transition must be emitted exactly once
    _write_batch(spark, indir, "b1", [(1, 0, 10, 5), (1, 1, 20, 5)])
    _write_batch(spark, indir, "b2", [(1, 2, 30, 9), (1, 3, 40, 9)])
    got = _run_stream(spark, indir, ckpt, "routes_span")
    assert len(got) == 1
    r = got[0]
    assert (r.user_id, r.road_from, r.road_to, r.ts) == (1, 5, 9, 30)
