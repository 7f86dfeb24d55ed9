"""Stateful streaming cell flows: cross-batch step carry + exact batch
equivalence with trajectory.flow_matrix (no flush — nothing open)."""

import collections
import os
import shutil

from osmquadtree_rust_spark.streaming import flows as SF

SCHEMA = "user_id long, event_id long, ts long, lon long, lat long"


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
        SF.stream_flows(stream, chars=6, max_span_fixed=200_000)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_flows_matches_batch(spark, tmp_path):
    import random

    from osmquadtree_rust_spark.operators.trajectory import flow_matrix

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    rng = random.Random(9)
    rows, eid = [], 0
    for u in range(6):
        t, x, y = 0, 0, 0
        for _ in range(rng.randrange(8, 30)):
            t += rng.randrange(1, 1000)
            x += rng.randint(-150_000, 150_000)
            y += rng.randint(-120_000, 120_000)
            if rng.random() < 0.1:
                x += 500_000  # teleport
            rows.append((u, eid, t, x, y))
            eid += 1
    rows.sort(key=lambda r: r[2])
    third = len(rows) // 3
    _write_batch(spark, indir, "b1", rows[:third])
    _write_batch(spark, indir, "b2", rows[third:2 * third])
    _write_batch(spark, indir, "b3", rows[2 * third:])

    got = collections.Counter()
    for r in _run_stream(spark, indir, ckpt, "flows_out"):
        got[(r.from_x, r.from_y, r.to_x, r.to_y)] += 1
    batch = {
        (r["from_x"], r["from_y"], r["to_x"], r["to_y"]): r["n_steps"]
        for r in flow_matrix(
            spark.createDataFrame(rows, SCHEMA),
            chars=6, max_span_fixed=200_000,
        ).collect()
    }
    assert dict(got) == batch and batch


def test_stream_flows_step_spans_batches(spark, tmp_path):
    from osmquadtree_rust_spark.streaming.od import cell_xy_np

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    _write_batch(spark, indir, "b1", [(1, 0, 10, 0, 0)])
    _write_batch(spark, indir, "b2", [(1, 1, 20, 150_000, 0)])
    got = _run_stream(spark, indir, ckpt, "flows_span")
    assert len(got) == 1
    fx, fy = cell_xy_np([0], [0], 6)
    tx, ty = cell_xy_np([150_000], [0], 6)
    r = got[0]
    assert (r.from_x, r.from_y, r.to_x, r.to_y, r.ts) == (
        int(fx[0]), int(fy[0]), int(tx[0]), int(ty[0]), 20,
    )
