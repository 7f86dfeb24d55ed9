"""Stateful streaming speed alerts: cross-batch segment carry + exact
batch equivalence with trajectory.speeding_segments."""

import collections
import os
import shutil

from osmquadtree_rust_spark.streaming import speeding as SP

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


def _run_stream(spark, indir, ckpt, name, vmax):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    q = (
        SP.stream_speeding(stream, vmax, max_span_fixed=200_000)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_speeding_matches_batch(spark, tmp_path):
    import random

    from osmquadtree_rust_spark.operators.trajectory import speeding_segments

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    rng = random.Random(5)
    rows, eid = [], 0
    for u in range(6):
        t, x, y = 0, 0, 0
        for _ in range(rng.randrange(6, 28)):
            t += rng.choice((500_000, 5_000_000, 600_000_000))
            x += rng.randint(-60_000, 60_000)
            y += rng.randint(-50_000, 50_000)
            if rng.random() < 0.1:
                x += 400_000  # teleport
            rows.append((u, eid, t, x, y))
            eid += 1
    rows.sort(key=lambda r: r[2])
    third = len(rows) // 3
    _write_batch(spark, indir, "b1", rows[:third])
    _write_batch(spark, indir, "b2", rows[third:2 * third])
    _write_batch(spark, indir, "b3", rows[2 * third:])

    vmax = 20_000
    alerts = _run_stream(spark, indir, ckpt, "spd_out", vmax)
    got = collections.Counter(r.user_id for r in alerts)
    batch = {
        r["user_id"]: r["n_speeding"]
        for r in speeding_segments(
            spark.createDataFrame(rows, SCHEMA), vmax, max_span_fixed=200_000
        ).collect()
        if r["n_speeding"] > 0
    }
    assert dict(got) == batch and batch  # non-trivial


def test_stream_speeding_violation_spans_batches(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    # batch 1 ends at (0,0); batch 2 opens 10_000 units away 1s later —
    # the cross-batch segment must alert exactly once, keyed by the
    # closing event
    _write_batch(spark, indir, "b1", [(1, 0, 1_000_000, 0, 0)])
    _write_batch(spark, indir, "b2", [(1, 1, 2_000_000, 10_000, 0)])
    got = _run_stream(spark, indir, ckpt, "spd_span", 30_000)
    assert len(got) == 1
    r = got[0]
    assert (r.user_id, r.event_id, r.ts, r.dt_us) == (1, 1, 2_000_000, 1_000_000)
    assert 100_000 < r.chord_mm < 120_000
