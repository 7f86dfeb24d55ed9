"""Stateful streaming dwell detection: cross-batch run carry + exact
batch equivalence with trajectory.dwell_episodes."""

import os
import shutil

from osmquadtree_rust_spark.streaming import dwell as SD

SCHEMA = "user_id long, event_id long, ts long, lon long, lat long"

M = 60 * 1_000_000


def _write_batch(spark, indir, name, rows):
    tmp = f"{indir}/tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(f"{tmp}/{f}", f"{indir}/{name}.parquet")
    shutil.rmtree(tmp)


def test_stream_dwell_matches_batch(spark, tmp_path):
    from osmquadtree_rust_spark.operators.trajectory import dwell_episodes

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    # user 1: a stay that SPANS the batch boundary (0..30min in batch 1,
    # 40..50min still parked in batch 2, closed by a 10 km hop at 60min);
    # user 2: a within-batch-1 stay closed in batch 1, then nothing.
    b1 = [
        (1, 1, 0 * M, 1000, 2000),
        (1, 2, 10 * M, 1200, 2100),
        (1, 3, 30 * M, 1100, 1900),
        (2, 10, 0 * M, 5000, 5000),
        (2, 11, 20 * M, 5100, 5050),
        (2, 12, 25 * M, 5000 + 3_000_000, 5000),  # hop closes the stay
    ]
    b2 = [
        (1, 4, 40 * M, 1300, 2050),
        (1, 5, 50 * M, 1250, 2000),
        (1, 6, 60 * M, 1000 + 900_000, 2000),  # 10 km hop closes it
    ]
    _write_batch(spark, indir, "b1", b1)
    _write_batch(spark, indir, "b2", b2)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    q = (
        SD.stream_dwell(
            stream, eps_mm=150_000, max_gap_us=60 * M, min_dwell_us=15 * M
        )
        .writeStream.format("memory")
        .queryName("dwell_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.dwell_us, r.n_points)
        for r in spark.sql("SELECT * FROM dwell_out").collect()
    )
    # user 1's single episode spans the batch boundary: 0..50min, 5 pts
    assert got == [
        (1, 0, 50 * M, 50 * M, 5),
        (2, 0, 20 * M, 20 * M, 2),
    ]

    # batch equivalence: every run was closed by a hop, so the completed
    # stream equals the batch operator over the union of all inputs
    union = spark.createDataFrame(b1 + b2, SCHEMA)
    batch = sorted(
        (r["user_id"], r["start_us"], r["end_us"], r["dwell_us"], r["n_points"])
        for r in dwell_episodes(
            union,
            ts_col="ts",
            eps_mm=150_000,
            max_gap_us=60 * M,
            min_dwell_us=15 * M,
        ).collect()
    )
    assert got == batch
