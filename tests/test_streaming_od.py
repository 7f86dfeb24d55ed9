"""Stateful streaming OD trips: cross-batch trip carry + exact batch
equivalence with trajectory.od_matrix."""

import collections
import os
import shutil

from osmquadtree_rust_spark.streaming import od as SO

SCHEMA = "user_id long, event_id long, ts long, lon long, lat long"

H = 3600 * 1_000_000


def _write_batch(spark, indir, name, rows):
    tmp = f"{indir}/tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(f"{tmp}/{f}", f"{indir}/{name}.parquet")
    shutil.rmtree(tmp)


def _run_stream(spark, indir, ckpt, name, gap):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    q = (
        SO.stream_od(stream, max_gap_us=gap, chars=6)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_od_matches_batch(spark, tmp_path):
    import random

    from osmquadtree_rust_spark.operators.trajectory import od_matrix

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    # seeded random walk: trips span batch boundaries, positions spread
    # across cells; a final long-silence point per user CLOSES the last
    # real trip so only one sentinel trip per user stays open in state
    rng = random.Random(7)
    rows, eid = [], 0
    for u in range(5):
        t = 0
        for _ in range(rng.randrange(4, 25)):
            t += rng.choice((10, 30 * 60, 2 * 3600, 9 * 3600)) * 1_000_000
            rows.append(
                (u, eid, t,
                 rng.randrange(-1_800_000_000, 1_800_000_000),
                 rng.randrange(-900_000_000, 900_000_000))
            )
            eid += 1
        rows.append((u, eid, t + 100 * H, 0, 0))  # sentinel closer
        eid += 1
    rows.sort(key=lambda r: r[2])
    third = len(rows) // 3
    _write_batch(spark, indir, "b1", rows[:third])
    _write_batch(spark, indir, "b2", rows[third:2 * third])
    _write_batch(spark, indir, "b3", rows[2 * third:])

    got = _run_stream(spark, indir, ckpt, "od_out", 6 * H)

    # closed stream trips + the one open sentinel trip per user must
    # aggregate EXACTLY to the batch od_matrix counts
    agg = collections.Counter()
    for r in got:
        agg[(r.o_x, r.o_y, r.d_x, r.d_y)] += 1
    for u in range(5):  # flush: each sentinel is a 1-point open trip at (0,0)
        from osmquadtree_rust_spark.streaming.od import cell_xy_np

        x, y = cell_xy_np([0], [0], 6)
        agg[(int(x[0]), int(y[0]), int(x[0]), int(y[0]))] += 1
    batch = {
        (r["o_x"], r["o_y"], r["d_x"], r["d_y"]): r["n_trips"]
        for r in od_matrix(
            spark.createDataFrame(rows, SCHEMA),
            ts_col="ts", max_gap_us=6 * H, chars=6,
        ).collect()
    }
    assert dict(agg) == batch


def test_stream_od_trip_spans_batches(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)
    # one trip whose points straddle the batch boundary, closed by a
    # 10 h silence in batch 2: must emit exactly ONE record with the
    # origin from batch 1 and destination from batch 2
    b1 = [(1, 0, 1 * H, 100, 100), (1, 1, 2 * H, 50_000_000, 100)]
    b2 = [(1, 2, 3 * H, 100_000_000, 200), (1, 3, 20 * H, 500, 500)]
    _write_batch(spark, indir, "b1", b1)
    _write_batch(spark, indir, "b2", b2)
    got = _run_stream(spark, indir, ckpt, "od_span", 6 * H)
    assert len(got) == 1
    r = got[0]
    from osmquadtree_rust_spark.streaming.od import cell_xy_np

    ox, oy = cell_xy_np([100], [100], 6)
    dx, dy = cell_xy_np([100_000_000], [200], 6)
    assert (r.user_id, r.o_x, r.o_y, r.d_x, r.d_y,
            r.start_us, r.end_us, r.n_points) == (
        1, int(ox[0]), int(oy[0]), int(dx[0]), int(dy[0]), 1 * H, 3 * H, 3,
    )
