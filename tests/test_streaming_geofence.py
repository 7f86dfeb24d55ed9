"""Stateful streaming geofence transitions (applyInPandasWithState):
cross-batch flip detection + exact batch equivalence."""

import os
import shutil

from osmquadtree_rust_spark.streaming import geofence as SG

SCHEMA = "user_id long, event_id long, ts long, lon long, lat long"

# unit square fence, fixed-point 1e-7 deg: (0,0)..(1deg,1deg)
_FVX = [0.0, 1.0, 1.0, 0.0]
_FVY = [0.0, 0.0, 1.0, 1.0]

IN_PT = (5_000_000, 5_000_000)     # 0.5, 0.5 deg — inside
OUT_PT = (25_000_000, 5_000_000)   # 2.5 deg lon — outside


def _write_batch(spark, indir, name, rows):
    tmp = f"{indir}/tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(f"{tmp}/{f}", f"{indir}/{name}.parquet")
    shutil.rmtree(tmp)


def test_stream_geofence_matches_batch(spark, tmp_path):
    from osmquadtree_rust_spark.operators.filter import Poly
    from osmquadtree_rust_spark.operators.trajectory import geofence_transitions

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    # user 1 flips inside->outside ACROSS the batch boundary (the case a
    # stateless per-batch lag would miss); user 2 flips within batch 1
    # and again within batch 2; user 3 never flips (no output rows).
    b1 = [
        (1, 1, 1000, *IN_PT),
        (1, 2, 2000, *IN_PT),
        (2, 3, 1000, *OUT_PT),
        (2, 4, 2000, *IN_PT),
        (3, 5, 1000, *OUT_PT),
    ]
    b2 = [
        (1, 6, 3000, *OUT_PT),
        (2, 7, 3000, *OUT_PT),
        (3, 8, 3000, *OUT_PT),
    ]
    _write_batch(spark, indir, "b1", b1)
    _write_batch(spark, indir, "b2", b2)

    poly = Poly(_FVX, _FVY)
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    q = (
        SG.stream_geofence(stream, poly)
        .writeStream.format("memory")
        .queryName("geofence_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.event_id, r.ts, r.transition)
        for r in spark.sql("SELECT * FROM geofence_out").collect()
    )
    assert got == [
        (1, 6, 3000, "exit"),
        (2, 4, 2000, "enter"),
        (2, 7, 3000, "exit"),
    ]

    # batch equivalence: the completed stream equals the batch operator
    # over the union of all inputs
    union = spark.createDataFrame(b1 + b2, SCHEMA)
    batch = sorted(
        (r["user_id"], r["event_id"], r["ts"], r["transition"])
        for r in geofence_transitions(union, poly).collect()
    )
    assert got == batch
