"""Structured Streaming ingest: file-source change stream, foreachBatch
merge, exactly-once via checkpoint; windowed aggregation shape."""

import os
import time

from pyspark.sql import functions as F

from osmquadtree_rust_spark.operators.merge import CREATE, DELETE, MODIFY, NORMAL
from osmquadtree_rust_spark.streaming import ingest as ING

SCHEMA = "id long, version long, changetype int, val string"


def _wait(q, timeout=60):
    q.awaitTermination(timeout)


def test_stream_change_files_applies_batches(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    snap = str(tmp_path / "snapshot")
    os.makedirs(indir)

    base = spark.createDataFrame(
        [(1, 1, CREATE, "a"), (2, 1, CREATE, "b")], SCHEMA
    )
    base.coalesce(1).write.mode("overwrite").parquet(indir + "/f1")
    # file source needs a flat dir of files; write into the dir itself
    for f in os.listdir(indir + "/f1"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/f1/{f}", f"{indir}/batch1.parquet")
    import shutil

    shutil.rmtree(indir + "/f1")

    q = ING.stream_change_files(
        spark, indir, SCHEMA, ckpt, ING.apply_change_batch(snap)
    )
    _wait(q)
    got = {r.id: (r.version, r.val) for r in spark.read.parquet(snap).collect()}
    assert got == {1: (1, "a"), 2: (1, "b")}

    # second file: modify 1 (two versions -> max wins), delete 2, create 3
    chg = spark.createDataFrame(
        [(1, 2, MODIFY, "a2"), (1, 3, MODIFY, "a3"), (2, 2, DELETE, None), (3, 1, CREATE, "c")],
        SCHEMA,
    )
    chg.coalesce(1).write.mode("overwrite").parquet(indir + "/f2")
    for f in os.listdir(indir + "/f2"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/f2/{f}", f"{indir}/batch2.parquet")
    shutil.rmtree(indir + "/f2")

    q = ING.stream_change_files(
        spark, indir, SCHEMA, ckpt, ING.apply_change_batch(snap)
    )
    _wait(q)
    got = {r.id: (r.val, r.changetype) for r in spark.read.parquet(snap).collect()}
    assert got == {1: ("a3", NORMAL), 3: ("c", NORMAL)}

    # re-running with the same checkpoint reprocesses nothing
    q = ING.stream_change_files(
        spark, indir, SCHEMA, ckpt, ING.apply_change_batch(snap)
    )
    _wait(q)
    got2 = {r.id: (r.val, r.changetype) for r in spark.read.parquet(snap).collect()}
    assert got2 == got


def test_windowed_event_counts_static(spark):
    ev = spark.createDataFrame(
        [
            ("2024-01-01 10:05:00", "a", 1.0),
            ("2024-01-01 10:55:00", "a", 2.0),
            ("2024-01-01 11:05:00", "a", 4.0),
            ("2024-01-01 10:30:00", "b", 8.0),
        ],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r.win_start), r.event_type): (r.n, r.total_value)
        for r in ING.windowed_event_counts(ev).collect()
    }
    assert out[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert out[("2024-01-01 11:00:00", "a")] == (1, 4.0)
    assert out[("2024-01-01 10:00:00", "b")] == (1, 8.0)
