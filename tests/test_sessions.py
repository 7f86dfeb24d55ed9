"""Stateful streaming sessionization (applyInPandasWithState)."""

import os

from osmquadtree_rust_spark.streaming import sessions as S

SCHEMA = "user_id long, ts_epoch long, value double"


def test_sessionize_stream(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    # user 1: two sessions separated by > gap; user 2: one long session
    batch1 = spark.createDataFrame(
        [
            (1, 1000, 1.0),
            (1, 1100, 2.0),
            (1, 1200, 3.0),
            (2, 1000, 5.0),
            (2, 2500, 6.0),
        ],
        SCHEMA,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(indir + "/tmp")
    for f in os.listdir(indir + "/tmp"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/tmp/{f}", f"{indir}/b1.parquet")
    import shutil

    shutil.rmtree(indir + "/tmp")
    # second batch: user 1 returns much later -> closes session 1
    batch2 = spark.createDataFrame([(1, 10000, 9.0)], SCHEMA)
    batch2.coalesce(1).write.mode("overwrite").parquet(indir + "/tmp")
    for f in os.listdir(indir + "/tmp"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/tmp/{f}", f"{indir}/b2.parquet")
    shutil.rmtree(indir + "/tmp")

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(indir)
    out = S.sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # user 1's first session closed by the late event in batch 2
    assert rows[(1, 1000)] == (1200, 3, 6.0)
    # user 2's session and user 1's second session remain open (in state)
    assert (2, 1000) not in rows
    assert (1, 10000) not in rows
