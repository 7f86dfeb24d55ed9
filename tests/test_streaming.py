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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate ids across micro-batches within the watermark horizon are
    dropped by streaming state; the survivor set equals batch-mode
    dropDuplicates over the whole input."""
    import shutil

    indir = str(tmp_path / "din")
    ckpt = str(tmp_path / "dckpt")
    outdir = str(tmp_path / "dout")
    os.makedirs(indir)

    rows1 = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:01:00")]
    rows2 = [(2, "2024-01-01 10:02:00"), (3, "2024-01-01 10:03:00"),
             (1, "2024-01-01 10:04:00")]
    schema = "doc_id long, ts_s string"
    for name, rows in (("b1", rows1), ("b2", rows2)):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{indir}/{name}_t")
        for f in os.listdir(f"{indir}/{name}_t"):
            if f.endswith(".parquet"):
                os.rename(f"{indir}/{name}_t/{f}", f"{indir}/{name}.parquet")
        shutil.rmtree(f"{indir}/{name}_t")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .parquet(indir)
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    deduped = ING.stream_dedup_exact(stream, "doc_id", "ts", "1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(outdir).collect())
    assert got == [1, 2, 3]

    # static-frame degradation: plain dropDuplicates semantics
    static = spark.createDataFrame(rows1 + rows2, schema).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    assert sorted(
        r.doc_id for r in ING.stream_dedup_exact(static, "doc_id").collect()
    ) == [1, 2, 3]


def test_replication_daemon_commits_store(spark, tmp_path):
    """catch_up + commit_change_snapshot = the reference's run_update
    daemon loop: each diff becomes a registered change snapshot, as-of
    reads track the sequence clock, incremental reads return exactly the
    window's diffs, and a replayed commit never double-registers."""
    from osmquadtree_rust_spark.operators import merge as M
    from osmquadtree_rust_spark.plans import checkpoint as CK
    from osmquadtree_rust_spark.streaming import ingest as I

    store = str(tmp_path / "store")
    remote = str(tmp_path / "remote")
    state = str(tmp_path / "state.txt")

    # base world @seq 0: ids 0..19 val 0
    base = spark.range(0, 20).select(
        F.col("id"),
        F.lit(0).cast("long").alias("changetype"),
        F.lit(0).cast("long").alias("val"),
        (F.col("id") % 2).alias("tile"),
    )
    CK.write_tiles_checkpointed(base, store, "seq0", n_batches=2)
    CK.append_filelist(store, "seq0", timestamp=0, kind="base")

    # diffs: seq1 modifies 0..9 -> val 1; seq2 deletes even ids < 10
    d1 = spark.range(0, 10).select(
        F.col("id"),
        F.lit(0).cast("long").alias("changetype"),
        F.lit(1).cast("long").alias("val"),
        (F.col("id") % 2).alias("tile"),
    )
    d2 = spark.range(0, 10).filter(F.col("id") % 2 == 0).select(
        F.col("id"),
        F.lit(M.DELETE).cast("long").alias("changetype"),
        F.lit(9).cast("long").alias("val"),
        (F.col("id") % 2).alias("tile"),
    )
    for seq, df in ((1, d1), (2, d2)):
        df.write.parquet(f"{remote}/{seq:09d}.parquet")
        I.write_state(f"{remote}/{seq:09d}.state.txt", seq, timestamp=seq)

    on_batch = I.commit_change_snapshot(store, n_batches=2)
    assert I.catch_up(spark, remote, state, on_batch) == [1, 2]
    assert I.read_state(state)["sequence"] == 2
    log = CK.read_filelist(store)
    assert [(e["snapshot"], e["timestamp"]) for e in log] == [
        ("seq0", 0), ("seq1", 1), ("seq2", 2),
    ]

    # the sequence clock drives time travel
    w1 = {(r.id, r.val) for r in CK.read_snapshot_as_of(spark, store, 1).collect()}
    assert w1 == {(i, 1) for i in range(10)} | {(i, 0) for i in range(10, 20)}
    w2 = {(r.id, r.val) for r in CK.read_snapshot_as_of(spark, store, 2).collect()}
    assert w2 == {(i, 1) for i in range(1, 10, 2)} | {(i, 0) for i in range(10, 20)}
    # incremental read of (1, 2] is exactly diff 2, tombstones intact
    delta = CK.read_changes_between(spark, store, 1, 2)
    assert {(r.id, r.changetype) for r in delta.collect()} == {
        (i, 1) for i in range(0, 10, 2)
    }

    # replaying an already-committed diff must be a no-op on the filelist
    on_batch(spark.read.parquet(f"{remote}/{1:09d}.parquet"), 1)
    assert len(CK.read_filelist(store)) == 3


def test_hopping_window_counts_membership(spark):
    """Each event lands in exactly window/slide windows; the window set
    is the starts s with s <= t < s + window; invalid params raise."""
    from osmquadtree_rust_spark.streaming.ingest import hopping_window_counts

    ev = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0), ("a", "2024-01-01 00:40:00", 2.0)],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = hopping_window_counts(
        ev, window_seconds=3600, slide_seconds=1800
    ).collect()
    base = 1704067200  # 2024-01-01 00:00:00 UTC... session tz dependent;
    # instead verify structurally: every event contributes 2 rows total
    assert sum(r.n for r in rows) == 4
    # window starts are slide-aligned and cover each event
    starts = sorted(r.win_start for r in rows)
    assert all(s % 1800 == 0 for s in starts)
    import pytest as _pt

    with _pt.raises(ValueError):
        hopping_window_counts(ev, window_seconds=3600, slide_seconds=1000)
