"""Resume test: kill after batch N, resume, identical data + lineage."""

import json
import os

from pyspark.sql import functions as F

from osmquadtree_rust_spark.plans import checkpoint as CK
from osmquadtree_rust_spark.plans import pipeline as P


def _assigned(spark, n=8000):
    assigned, _ = P.tile_synthetic_images(spark, n, target=1000, persist=False)
    return assigned.select("id", "qt", "tile")


def test_write_resume_identical(spark, tmp_path):
    df = _assigned(spark)
    base_a = str(tmp_path / "a")
    base_b = str(tmp_path / "b")

    # uninterrupted reference write
    CK.write_tiles_checkpointed(df, base_a, "s1", n_batches=4)

    # interrupted write: dies after 2 of 4 batches...
    lin1 = CK.write_tiles_checkpointed(
        df, base_b, "s1", n_batches=4, fail_after_batch=1
    )
    assert len(lin1) == 2
    done = [
        b
        for b in range(4)
        if os.path.exists(f"{base_b}/snapshot=s1/batch={b}/_SUCCESS")
    ]
    assert done == [0, 1]

    # ...then resumes: only the remaining batches run
    lin2 = CK.write_tiles_checkpointed(df, base_b, "s1", n_batches=4)
    assert sorted(r["batch"] for r in lin2) == [2, 3]

    a = CK.read_snapshot(spark, base_a, "s1")
    b = CK.read_snapshot(spark, base_b, "s1")
    ra = sorted(tuple(r) for r in a.select("id", "qt", "tile").collect())
    rb = sorted(tuple(r) for r in b.select("id", "qt", "tile").collect())
    assert ra == rb
    assert len(ra) == 8000

    # lineage file holds all four batch records
    with open(f"{base_b}/_lineage/snapshot=s1.json") as fh:
        recs = json.load(fh)
    assert sorted(r["batch"] for r in recs) == [0, 1, 2, 3]


def test_metrics_table(spark, tmp_path):
    df = _assigned(spark, 5000)
    base = str(tmp_path / "m")
    CK.write_tiles_checkpointed(df, base, "s9", n_batches=2)
    m = CK.read_metrics(spark, base, "s9")
    rows = {r.tile: (r.rows, r.bytes) for r in m.collect()}
    exp = {r.tile: r["count"] for r in df.groupBy("tile").count().collect()}
    assert {t: v[0] for t, v in rows.items()} == exp
    assert all(v[1] and v[1] > 0 for v in rows.values())
