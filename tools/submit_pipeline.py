"""Flagship driver for `spark-submit --py-files` (tools/submit_demo.sh).

Runs the tile-assignment pipeline on the deterministic synthetic image
table and writes a checkpointed snapshot + metrics table, printing the
per-tile rollup — the deployment shape BASELINE.json mandates.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oqt_submit_demo"
    spark = SparkSession.builder.appName("oqt-tiling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osmquadtree_rust_spark.plans import checkpoint as CK
    from osmquadtree_rust_spark.plans import pipeline as P

    assigned, groups = P.tile_synthetic_images(spark, n, target=P.DEFAULT_TARGET)
    CK.write_tiles_checkpointed(
        assigned.select("id", "qt", "tile"), out, "s1", n_batches=4
    )
    m = CK.read_metrics(spark, out, "s1").orderBy(F.desc("rows"))
    print(f"tiles={m.count()} groups={len(groups)}")
    for r in m.limit(10).collect():
        print(f"  tile={r.tile} rows={r.rows} bytes={r.bytes}")
    spark.stop()


if __name__ == "__main__":
    main()
