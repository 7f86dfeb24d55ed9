"""SparkSession construction with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osmquadtree-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session.

    Defaults tuned for correctness-at-scale rather than tiny-local runs:
    AQE on (runtime coalescing + skew-join splitting), Arrow on (all our
    UDFs are pandas UDFs), and shuffle partitions sized from the env
    (SPARK_GRAFT_CPUS) so local runs don't over-partition.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        # every cross-engine gate relies on naive parquet timestamps
        # meaning UTC instants (DuckDB epoch()/epoch_us() semantics);
        # pin it instead of inheriting the container default
        .config("spark.sql.session.timeZone", "Etc/UTC")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true is the Spark DEFAULT: AQE only coalesces
        # down to default parallelism, not to the advisory byte target.
        # r6 set this false to cut task overhead on tiny local shuffles,
        # but at the driver's escalated SF the byte-based target
        # serialized CPU-heavy post-shuffle stages (keyed windows,
        # Python-boundary projections) onto 1-2 tasks — a compressed
        # 10-80 MB shuffle is far more than 2 tasks of WORK.  Measured
        # r8 (sf1.0, per-query A/B in OPTIMIZATION_r08.md): the default
        # wins by integer factors on every window/UDF-heavy query and
        # costs single-digit ms on tiny ones.  At 100 TB partitions
        # exceed the advisory size and both settings behave identically;
        # SPARK_GRAFT_PARALLELISM_FIRST overrides for experiments.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(cpus, 8)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
