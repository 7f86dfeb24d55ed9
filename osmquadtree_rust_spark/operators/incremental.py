"""Incremental (delta) near-dup against a persisted fingerprint index.

The daily-crawl shape: dedup a NEW snapshot against an existing corpus
WITHOUT rescanning the old corpus' documents — the same restricted-
recompute philosophy as the reference's update path (find_update.rs:
22-137 touches only affected ids instead of re-deriving the planet).

The persisted index stores winnowing fingerprints (operators/dedup.
winnow_fingerprints: ~1/window of the shingle count per doc), which make
BOTH candidate generation and verification possible index-only:
fingerprint-set Jaccard is the published MOSS similarity measure, so a
delta document is judged against an old document entirely from the two
fingerprint sets — base TEXT is never read.  Appending each delta's
surviving fingerprints as a new epoch keeps the index complete.

At 100 TB the index is a few percent of the corpus (fingerprints are
(id, int64) rows at ~1 per `window` words) and the per-delta cost is
delta-sized: one fingerprint projection over the delta + one equi-join
against the index — never a base re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import winnow_fingerprints


def write_fp_index(
    fps: DataFrame, base: str, epoch: int, mode: str = "errorifexists"
) -> None:
    """Append one epoch of (doc_id, fp) rows as a partition directory
    `base/epoch=<epoch>/` — readable back (with the epoch column) by
    read_fp_index.  Uses the Hadoop-FS-backed parquet writer, so
    cluster URIs (hdfs://, s3a://) work like local paths.
    mode='overwrite' makes an epoch write idempotent (the streaming
    wrapper's retry contract)."""
    fps.select("doc_id", "fp").write.mode(mode).parquet(
        f"{base}/epoch={epoch}"
    )


def read_fp_index(spark, base: str) -> DataFrame:
    """All epochs of the fingerprint index: (doc_id, fp, epoch)."""
    return spark.read.option("basePath", base).parquet(f"{base}/epoch=*")


def _fp_jaccard(
    la: DataFrame, lb: DataFrame, threshold_ppm: int, pair_filter=None
) -> DataFrame:
    """Fingerprint-set Jaccard >= threshold between two (id, fp, size)
    frames aliased to (a, fp, __sza) / (b, fp, __szb): shared-fp
    equi-join, exact integer threshold compare (the repo-wide FLOOR-ppm
    discipline).  pair_filter prunes pairs BEFORE the aggregate (the
    self-join's a < b — filtering after would double the agg and emit
    self-pairs)."""
    joined = la.join(lb, "fp")
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    inter = (
        joined
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("__i"),
            F.max("__sza").alias("__sza"),
            F.max("__szb").alias("__szb"),
        )
    )
    return (
        inter.withColumn("__u", F.col("__sza") + F.col("__szb") - F.col("__i"))
        .filter(F.col("__i") * 1000000 >= F.lit(int(threshold_ppm)) * F.col("__u"))
        .select("a", "b")
    )


def incremental_neardup(
    delta: DataFrame,
    index_fps: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    window: int = 4,
    threshold_ppm: int = 300000,
    fp_df_cap: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dedup a delta snapshot against a persisted fingerprint index.

    Two independent loser sets (a doc may be in both):
      * CROSS epoch: a delta doc whose fingerprint-set Jaccard against
        ANY indexed doc reaches threshold_ppm — the indexed corpus is
        already deduplicated, so the old doc always wins (epoch order,
        not id order).
      * INTRA delta: fingerprint-Jaccard pairs within the delta; the
        higher id of each pair drops (dedup_keep_first semantics —
        one sweep, exact for clusters pairing with their minimum).

    Returns (survivors, survivor_fps): the surviving delta rows, and
    their (doc_id, fp) fingerprints for the caller to append as the next
    epoch (write_fp_index) — keeping the index complete without ever
    reading base documents.

    Everything is fingerprint-frame sized: one winnow projection over
    the delta, one equi-join per loser set, the delta fingerprint frame
    persisted across its four consumers and RELEASED before return
    (loser ids are materialized lineage-free; the returned frames are a
    lazy anti-join/semi-join against the delta source and the small
    checkpointed fingerprint set)."""
    if threshold_ppm <= 0:
        raise ValueError(
            f"threshold_ppm={threshold_ppm} must be > 0 (zero-overlap "
            f"pairs are dropped by the shared-fingerprint join)"
        )
    from .dedup import _cap_fp_df

    # fp_df_cap (per side) bounds hot-fingerprint join fan-out at
    # cap_delta x cap_index rows per fp — a deterministic semantics
    # change here (unlike winnow_neardup_pairs, the fp sets ARE the
    # similarity metric, so sizes are recomputed after capping and an
    # oracle must apply the identical cap)
    dfps = (
        _cap_fp_df(
            winnow_fingerprints(delta, text, id_col, n, window), fp_df_cap
        )
        .withColumn("__sz", F.count("*").over(Window.partitionBy(id_col)))
        .persist()
    )
    la = dfps.select(F.col(id_col).alias("a"), "fp", F.col("__sz").alias("__sza"))
    isz = _cap_fp_df(
        index_fps.select(id_col, "fp"), fp_df_cap
    ).withColumn(
        "__sz", F.count("*").over(Window.partitionBy(id_col))
    )
    ib = isz.select(F.col(id_col).alias("b"), "fp", F.col("__sz").alias("__szb"))
    cross_losers = _fp_jaccard(la, ib, threshold_ppm).select(
        F.col("a").alias(id_col)
    )
    lb = dfps.select(F.col(id_col).alias("b"), "fp", F.col("__sz").alias("__szb"))
    intra_losers = _fp_jaccard(
        la, lb, threshold_ppm, pair_filter=F.col("a") < F.col("b")
    ).select(F.col("b").alias(id_col))
    losers = (
        cross_losers.unionByName(intra_losers)
        .distinct()
        .localCheckpoint(eager=True)
    )
    survivor_fps = (
        dfps.select(id_col, "fp")
        .join(losers, id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    dfps.unpersist()
    survivors = delta.join(losers, id_col, "left_anti")
    return survivors, survivor_fps


def compact_fp_index(spark, base: str, into_epoch: int | None = None) -> int:
    """Squash all index epochs into one — the fingerprint-index twin of
    the snapshot log's squash (plans/checkpoint.squash_snapshots, after
    the reference's filelist compaction): per-batch streaming appends
    grow the epoch list linearly, and every delta read scans all of
    them, so periodic compaction keeps the read path at one directory.

    Writes the union of all (doc_id, fp) rows as `into_epoch` (default:
    max existing epoch + 1), then deletes the old epoch directories via
    the Hadoop FileSystem API (cluster URIs clean up like local paths —
    the r4 lesson from connected_components).  The write is staged
    BEFORE any delete, so a crash mid-compaction leaves a readable
    (over-complete, fp rows duplicated across the survivor and stale
    epochs) index rather than a hole; rerunning compaction converges
    because the union is distinct-free by construction per doc.
    Returns the compacted epoch id."""
    from .. import fsio

    idx = read_fp_index(spark, base)
    epochs = sorted(
        r["epoch"] for r in idx.select("epoch").distinct().collect()
    )
    if not epochs:
        raise ValueError(f"no index epochs under {base}")
    if into_epoch is None:
        into_epoch = max(epochs) + 1
    if into_epoch in epochs:
        raise ValueError(
            f"into_epoch={into_epoch} already exists; compaction must "
            f"write a FRESH epoch (stage-then-delete crash safety)"
        )
    write_fp_index(
        idx.select("doc_id", "fp").distinct(), base, into_epoch
    )
    for e in epochs:
        fsio.rmtree_any(f"{base}/epoch={e}", spark)
    return int(into_epoch)
