"""Classified dataset diff (reference src/elements/compareelements.rs).

The reference's correctness tooling is an ordered two-stream diff that
classifies every element as Same / OnlyLeft / OnlyRight / DifferentInfo /
DifferentTags / DifferentData / DifferentQuadtree
(compareelements.rs:12-284).  Spark-first this is one full-outer join on
the key with column-group comparisons — no ordering requirement, one
shuffle, and the class histogram is a groupBy away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAME = "Same"
ONLY_LEFT = "OnlyLeft"
ONLY_RIGHT = "OnlyRight"
DIFFERENT_INFO = "DifferentInfo"
DIFFERENT_TAGS = "DifferentTags"
DIFFERENT_DATA = "DifferentData"
DIFFERENT_QUADTREE = "DifferentQuadtree"


def compare_datasets(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...] = ("id",),
    info_cols: tuple[str, ...] = (),
    tag_cols: tuple[str, ...] = (),
    data_cols: tuple[str, ...] = (),
    qt_col: str | None = None,
) -> DataFrame:
    """Per-key classification, precedence as in the reference: presence,
    then data, then tags, then info, then quadtree."""
    lcols = [F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys]
    rcols = [F.col(c).alias(f"__r_{c}") for c in right.columns if c not in keys]
    lj = left.select(*[F.col(k) for k in keys], *lcols).withColumn(
        "__in_l", F.lit(True)
    )
    rj = right.select(*[F.col(k) for k in keys], *rcols).withColumn(
        "__in_r", F.lit(True)
    )
    j = lj.join(rj, list(keys), "full_outer")

    def differs(cols):
        pred = F.lit(False)
        for c in cols:
            pred = pred | ~(
                F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
            )
        return pred

    cls = (
        F.when(F.col("__in_r").isNull(), ONLY_LEFT)
        .when(F.col("__in_l").isNull(), ONLY_RIGHT)
        .when(differs(data_cols), DIFFERENT_DATA)
        .when(differs(tag_cols), DIFFERENT_TAGS)
        .when(differs(info_cols), DIFFERENT_INFO)
    )
    if qt_col:
        cls = cls.when(differs([qt_col]), DIFFERENT_QUADTREE)
    cls = cls.otherwise(SAME)
    return j.select(*[F.col(k) for k in keys], cls.alias("cls"))


def compare_summary(diff: DataFrame) -> DataFrame:
    return diff.groupBy("cls").agg(F.count("*").cast("long").alias("n"))


def iter_elements_flat(nodes: DataFrame, ways: DataFrame, relations: DataFrame):
    """Ordered whole-dataset element iterator (reference
    src/pbfformat/iterelementsflat.rs:13-146): yields
    ('node'|'way'|'relation', Row) in (type, id) order — the
    whole-planet-compare entry point.

    Spark shape: a global sort per type (range exchange + local sort) and
    toLocalIterator, which walks range partitions in ascending order and
    holds only ONE partition on the driver at a time — the streaming
    analog of the reference's channelled block iterator."""
    for name, df in (("node", nodes), ("way", ways), ("relation", relations)):
        for row in df.orderBy("id").toLocalIterator():
            yield name, row
