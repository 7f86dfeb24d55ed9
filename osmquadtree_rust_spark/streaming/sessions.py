"""Custom stateful streaming operator: event sessionization.

No analog exists in the reference (it has no streaming runtime,
SURVEY.md §2.10); this is the `applyInPandasWithState` pattern the
generalized engine needs for stateful stream processing: per-user session
windows with an inactivity gap, state kept by Spark's state store,
sessions emitted on close (or on timeout in a real continuous run).

Works on a streaming DataFrame; tests drive it with availableNow over a
file source.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

GAP_SECONDS = 1800


def sessionize(events, gap_seconds: int = GAP_SECONDS):
    """events: streaming df with (user_id long, ts_epoch long, value
    double).  Emits closed sessions; open sessions stay in state."""

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts_epoch")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        out = []
        for ts, val in zip(rows["ts_epoch"], rows["value"]):
            ts = int(ts)
            if start is None:
                start, last, n, total = ts, ts, 1, float(val)
            elif ts - last > gap_seconds:
                out.append((key[0], start, last, n, total))
                start, last, n, total = ts, ts, 1, float(val)
            else:
                last = ts
                n += 1
                total += float(val)
        state.update((start, last, n, total))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_start", "session_end", "n_events",
                    "total_value",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(
    events,
    gap_seconds: int = GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
):
    """Exact batch (gaps-and-islands) form of sessionize(): a new session
    starts when the gap to the previous event of the same user exceeds
    gap_seconds.  LAG flags session starts, a running SUM numbers the
    islands, one hash aggregate folds each island into a session row
    (user_id, session_start, session_end, n_events, total_value).

    Equivalent to running sessionize() to completion and flushing open
    state (every island here is a session; the streaming form holds the
    last island of each user open awaiting more data).  Windows partition
    per user — bounded by per-user event counts, no global hot key.
    Ordering is (secs, order_col) with a unique tie-break column, so
    results are engine-exact; total_value sums via DECIMAL(18,6) to kill
    float-order sensitivity (same discipline as windowed_event_counts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if gap_seconds < 0:
        raise ValueError(f"gap_seconds={gap_seconds} must be >= 0")
    reserved = {"__secs", "__new", "__sid", "session_start", "session_end",
                "n_events", "total_value"} & set(events.columns)
    reserved -= {value_col}
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} collide with sessionize_batch's "
            f"internal/output names; rename them first"
        )
    # shared strict dtype dispatch: numeric epoch columns pass through,
    # timestamps go via unix_timestamp, anything else raises
    from ..functions.parse import epoch_seconds

    secs = epoch_seconds(events, ts_col)
    w = Window.partitionBy(user_col).orderBy("__secs", order_col)
    prev = F.lag("__secs").over(w)
    newf = F.when(
        prev.isNull() | (F.col("__secs") - prev > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy("__secs", order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("__secs", secs)
        .withColumn("__new", newf)
        .withColumn("__sid", F.sum("__new").over(run))
        .groupBy(user_col, "__sid")
        .agg(
            F.min("__secs").alias("session_start"),
            F.max("__secs").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.expr(
                f"CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("total_value"),
        )
        .drop("__sid")
    )
