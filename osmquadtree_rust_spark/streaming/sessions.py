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
