"""Custom stateful streaming operator: geofence enter/exit detection.

The streaming twin of operators/trajectory.geofence_transitions (which
itself generalizes the reference's per-id ordered change streams,
combine_block.rs:93-134): each entity's point events are classified
inside/outside a polygon fence BEFORE the stateful stage (vectorized
pnpoly Arrow projection — the state store carries one boolean per
entity, never coordinates), and `applyInPandasWithState` emits one row
per flag flip, carrying the previous flag across micro-batches so a
flip that straddles a batch boundary is still detected exactly once.

Ordering contract (same as sessions.sessionize): rows are sorted within
each batch, and batches must arrive per-entity in time order — the file
sources used here (and the reference's replication-diff sequence)
guarantee that; for out-of-order sources put a watermark+sort stage in
front.  Batch equivalence — running the stream to completion equals
trajectory.geofence_transitions on the union of all inputs — is pinned
by tests/test_streaming_geofence.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("transition", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_in", BooleanType())])


def stream_geofence(
    events,
    poly,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
):
    """events: streaming df with (id_col long, seq_col long, ts_col long
    epoch-micros, lon/lat fixed-point long).  poly: operators.filter.Poly
    (exact pnpoly crossing-number semantics).  Emits
    (user_id, event_id, ts, transition 'enter'|'exit') per flag flip;
    an entity's very first event emits nothing (no prior state)."""
    from ..operators.filter import make_pip_udf

    pip = make_pip_udf(poly)
    flagged = events.select(
        F.col(id_col).alias("user_id"),
        F.col(seq_col).alias("event_id"),
        F.col(ts_col).cast("long").alias("ts"),
        pip(F.col(lon), F.col(lat)).alias("__in"),
    )

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        prev = state.get[0] if state.exists else None
        out = []
        for eid, ts, inside in zip(rows["event_id"], rows["ts"], rows["__in"]):
            inside = bool(inside)
            if prev is not None and prev != inside:
                out.append(
                    (int(key[0]), int(eid), int(ts), "enter" if inside else "exit")
                )
            prev = inside
        state.update((prev,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "transition"]
            )

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
