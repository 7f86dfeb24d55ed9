"""Custom stateful streaming operator: road-transition events.

The streaming twin of operators/map_match.route_edges: given an
(already map-matched) point stream, emit one record per road-to-road
transition the moment it happens — consecutive points on the same road
are silent, and the state store carries each entity's current road so a
transition that straddles micro-batches is still detected (the batch
operator sees it via LAG; the stream must remember).

Unlike trips/dwells there is nothing left "open": a transition needs
only the previous visit, so closed-stream emissions aggregate EXACTLY
to route_edges' (road_from, road_to) counts with no state flush —
pinned by tests/test_streaming_routes.py.

Ordering contract as sessions/geofence/dwell/od: rows sort within a
batch, batches arrive per-entity in time order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("road_from", LongType()),
        StructField("road_to", LongType()),
        StructField("ts", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_road", LongType())])


def stream_routes(
    matched,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    road_col: str = "road_id",
):
    """matched: streaming df with (id_col long, seq_col long, ts_col
    long epoch-micros, road_col long — the snap_to_roads winner).
    Emits (user_id, road_from, road_to, ts) per transition."""
    flagged = matched.select(
        F.col(id_col).alias("user_id"),
        F.col(seq_col).alias("event_id"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(road_col).cast("long").alias("road"),
    )

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        last = state.get[0] if state.exists else None
        out = []
        for t, road in zip(rows["ts"], rows["road"]):
            road = int(road)
            if last is not None and road != last:
                out.append((int(key[0]), last, road, int(t)))
            last = road
        if last is not None:
            state.update((last,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "road_from", "road_to", "ts"]
            )

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
