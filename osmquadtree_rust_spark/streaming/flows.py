"""Custom stateful streaming operator: cell-to-cell flow events.

The streaming twin of operators/trajectory.flow_matrix: emit one record
per cross-cell step the moment its closing point arrives, with each
entity's last position carried in the state store so steps that
straddle micro-batches are still detected.  Same semantics as the
batch operator: teleports (per-axis extent > max_span_fixed) are
excluded but still advance the previous point, and same-cell steps are
silent.

Cell math is the numpy twin of geohash_xy_sql (streaming/od.cell_xy_np
— bit-identical integer formula), so closed-stream step emissions
aggregate EXACTLY to flow_matrix's (from, to) counts with no flush —
pinned by tests/test_streaming_flows.py.

Ordering contract as the other stateful operators: rows sort within a
batch, batches arrive per-entity in time order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from .od import cell_xy_np

STEP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_x", LongType()),
        StructField("from_y", LongType()),
        StructField("to_x", LongType()),
        StructField("to_y", LongType()),
        StructField("ts", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_lon", LongType()),
        StructField("last_lat", LongType()),
    ]
)


def stream_flows(
    events,
    chars: int = 6,
    max_span_fixed: int = 200_000,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
):
    """events: streaming df with (id_col long, seq_col long, ts_col long
    epoch-micros, lon/lat fixed-point long).  Emits one record per
    cross-cell step: (user_id, from_x, from_y, to_x, to_y, ts)."""
    S = int(max_span_fixed)
    flagged = events.select(
        F.col(id_col).alias("user_id"),
        F.col(seq_col).alias("event_id"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(lon).cast("long").alias("lon"),
        F.col(lat).cast("long").alias("lat"),
    )

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        tus = rows["ts"].to_numpy(np.int64)
        lons = rows["lon"].to_numpy(np.int64)
        lats = rows["lat"].to_numpy(np.int64)
        if len(tus) == 0:
            return
        if state.exists:
            plon, plat = state.get
            plon_a = np.concatenate(([plon], lons[:-1]))
            plat_a = np.concatenate(([plat], lats[:-1]))
        else:
            plon_a, plat_a = lons[:-1], lats[:-1]
            tus, lons, lats = tus[1:], lons[1:], lats[1:]
        if len(tus):
            ok = (np.abs(lons - plon_a) <= S) & (np.abs(lats - plat_a) <= S)
            fx, fy = cell_xy_np(plon_a, plat_a, chars)
            tx, ty = cell_xy_np(lons, lats, chars)
            moved = ok & ((fx != tx) | (fy != ty))
            out = pd.DataFrame(
                {
                    "user_id": int(key[0]),
                    "from_x": fx[moved],
                    "from_y": fy[moved],
                    "to_x": tx[moved],
                    "to_y": ty[moved],
                    "ts": tus[moved],
                }
            )
        else:
            out = None
        last = rows.iloc[-1]
        state.update((int(last["lon"]), int(last["lat"])))
        if out is not None and len(out):
            yield out

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=STEP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
