"""Custom stateful streaming operator: speed-violation alerts.

The streaming twin of operators/trajectory.speeding_segments: each
entity's last position/time is carried in the state store, so a
violating segment that straddles micro-batches is still detected, and
alerts fire the moment the closing point arrives (the batch operator
only reports counts after the fact).

Semantics identical to the batch operator: a consecutive pair violates
when chord_mm * 1_000_000 > vmax_mmps * dt_us (dt = 0 with movement
counts), and pairs whose per-axis extent exceeds max_span_fixed are
teleports — excluded AND state-resetting in the same way the batch
window simply skips them (the teleport's endpoint still becomes the
new previous point).

Chord math inside the stateful function is the byte-identical numpy
pipeline of trajectory._chord_mm_udf (GEO.hav_np + floor(sqrt*lit)),
so closed-stream alert counts aggregate EXACTLY to the batch
operator's n_speeding — pinned by tests/test_streaming_speeding.py.

Ordering contract as sessions/geofence/dwell/od/routes: rows sort
within a batch, batches arrive per-entity in time order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..functions import geodesic as GEO
from ..operators.trajectory import CHORD_MM_LIT

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("chord_mm", LongType()),
        StructField("dt_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_tus", LongType()),
        StructField("last_lon", LongType()),
        StructField("last_lat", LongType()),
    ]
)


def stream_speeding(
    events,
    vmax_mmps: int,
    max_span_fixed: int = 200_000,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
):
    """events: streaming df with (id_col long, seq_col long, ts_col long
    epoch-micros, lon/lat fixed-point long).  Emits one alert row per
    violating segment: (user_id, event_id, ts, chord_mm, dt_us) keyed
    by the segment's CLOSING point."""
    S = int(max_span_fixed)
    vmax = int(vmax_mmps)
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
        eid = rows["event_id"].to_numpy(np.int64)
        tus = rows["ts"].to_numpy(np.int64)
        lons = rows["lon"].to_numpy(np.int64)
        lats = rows["lat"].to_numpy(np.int64)
        if state.exists:
            ptus, plon, plat = state.get
            ptus_a = np.concatenate(([ptus], tus[:-1]))
            plon_a = np.concatenate(([plon], lons[:-1]))
            plat_a = np.concatenate(([plat], lats[:-1]))
            keep = np.ones(len(tus), dtype=bool)
        else:
            if len(tus) == 0:
                return
            ptus_a, plon_a, plat_a = tus[:-1], lons[:-1], lats[:-1]
            eid, tus, lons, lats = eid[1:], tus[1:], lons[1:], lats[1:]
            keep = np.ones(len(tus), dtype=bool)
        if len(tus):
            span_ok = (np.abs(lons - plon_a) <= S) & (
                np.abs(lats - plat_a) <= S
            )
            hav = GEO.hav_np(plon_a, plat_a, lons, lats)
            mm = np.floor(np.sqrt(hav) * float(CHORD_MM_LIT)).astype(
                np.int64
            )
            dus = tus - ptus_a
            viol = keep & span_ok & (mm * 1_000_000 > vmax * dus)
            out = pd.DataFrame(
                {
                    "user_id": int(key[0]),
                    "event_id": eid[viol],
                    "ts": tus[viol],
                    "chord_mm": mm[viol],
                    "dt_us": dus[viol],
                }
            )
        else:
            out = None
        last = rows.iloc[-1]
        state.update((int(last["ts"]), int(last["lon"]), int(last["lat"])))
        if out is not None and len(out):
            yield out

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
