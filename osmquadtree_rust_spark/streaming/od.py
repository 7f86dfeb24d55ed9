"""Custom stateful streaming operator: origin-destination trip records.

The streaming twin of operators/trajectory.od_matrix's trip stage: per
entity, a silence longer than max_gap_us CLOSES the open trip and emits
one record (origin cell, destination cell, span, point count); the next
point starts a new trip.  The state store carries the open trip
(start time, origin cell, last time, last cell, point count), so a
trip that spans micro-batches is still reported as ONE record.  Trips
still open when the stream drains stay in state (same contract as
stream_dwell / sessions.sessionize — drive the stream again to close
them, or flush via the batch operator).

Cell math inside the stateful function is the identical integer
geohash-grid index the batch operator evaluates in SQL
(functions/geohash.geohash_xy_sql): x = min((u << bits) // range, max)
over non-negative int64 — bit-identical in numpy, pinned by the
batch-equivalence test (tests/test_streaming_od.py: closed stream
records + open-state flush aggregate EXACTLY to od_matrix's counts).

Ordering contract as sessions/geofence/dwell: rows sort within a
batch, batches arrive per-entity in time order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.geohash import _bits_for

TRIP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("o_x", LongType()),
        StructField("o_y", LongType()),
        StructField("d_x", LongType()),
        StructField("d_y", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_points", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_tus", LongType()),
        StructField("start_us", LongType()),
        StructField("o_x", LongType()),
        StructField("o_y", LongType()),
        StructField("last_cx", LongType()),
        StructField("last_cy", LongType()),
        StructField("n_points", LongType()),
    ]
)


def cell_xy_np(lon, lat, chars: int):
    """Depth-`chars` grid indices from fixed-point coords — the numpy
    twin of geohash_xy_sql's integer formula."""
    lon_bits, lat_bits = _bits_for(chars)
    u = np.asarray(lon, dtype=np.int64) + 1800000000
    v = np.asarray(lat, dtype=np.int64) + 900000000
    x = np.minimum((u << lon_bits) // 3600000000, (1 << lon_bits) - 1)
    y = np.minimum((v << lat_bits) // 1800000000, (1 << lat_bits) - 1)
    return x, y


def stream_od(
    events,
    max_gap_us: int = 6 * 3600 * 1_000_000,
    chars: int = 6,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
):
    """events: streaming df with (id_col long, seq_col long, ts_col long
    epoch-micros, lon/lat fixed-point long).  Emits one record per
    CLOSED trip: (user_id, o_x, o_y, d_x, d_y, start_us, end_us,
    n_points)."""
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
        cx, cy = cell_xy_np(
            rows["lon"].to_numpy(np.int64), rows["lat"].to_numpy(np.int64),
            chars,
        )
        if state.exists:
            ltus, tstart, ox, oy, lcx, lcy, npts = state.get
        else:
            ltus = None
        out = []
        for i in range(len(tus)):
            t = int(tus[i])
            if ltus is None or t - ltus > max_gap_us:
                if ltus is not None:
                    out.append(
                        (int(key[0]), ox, oy, lcx, lcy, tstart, ltus, npts)
                    )
                tstart, ox, oy, npts = t, int(cx[i]), int(cy[i]), 0
            ltus, lcx, lcy = t, int(cx[i]), int(cy[i])
            npts += 1
        if ltus is not None:
            state.update((ltus, tstart, ox, oy, lcx, lcy, npts))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "o_x", "o_y", "d_x", "d_y",
                    "start_us", "end_us", "n_points",
                ],
            )

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRIP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
