"""Custom stateful streaming operator: dwell (stay-point) detection.

The streaming twin of operators/trajectory.dwell_episodes: per entity,
maximal runs of consecutive SLOW segments (great-circle chord <= eps_mm
AND time delta <= max_gap_us) lasting at least min_dwell_us.  The state
store carries the open run (anchor time, point count) plus the last
point, so a stay that spans micro-batches is still reported as ONE
episode; an episode is emitted when a fast segment, a long gap, or a
new batch's first non-slow point CLOSES it.  Runs still open when the
stream drains stay in state (same contract as sessions.sessionize —
drive the stream again, or flush via the batch operator, to close them).

Chord math inside the stateful function is the same vectorized numpy
hav path as the batch operator (GEO.hav_np over the batch arrays +
one scalar link against the state's last point), so stream and batch
classify segments bit-identically — pinned by the batch-equivalence
test (tests/test_streaming_dwell.py).

Ordering contract as sessions/geofence: rows sort within a batch,
batches arrive per-entity in time order.
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

EPISODE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("dwell_us", LongType()),
        StructField("n_points", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_tus", LongType()),
        StructField("last_lon", LongType()),
        StructField("last_lat", LongType()),
        StructField("run_start", LongType()),   # NULL sentinel: -1
        StructField("run_points", LongType()),
    ]
)


def _chords_mm(alon, alat, blon, blat) -> np.ndarray:
    hav = GEO.hav_np(
        np.asarray(alon, dtype=np.int64),
        np.asarray(alat, dtype=np.int64),
        np.asarray(blon, dtype=np.int64),
        np.asarray(blat, dtype=np.int64),
    )
    return np.floor(np.sqrt(hav) * float(CHORD_MM_LIT)).astype(np.int64)


def stream_dwell(
    events,
    eps_mm: int = 100_000,
    max_gap_us: int = 30 * 60 * 1_000_000,
    min_dwell_us: int = 5 * 60 * 1_000_000,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
):
    """events: streaming df with (id_col long, seq_col long, ts_col long
    epoch-micros, lon/lat fixed-point long).  Emits closed dwell
    episodes (user_id, start_us, end_us, dwell_us, n_points)."""
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
        if state.exists:
            ltus, llon, llat, rstart, rpts = state.get
        else:
            ltus = llon = llat = None
            rstart, rpts = -1, 0
        # chord of every within-batch link, vectorized; the link from the
        # state's last point is one extra scalar at the front
        seg = np.empty(len(tus), dtype=np.int64)
        dt = np.empty(len(tus), dtype=np.int64)
        if len(tus):
            if ltus is not None:
                seg[0] = _chords_mm([llon], [llat], [lons[0]], [lats[0]])[0]
                dt[0] = tus[0] - ltus
            else:
                seg[0] = -1  # no previous point: first segment undefined
                dt[0] = 0
            if len(tus) > 1:
                seg[1:] = _chords_mm(lons[:-1], lats[:-1], lons[1:], lats[1:])
                dt[1:] = tus[1:] - tus[:-1]
        out = []
        prev_tus = ltus
        for i in range(len(tus)):
            slow = (
                prev_tus is not None
                and seg[i] >= 0
                and seg[i] <= eps_mm
                and dt[i] <= max_gap_us
            )
            if slow:
                if rstart < 0:
                    rstart, rpts = int(prev_tus), 1
                rpts += 1
            else:
                if rstart >= 0:
                    end = int(prev_tus)
                    if end - rstart >= min_dwell_us:
                        out.append(
                            (int(key[0]), rstart, end, end - rstart, rpts)
                        )
                    rstart, rpts = -1, 0
            prev_tus = int(tus[i])
        if len(tus):
            state.update(
                (int(tus[-1]), int(lons[-1]), int(lats[-1]), rstart, rpts)
            )
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "start_us", "end_us", "dwell_us", "n_points"],
            )

    return flagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EPISODE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
