"""Point-in-polygon spatial join against a broadcast polygon index.

BASELINE.json's generalized engine tests points against *tile polygons*
with a broadcast spatial index.  No geometry libraries ship in this
container, so the index is a pure-numpy STR-style packed bbox tree over
the polygon set, broadcast to executors; candidates from the bbox tree
are verified with the exact pnpoly crossing-number test
(operators/filter.pnpoly, reference filter_elements.rs:89-129).

Scale shape: polygons are metadata-scale (tile boundaries); the points
side streams through a mapInPandas with zero shuffles; each Arrow batch
does one vectorized bbox-tree probe + pnpoly verify per candidate pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from .filter import pnpoly


class PolygonIndex:
    """STR-packed bbox tree (leaf fan-out via sort-tile-recursive order):
    polygons sorted by centre x then packed into y-sorted runs — one level
    of packing is plenty for metadata-scale polygon sets."""

    def __init__(self, polys: list[tuple[int, np.ndarray, np.ndarray]], leaf_size: int = 8):
        # polys: (poly_id, vertsx degrees, vertsy degrees)
        self.ids = np.array([p[0] for p in polys], dtype=np.int64)
        self.vx = [np.asarray(p[1], np.float64) for p in polys]
        self.vy = [np.asarray(p[2], np.float64) for p in polys]
        self.minx = np.array([v.min() for v in self.vx])
        self.maxx = np.array([v.max() for v in self.vx])
        self.miny = np.array([v.min() for v in self.vy])
        self.maxy = np.array([v.max() for v in self.vy])
        # STR packing: sort by centre-x, slice, sort slices by centre-y
        cx = (self.minx + self.maxx) / 2
        cy = (self.miny + self.maxy) / 2
        n = len(polys)
        n_slabs = max(int(np.ceil(np.sqrt(max(n, 1) / leaf_size))), 1)
        slab_width = int(np.ceil(n / n_slabs))
        xrank = np.argsort(np.argsort(cx, kind="stable"), kind="stable")
        slab = xrank // max(slab_width, 1)
        order = np.lexsort((cy, slab))
        self.order = order
        # leaf bboxes
        self.leaf_starts = np.arange(0, n, leaf_size)
        self.leaf_bbox = []
        for st in self.leaf_starts:
            sel = order[st : st + leaf_size]
            self.leaf_bbox.append(
                (
                    self.minx[sel].min(),
                    self.miny[sel].min(),
                    self.maxx[sel].max(),
                    self.maxy[sel].max(),
                )
            )
        self.leaf_bbox = np.array(self.leaf_bbox, dtype=np.float64).reshape(-1, 4)
        self.leaf_size = leaf_size

    def query(self, px: np.ndarray, py: np.ndarray):
        """Yield (point_indices, poly_index) candidate pairs whose polygon
        bbox contains the point."""
        for li, st in enumerate(self.leaf_starts):
            lb = self.leaf_bbox[li]
            in_leaf = (px >= lb[0]) & (px <= lb[2]) & (py >= lb[1]) & (py <= lb[3])
            if not in_leaf.any():
                continue
            pts = np.where(in_leaf)[0]
            for pi in self.order[st : st + self.leaf_size]:
                hit = (
                    (px[pts] >= self.minx[pi])
                    & (px[pts] <= self.maxx[pi])
                    & (py[pts] >= self.miny[pi])
                    & (py[pts] <= self.maxy[pi])
                )
                if hit.any():
                    yield pts[hit], pi


def pip_join(
    points: DataFrame,
    polygons: list[tuple[int, list[float], list[float]]],
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(point id, poly_id) pairs for every point inside a polygon.
    Polygons are (poly_id, vertsx_deg, vertsy_deg); the index is broadcast."""
    spark = points.sparkSession
    idx = PolygonIndex([(pid, np.array(vx), np.array(vy)) for pid, vx, vy in polygons])
    bc = spark.sparkContext.broadcast(idx)
    schema = StructType(
        [StructField("id", LongType()), StructField("poly_id", LongType())]
    )

    def probe(batches):
        index = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            px = pdf[lon].to_numpy(np.float64) * 1e-7
            py = pdf[lat].to_numpy(np.float64) * 1e-7
            out_ids, out_polys = [], []
            for pts, pi in index.query(px, py):
                inside = pnpoly(index.vx[pi], index.vy[pi], px[pts], py[pts])
                sel = pts[inside]
                if sel.size:
                    out_ids.append(ids[sel])
                    out_polys.append(np.full(sel.size, index.ids[pi], dtype=np.int64))
            if out_ids:
                yield pd.DataFrame(
                    {"id": np.concatenate(out_ids), "poly_id": np.concatenate(out_polys)}
                )

    return points.select(id_col, lon, lat).mapInPandas(probe, schema)


# W/E/S/SW/SE/N/NW/NE — the gate oracle mirrors this exact order
NEIGHBOR_OFFSETS = [(-1, 0), (1, 0), (0, -1), (-1, -1), (1, -1), (0, 1), (-1, 1), (1, 1)]


def geohash_neighbors(
    points: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    chars: int = 6,
    id_col: str = "id",
) -> DataFrame:
    """Explode each point into its geohash cell's up-to-8 surrounding
    cells — the standard candidate-generation step for geohash radius /
    proximity joins (two points within a cell width of each other always
    share a cell or a neighbor pair, so `points x geohash_neighbors` is a
    recall-complete equi-join prefilter for the exact distance verify).

    Pure integer bit math on the de-interleaved (x, y) grid: longitude
    wraps across the antimeridian (mod 2^lon_bits), latitude rows beyond
    the poles are dropped (3 fewer neighbors in the top/bottom row).
    Returns (id, k, neighbor) with k = 0..7 the offset index, row order
    W/E/S/SW/SE/N/NW/NE.  Shares geohash_xy_sql / interleave_sql with the
    DuckDB oracle."""
    from pyspark.sql import functions as F

    from ..functions import geohash as GH

    spark = points.sparkSession
    lon_bits, lat_bits = GH._bits_for(chars)
    xs, ys = GH.geohash_xy_sql(lon, lat, chars, "spark")
    base = points.select(
        F.col(id_col), F.expr(xs).alias("__x"), F.expr(ys).alias("__y")
    )
    offsets = spark.createDataFrame(
        [(k, dx, dy) for k, (dx, dy) in enumerate(NEIGHBOR_OFFSETS)],
        "k int, dx int, dy int",
    )
    m = 1 << lon_bits
    joined = base.join(F.broadcast(offsets))
    xn = f"pmod(__x + dx, {m})"
    yn = "(__y + dy)"
    code = GH.interleave_sql(f"({xn})", f"({yn})", chars, "spark")
    return (
        joined.filter(F.expr(f"{yn} >= 0 AND {yn} < {1 << lat_bits}"))
        .select(
            F.col(id_col),
            F.col("k").cast("long"),
            F.expr(code).cast("long").alias("neighbor"),
        )
    )
