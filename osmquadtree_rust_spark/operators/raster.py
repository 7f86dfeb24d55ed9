"""Raster tile materialization (vector -> raster -> vector).

BASELINE.json's generalized engine materializes a raster per quadtree
leaf tile: every image footprint inside a tile is burned into a coverage
grid over the tile's (buffered) extent, encoded as a real PNG
(sources/fixtures.py codec).  The inverse op vectorizes a raster back to
cell-centre points.  Both run as applyInPandas/mapInPandas over whole
Arrow batches — the per-tile render is vectorized numpy.

Pixel mapping: x = (lon - minlon) / (maxlon - minlon) * size (clamped),
y likewise from maxlat downward (north-up), using the tile bbox from
Quadtree::as_bbox with the reference's 0.05 buffer (quadtree.rs:498-541).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions import qt_numpy as qtn
from ..sources import fixtures as FX

RASTER_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("png", BinaryType()),
        StructField("size", IntegerType()),
        StructField("n_images", LongType()),
        StructField("max_count", LongType()),
    ]
)


def render_tile(tile: int, boxes: np.ndarray, size: int = 256) -> np.ndarray:
    """Burn footprint boxes (n,4 int64 fixed-point) into a (size,size)
    uint32 coverage grid over the tile's buffered bbox."""
    minlon, minlat, maxlon, maxlat = (int(v) for v in qtn.as_bbox(np.int64(tile), 0.05))
    grid = np.zeros((size, size), dtype=np.int64)
    if boxes.size == 0:
        return grid
    sx = size / max(maxlon - minlon, 1)
    sy = size / max(maxlat - minlat, 1)
    x0 = np.clip(((boxes[:, 0] - minlon) * sx).astype(np.int64), 0, size - 1)
    x1 = np.clip(((boxes[:, 2] - minlon) * sx).astype(np.int64), 0, size - 1)
    y0 = np.clip(((maxlat - boxes[:, 3]) * sy).astype(np.int64), 0, size - 1)
    y1 = np.clip(((maxlat - boxes[:, 1]) * sy).astype(np.int64), 0, size - 1)
    # difference-array trick: +1 at rect corners, two prefix sums -> exact
    # rectangle accumulation without per-box python loops over pixels
    diff = np.zeros((size + 1, size + 1), dtype=np.int64)
    np.add.at(diff, (y0, x0), 1)
    np.add.at(diff, (y0, x1 + 1), -1)
    np.add.at(diff, (y1 + 1, x0), -1)
    np.add.at(diff, (y1 + 1, x1 + 1), 1)
    grid = diff.cumsum(axis=0).cumsum(axis=1)[:size, :size]
    return grid


def grid_to_png(grid: np.ndarray) -> bytes:
    """Coverage grid -> grayscale-ish RGB PNG (count scaled to 0..255)."""
    mx = max(int(grid.max()), 1)
    g = (grid * 255 // mx).astype(np.uint8)
    return FX.png_encode(np.stack([g, g, g], axis=-1))


def materialize_raster_tiles(
    assigned: DataFrame,
    size: int = 256,
    tile_col: str = "tile",
) -> DataFrame:
    """Per-tile coverage raster from footprint bboxes.

    assigned must carry (tile, minlon, minlat, maxlon, maxlat).  Runs as
    groupBy(tile).applyInPandas — one shuffle on the tile key, which the
    tiling pipeline already co-located, then pure numpy per group.
    """

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(key[0])
        boxes = pdf[["minlon", "minlat", "maxlon", "maxlat"]].to_numpy(np.int64)
        grid = render_tile(tile, boxes, size)
        return pd.DataFrame(
            {
                "tile": [tile],
                "png": [grid_to_png(grid)],
                "size": [size],
                "n_images": [len(pdf)],
                "max_count": [int(grid.max())],
            }
        )

    return assigned.groupBy(tile_col).applyInPandas(render, RASTER_SCHEMA)


VECTOR_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("lon", LongType()),
        StructField("lat", LongType()),
        StructField("count", LongType()),
    ]
)


def raster_to_points(rasters: DataFrame, threshold: int = 1) -> DataFrame:
    """Vectorize rasters: one point per pixel with value >= threshold,
    at the pixel-centre fixed-point coordinate (inverse of render_tile)."""

    def vectorize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            # zip over Arrow-backed columns (one codec call per raster is
            # inherent; no pandas per-row Series construction)
            for tile, size, png in zip(pdf["tile"], pdf["size"], pdf["png"]):
                tile = int(tile)
                size = int(size)
                px = FX.png_decode(bytes(png))[:, :, 0].astype(np.int64)
                minlon, minlat, maxlon, maxlat = (
                    int(v) for v in qtn.as_bbox(np.int64(tile), 0.05)
                )
                ys, xs = np.where(px >= threshold)
                lon = minlon + ((xs + 0.5) * (maxlon - minlon) / size).astype(np.int64)
                lat = maxlat - ((ys + 0.5) * (maxlat - minlat) / size).astype(np.int64)
                outs.append(
                    pd.DataFrame(
                        {
                            "tile": tile,
                            "lon": lon,
                            "lat": lat,
                            "count": px[ys, xs],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    return rasters.mapInPandas(vectorize, VECTOR_SCHEMA)


PYRAMID_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("png", BinaryType()),
        StructField("size", IntegerType()),
        StructField("n_children", LongType()),
        StructField("sum_lum", LongType()),
        StructField("max_lum", LongType()),
    ]
)


_PQ_SCHEMA = StructType(
    [StructField("parent", LongType()), StructField("q", IntegerType())]
)


@F.pandas_udf(_PQ_SCHEMA)
def _parent_quad_udf(tile: pd.Series) -> pd.DataFrame:
    """Parent cell + child quadrant digit for mixed-depth tiles
    (vectorized per-row level — qt_round takes a scalar level).
    Quadrant numbering per quadtree.rs:509-519: bit0 = east, bit1 =
    south (Mercator y), matching render_tile's north-up pixel rows."""
    t = tile.to_numpy(np.int64)
    d = t & 31
    s = 65 - 2 * d  # 63 - 2*(d-1)
    parent = ((t >> s) << s) + (d - 1)
    # the level-i path digit sits at bit 63-2i; the child's own digit is
    # the deepest one (i = depth)
    q = (t >> (63 - 2 * d)) & 3
    return pd.DataFrame({"parent": parent, "q": q.astype(np.int32)})


def raster_pyramid(rasters: DataFrame) -> DataFrame:
    """One pyramid level up: mosaic each parent tile's raster from its
    children's rasters (standard slippy-map tile pyramid semantics —
    each child PNG decodes to its stored 0..255 luminance grid, is
    2x2-box-summed to half size, and lands in the parent's quadrant;
    the parent is NOT re-rendered from footprints, so buffered-extent
    overlap between siblings is inherent to the source tiles and
    preserved as-is).  Root tiles (depth 0) have no parent and are
    dropped.  Callers loop for multiple levels.

    Returns (tile, png, size, n_children, sum_lum, max_lum): the
    parent PNG at the same pixel size as the children, plus the
    mosaic's exact integer luminance total and peak (over the SUMMED
    2x2 blocks, i.e. before grid_to_png rescales for display).

    Scale shape: one narrow Arrow projection for (parent, quadrant),
    then groupBy(parent).applyInPandas with <= 4 child rows per group —
    the same one-shuffle shape as materialize_raster_tiles, and the
    shuffle carries PNG bytes, not pixels."""

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parent = int(key[0])
        size = int(pdf["size"].iloc[0])
        h = size // 2
        grid = np.zeros((size, size), dtype=np.int64)
        for q, png, sz in zip(pdf["q"], pdf["png"], pdf["size"]):
            if int(sz) != size:
                raise ValueError(
                    f"mixed child raster sizes under parent {parent}: "
                    f"{int(sz)} vs {size}"
                )
            px = FX.png_decode(bytes(png))[:, :, 0].astype(np.int64)
            down = px.reshape(h, 2, h, 2).sum(axis=(1, 3))
            qx, qy = int(q) & 1, int(q) >> 1
            grid[qy * h:(qy + 1) * h, qx * h:(qx + 1) * h] = down
        return pd.DataFrame(
            {
                "tile": [parent],
                "png": [grid_to_png(grid)],
                "size": [size],
                "n_children": [len(pdf)],
                "sum_lum": [int(grid.sum())],
                "max_lum": [int(grid.max())],
            }
        )

    kids = rasters.filter(F.expr("(tile & 31) > 0")).withColumn(
        "__pq", _parent_quad_udf(F.col("tile"))
    )
    return kids.select(
        F.col("__pq.parent").alias("__parent"),
        F.col("__pq.q").alias("q"),
        "png",
        "size",
    ).groupBy("__parent").applyInPandas(build, PYRAMID_SCHEMA)
