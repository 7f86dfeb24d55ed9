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
