"""Raster tile materialization + vectorization roundtrip."""

import numpy as np
from pyspark.sql import functions as F

from osmquadtree_rust_spark.functions import qt_numpy as qtn
from osmquadtree_rust_spark.operators import raster as R
from osmquadtree_rust_spark.plans import pipeline as P
from osmquadtree_rust_spark.sources import fixtures as FX


def test_render_tile_difference_array():
    tile = int(qtn.from_xyz(np.int64(2), np.int64(1), np.int64(2)))
    minlon, minlat, maxlon, maxlat = (int(v) for v in qtn.as_bbox(np.int64(tile), 0.05))
    w = maxlon - minlon
    h = maxlat - minlat
    # one box covering exactly the NW quarter of the tile
    boxes = np.array(
        [[minlon, minlat + h // 2, minlon + w // 2, maxlat]], dtype=np.int64
    )
    grid = R.render_tile(tile, boxes, size=64)
    assert grid[0, 0] == 1  # top-left covered
    assert grid[63, 63] == 0  # bottom-right not
    assert grid.sum() >= 32 * 32  # roughly a quarter


def test_raster_roundtrip(spark):
    assigned, _ = P.tile_synthetic_images(spark, 4000, target=1000, persist=False)
    fp = P.with_synth_footprint(assigned.select("id", "qt", "tile"), "id")
    rasters = R.materialize_raster_tiles(fp, size=64)
    rows = rasters.collect()
    assert len(rows) == len(set(r.tile for r in rows))
    total = sum(r.n_images for r in rows)
    assert total == 4000
    # every png decodes to the declared size and has max_count hits
    for r in rows[:5]:
        px = FX.png_decode(bytes(r.png))
        assert px.shape == (64, 64, 3)
    # vectorize back: each tile with images yields >= 1 point inside the
    # tile's buffered bbox
    pts = R.raster_to_points(rasters, threshold=1).collect()
    by_tile = {}
    for p in pts:
        by_tile.setdefault(p.tile, []).append(p)
    for r in rows:
        if r.max_count > 0:
            assert r.tile in by_tile
            a, b, c, d = (int(v) for v in qtn.as_bbox(np.int64(r.tile), 0.05))
            for p in by_tile[r.tile][:10]:
                assert a <= p.lon <= c and b <= p.lat <= d
