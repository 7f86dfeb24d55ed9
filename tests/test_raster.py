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


def test_raster_pyramid_pixel_equality(spark):
    """Operator vs an independent reference: parent/quadrant from the
    scalar oracle's qt_round + unbuffered bbox CENTRES (not the
    engine's digit bit math), pixels through the real PNG codec."""
    import collections
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import oracle_qt as OQ

    assigned, _ = P.tile_synthetic_images(spark, 20000, target=800, persist=False)
    fp = P.with_synth_footprint(assigned.select("id", "qt", "tile"), "id")
    rasters = R.materialize_raster_tiles(fp, size=64)
    child = {int(r.tile): r for r in rasters.collect()}
    pyr = {int(r.tile): r for r in R.raster_pyramid(rasters).collect()}

    groups = collections.defaultdict(list)
    for t in child:
        d = t & 31
        if d:
            groups[OQ.qt_round(t, d - 1)].append(t)
    assert set(pyr) == set(groups) and len(pyr) >= 2
    for p, ts in groups.items():
        pb = [float(v) for v in OQ.as_bbox(p, 0.0)]
        grid = np.zeros((64, 64), dtype=np.int64)
        for t in ts:
            cb = [float(v) for v in OQ.as_bbox(t, 0.0)]
            qx = 1 if (cb[0] + cb[2]) / 2 > (pb[0] + pb[2]) / 2 else 0
            qy = 0 if (cb[1] + cb[3]) / 2 > (pb[1] + pb[3]) / 2 else 1
            px = FX.png_decode(bytes(child[t].png))[:, :, 0].astype(np.int64)
            grid[qy * 32:(qy + 1) * 32, qx * 32:(qx + 1) * 32] = (
                px.reshape(32, 2, 32, 2).sum(axis=(1, 3))
            )
        r = pyr[p]
        assert (r.n_children, r.sum_lum, r.max_lum) == (
            len(ts), int(grid.sum()), int(grid.max()),
        )
        got = FX.png_decode(bytes(r.png))[:, :, 0].astype(np.int64)
        mx = max(int(grid.max()), 1)
        assert (got == grid * 255 // mx).all()


def test_raster_pyramid_root_dropped_and_mixed_size_raises(spark):
    import pytest

    rasters = spark.createDataFrame(
        [(0, b"x", 64, 1, 1)],  # root tile only
        "tile long, png binary, size int, n_images long, max_count long",
    )
    assert R.raster_pyramid(rasters).count() == 0

    t1 = int(qtn.from_xyz(np.int64(0), np.int64(0), np.int64(1)))
    t2 = int(qtn.from_xyz(np.int64(1), np.int64(0), np.int64(1)))
    g = np.zeros((64, 64), dtype=np.int64)
    g[0, 0] = 1
    png64 = R.grid_to_png(g)
    png32 = R.grid_to_png(np.zeros((32, 32), dtype=np.int64) + 1)
    mixed = spark.createDataFrame(
        [(t1, png64, 64, 1, 1), (t2, png32, 32, 1, 1)],
        "tile long, png binary, size int, n_images long, max_count long",
    )
    with pytest.raises(Exception, match="mixed child raster sizes"):
        R.raster_pyramid(mixed).collect()
