"""Images-table end-to-end: phash-seeded footprints -> cells -> tiles ->
per-tile raster; per-row decoded-pixel PSNR >= 40 dB and caption equality
(BASELINE.json input_hint invariants)."""

import numpy as np
from pyspark.sql import functions as F

import oracle_qt as O
from osmquadtree_rust_spark.functions import qt_numpy as Q
from osmquadtree_rust_spark.functions import qt_spark as qs
from osmquadtree_rust_spark.operators import multimodal as MM
from osmquadtree_rust_spark.operators import raster as R
from osmquadtree_rust_spark.plans import pipeline as P
from osmquadtree_rust_spark.sources import fixtures as FX


def test_images_pipeline_end_to_end(spark):
    n = 256
    images = FX.images_spark_df(spark, n)

    # footprints from phash (deterministic geohash-style deinterleave)
    fp = P.with_phash_footprint(images)
    with_qt = qs.with_bbox_qt(fp, "minlon", "minlat", "maxlon", "maxlat")
    assigned, groups = P.assign_tiles(with_qt, "qt", None, target=64)

    rows = assigned.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "minlon", "minlat", "maxlon", "maxlat", "qt", "tile",
    ).collect()
    assert len(rows) == n

    # cell assignment matches the numpy reference path row-for-row
    ph = np.array([r.phash for r in rows], dtype=np.int64)
    w = np.array([r.w for r in rows], dtype=np.int64)
    h = np.array([r.h for r in rows], dtype=np.int64)
    a, b, c, d = FX.phash_footprint(ph, w, h)
    exp_qt = Q.calculate(a, b, c, d)
    got_qt = np.array([r.qt for r in rows], dtype=np.int64)
    assert (exp_qt == got_qt).all()

    # per-row invariants: decode PSNR + caption equality.  The lossy fmt
    # must be GENUINELY lossy (real DCT-quantization codec, not a stub)
    # while clearing the 40 dB bar; the lossless fmt must be bit-exact.
    exact = {"png": [], "jpeg": []}
    for r in rows[:64]:
        i = int(r.image_id[3:])
        px = FX.decode_image(bytes(r.bytes), r.fmt)
        ref = FX.synth_pixels(i, r.w, r.h)
        assert FX.psnr(px, ref) >= 40.0
        exact[r.fmt].append(np.array_equal(px, ref))
        assert r.caption == f"caption {i} {FX.NOUNS[i % len(FX.NOUNS)]}"
    assert exact["png"] and all(exact["png"])
    assert exact["jpeg"] and not any(exact["jpeg"])

    # every tile is a group cell (or root) and an ancestor of its members
    gset = set(groups.tolist()) | {0}
    for r in rows:
        assert r.tile in gset
        assert r.tile == 0 or O.is_parent(int(r.tile), int(r.qt))

    # raster materialization per leaf tile covers every image
    rasters = R.materialize_raster_tiles(
        assigned.select("tile", "minlon", "minlat", "maxlon", "maxlat"), size=32
    ).collect()
    assert sum(x.n_images for x in rasters) == n

    # decode stats over the same table exercises the mapInPandas plumbing
    stats = {s.image_id: s for s in MM.decode_stats(images).collect()}
    assert len(stats) == n
    for r in rows[:16]:
        s = stats[r.image_id]
        assert (s.w, s.h) == (r.w, r.h)
