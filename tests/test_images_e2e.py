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


def test_image_phash_neardup(spark):
    """DCT pHash: stable under mild pixel noise and re-encoding (lossy),
    so planted perturbed copies pair up via the banded Hamming join while
    distinct images stay apart."""
    import numpy as np

    from osmquadtree_rust_spark.operators import multimodal as MM
    from osmquadtree_rust_spark.sources import fixtures as FX

    rng = np.random.RandomState(9)
    rows = []
    for i in range(12):
        w, h = 64, 48
        # structured low-frequency content (random coarse grid upsampled):
        # distinct images differ strongly in the DCT low block, which is
        # what pHash thresholds.  (The synth gradient fixtures are nearly
        # pure DC — every AC bit would be threshold noise by design.)
        coarse = rng.randint(0, 256, (6, 8, 3))
        px = coarse.repeat(8, axis=0).repeat(8, axis=1)[:h, :w].astype(np.uint8)
        rows.append((f"base{i:04d}", FX.png_encode(px), w, h, "png"))
        noisy = np.clip(
            px.astype(np.int16) + rng.randint(-2, 3, px.shape), 0, 255
        ).astype(np.uint8)
        # re-encode the noisy copy through the LOSSY codec
        rows.append((f"copy{i:04d}", FX.dctq_encode(noisy), w, h, "jpeg"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    pairs = {
        (r.image_a, r.image_b)
        for r in MM.image_neardup_pairs(df, max_hamming=10).collect()
    }
    expected = {(f"base{i:04d}", f"copy{i:04d}") for i in range(12)}
    assert pairs == expected


def test_video_frame_sampling_and_audio_features(spark):
    import numpy as np

    from osmquadtree_rust_spark.operators import multimodal as MM
    from osmquadtree_rust_spark.sources import fixtures as FX

    vids = []
    for v in range(3):
        frames = [FX.synth_pixels(v * 100 + k, 16, 16) for k in range(11)]
        vids.append((f"vid{v}", FX.video_encode(frames)))
    vdf = spark.createDataFrame(vids, "video_id string, bytes binary")
    got = MM.sample_frames(vdf, every_n=5).collect()
    # 11 frames, every 5th -> idx 0, 5, 10 per video
    assert sorted((r.video_id, r.frame_idx) for r in got) == [
        (f"vid{v}", i) for v in range(3) for i in (0, 5, 10)
    ]
    # sampled frame bytes decode back to the exact original frame
    r0 = next(r for r in got if r.video_id == "vid1" and r.frame_idx == 5)
    assert np.array_equal(
        FX.png_decode(bytes(r0.bytes)), FX.synth_pixels(105, 16, 16)
    )

    auds = []
    t = np.arange(16000)
    auds.append(("a0", FX.audio_encode((10000 * np.sin(t * 0.1)).astype(np.int16))))
    auds.append(("a1", FX.audio_encode(np.zeros(8000, dtype=np.int16))))
    adf = spark.createDataFrame(auds, "audio_id string, bytes binary")
    feats = {r.audio_id: r for r in MM.audio_features(adf).collect()}
    assert feats["a0"].duration_ms == 1000
    assert feats["a0"].rms_milli > 6_000_000  # ~10000/sqrt(2) * 1000
    assert feats["a0"].zero_crossings > 400
    assert feats["a1"].rms_milli == 0 and feats["a1"].duration_ms == 500
