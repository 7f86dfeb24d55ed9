"""image_gradient_stats: Sobel L1 energy / edge counts, pinned against
an independent per-pixel numpy convolution and analytic cases."""

import numpy as np
import pytest

from osmquadtree_rust_spark.operators.multimodal import image_gradient_stats
from osmquadtree_rust_spark.sources import fixtures as FX


def ref_sobel(px, thr):
    # Direct 3x3 kernel application per interior pixel — deliberately
    # NOT the operator's separable slicing form.
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    ky = kx.T
    px = px.astype(np.int64)
    h, w, nc = px.shape
    if h < 3 or w < 3:
        return 0, 0
    pp = np.zeros((h - 2, w - 2), dtype=np.int64)
    for c in range(nc):
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                win = px[y - 1 : y + 2, x - 1 : x + 2, c]
                pp[y - 1, x - 1] += abs(int((win * kx).sum())) + abs(
                    int((win * ky).sum())
                )
    return int(pp.sum()), int((pp >= thr).sum())


def _rows(spark, imgs):
    df = spark.createDataFrame(
        [
            (f"img{i:03d}", bytearray(FX.png_encode(px)), "png")
            for i, px in enumerate(imgs)
        ],
        "image_id string, bytes binary, fmt string",
    )
    return {
        r["image_id"]: (r["w"], r["h"], r["grad_l1"], r["edge_px"])
        for r in image_gradient_stats(df, edge_thr=512).collect()
    }


def test_vs_direct_kernel_reference(spark):
    rng = np.random.default_rng(7)
    imgs = [
        FX.synth_pixels(3, 16, 16),
        FX.synth_pixels(9, 32, 24),
        rng.integers(0, 256, (10, 12, 3)).astype(np.uint8),
        rng.integers(0, 256, (3, 3, 3)).astype(np.uint8),
    ]
    got = _rows(spark, imgs)
    for i, px in enumerate(imgs):
        l1, ep = ref_sobel(px, 512)
        h, w = px.shape[0], px.shape[1]
        assert got[f"img{i:03d}"] == (w, h, l1, ep), f"img {i}"


def test_analytic_cases(spark):
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    # vertical step edge at x=4: |gx| = 4*200 per channel on the two
    # columns adjacent to the step (x=3,4), 6 interior rows each
    step = np.full((8, 8, 3), 0, dtype=np.uint8)
    step[:, 4:, :] = 200
    tiny = np.full((2, 5, 3), 9, dtype=np.uint8)  # no interior
    got = _rows(spark, [flat, step, tiny])
    assert got["img000"] == (8, 8, 0, 0)
    assert got["img001"] == (8, 8, 3 * 2 * 6 * 800, 2 * 6)
    assert got["img002"] == (5, 2, 0, 0)


def test_oracle_closed_forms_match_convolution():
    # The gate oracle's closed forms (r from x, g from y, b from s=x+y+3i)
    # must equal the real convolution on the fixture pixels.
    for i, w, h in [(0, 16, 16), (5, 32, 24), (2, 64, 48)]:
        px = FX.synth_pixels(i, w, h)
        l1, ep = ref_sobel(px, 512)
        x, y = np.arange(w), np.arange(h)
        f = (x * 255 // (w - 1) + i) % 256
        g = (y * 255 // (h - 1) + 2 * i) % 256
        rt = np.abs(4 * (f[2:] - f[:-2]))
        gt = np.abs(4 * (g[2:] - g[:-2]))
        xx, yy = np.meshgrid(np.arange(1, w - 1), np.arange(1, h - 1))
        s = xx + yy + 3 * i
        bt = np.abs(
            2 * ((s + 1) % 256) + ((s + 2) % 256)
            - ((s - 2) % 256) - 2 * ((s - 1) % 256)
        )
        pp = rt[np.newaxis, :] + gt[:, np.newaxis] + 2 * bt
        assert int(pp.sum()) == l1 and int((pp >= 512).sum()) == ep


def test_image_histogram_vs_numpy(spark):
    from osmquadtree_rust_spark.operators.multimodal import image_histogram

    imgs = [FX.synth_pixels(4, 16, 16), FX.synth_pixels(11, 32, 24)]
    df = spark.createDataFrame(
        [
            (f"img{i}", bytearray(FX.png_encode(px)), "png")
            for i, px in enumerate(imgs)
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {
        (r["image_id"], r["channel"], r["bin"]): r["cnt"]
        for r in image_histogram(df, bins=16).collect()
    }
    exp = {}
    for i, px in enumerate(imgs):
        for c, name in enumerate("rgb"):
            vals, cnts = np.unique(px[:, :, c] // 16, return_counts=True)
            for v, n in zip(vals, cnts):
                exp[(f"img{i}", name, int(v))] = int(n)
    assert got == exp
    # every channel's counts sum to the pixel count
    for i, px in enumerate(imgs):
        n = px.shape[0] * px.shape[1]
        for name in "rgb":
            assert sum(v for k, v in exp.items()
                       if k[0] == f"img{i}" and k[1] == name) == n


def test_image_histogram_rejects_bad_bins(spark):
    from osmquadtree_rust_spark.operators.multimodal import image_histogram

    df = spark.createDataFrame([], "image_id string, bytes binary, fmt string")
    with pytest.raises(ValueError, match="divide 256"):
        image_histogram(df, bins=13)


def test_augment_crop_flip_pixel_equality(spark):
    from osmquadtree_rust_spark.operators.multimodal import augment_crop_flip

    cases = [  # (i, w, h, left, top, flip)
        (0, 16, 16, 0, 0, 0),
        (2, 32, 24, 4, 3, 1),
        (6, 64, 48, 10, 5, 1),
    ]
    df = spark.createDataFrame(
        [
            (f"img{i}", bytearray(FX.png_encode(FX.synth_pixels(i, w, h))),
             "png", l, t, f)
            for (i, w, h, l, t, f) in cases
        ],
        "image_id string, bytes binary, fmt string, "
        "aug_left int, aug_top int, aug_flip int",
    )
    rows = {
        r["image_id"]: r for r in augment_crop_flip(df, 12, 10).collect()
    }
    for (i, w, h, left, top, flip) in cases:
        px = FX.synth_pixels(i, w, h)
        cw, ch = w - left, h - top
        xs = (np.arange(12) * cw) // 12
        if flip:
            xs = cw - 1 - xs
        ys = top + (np.arange(10) * ch) // 10
        exp = px[ys][:, left + xs]
        r = rows[f"img{i}"]
        got = FX.png_decode(bytes(r["bytes"]))
        assert np.array_equal(got, exp), f"img{i} pixels"
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(
            int(s) for s in exp.astype(np.int64).sum(axis=(0, 1))
        )
        assert (r["w"], r["h"], r["flip"]) == (12, 10, flip)


def test_augment_crop_flip_rejects_bad_crop(spark):
    from osmquadtree_rust_spark.operators.multimodal import augment_crop_flip

    df = spark.createDataFrame(
        [("img0", bytearray(FX.png_encode(FX.synth_pixels(0, 16, 16))),
          "png", 16, 0, 0)],
        "image_id string, bytes binary, fmt string, "
        "aug_left int, aug_top int, aug_flip int",
    )
    with pytest.raises(Exception, match="outside"):
        augment_crop_flip(df, 8, 8).collect()


def test_patch_stats_vs_numpy(spark):
    from osmquadtree_rust_spark.operators.multimodal import patch_stats

    imgs = [FX.synth_pixels(2, 16, 16), FX.synth_pixels(5, 32, 24)]
    df = spark.createDataFrame(
        [
            (f"img{i}", bytearray(FX.png_encode(px)), "png")
            for i, px in enumerate(imgs)
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {
        (r["image_id"], r["px"], r["py"]):
            (r["sum_r"], r["sum_g"], r["sum_b"])
        for r in patch_stats(df, patch=8).collect()
    }
    exp = {}
    for i, px in enumerate(imgs):
        h, w = px.shape[0], px.shape[1]
        for py in range(h // 8):
            for gx in range(w // 8):
                blk = px[py * 8:(py + 1) * 8, gx * 8:(gx + 1) * 8].astype(
                    np.int64
                )
                exp[(f"img{i}", gx, py)] = tuple(
                    int(s) for s in blk.sum(axis=(0, 1))
                )
    assert got == exp
    assert len(got) == (16 // 8) * (16 // 8) + (32 // 8) * (24 // 8)


def test_patch_stats_rejects_ragged(spark):
    from osmquadtree_rust_spark.operators.multimodal import patch_stats

    df = spark.createDataFrame(
        [("img0", bytearray(FX.png_encode(FX.synth_pixels(0, 16, 16))),
          "png")],
        "image_id string, bytes binary, fmt string",
    )
    with pytest.raises(Exception, match="not divisible"):
        patch_stats(df, patch=5).collect()


def test_frame_diff_stats_vs_numpy(spark):
    from osmquadtree_rust_spark.operators.multimodal import frame_diff_stats

    rows = FX.synth_video_rows(3)
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = {
        (r["video_id"], r["frame_idx"]): r["diff_l1"]
        for r in frame_diff_stats(df).collect()
    }
    exp = {}
    for vid, data in rows:
        frames = [f.astype(np.int64) for f in FX.video_decode_frames(bytes(data))]
        for fi in range(1, len(frames)):
            exp[(vid, fi)] = int(np.abs(frames[fi] - frames[fi - 1]).sum())
    assert got == exp and len(exp) == 3 * (FX.VID_FRAMES - 1)
    assert all(v > 0 for v in exp.values())  # consecutive seeds differ


def test_patch_embeddings_vs_direct(spark):
    from osmquadtree_rust_spark.operators.multimodal import patch_embeddings

    img = FX.synth_pixels(3, 16, 16)
    df = spark.createDataFrame(
        [("img0", bytearray(FX.png_encode(img)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    got = {
        (r["px"], r["py"], r["dim"]): r["value"]
        for r in patch_embeddings(df, patch=8, dims=3).collect()
    }
    exp = {}
    px = img.astype(np.int64)
    for py in range(2):
        for gx in range(2):
            for d in range(3):
                tot = 0
                for y in range(py * 8, py * 8 + 8):
                    for x in range(gx * 8, gx * 8 + 8):
                        for c in range(3):
                            s = 1 - 2 * ((x * 73 + y * 151 + c * 37 + d * 101) % 2)
                            tot += s * int(px[y, x, c])
                exp[(gx, py, d)] = tot
    assert got == exp


def test_channel_entropy_flat_vs_spread(spark):
    from osmquadtree_rust_spark.operators.multimodal import (
        channel_entropy, image_histogram,
    )

    flat = np.full((8, 8, 3), 10, dtype=np.uint8)       # all in one bin
    spread = np.zeros((8, 8, 3), dtype=np.uint8)
    spread[:, :, 0] = (np.arange(64).reshape(8, 8) * 4) % 256  # 16 bins
    df = spark.createDataFrame(
        [
            ("flat", bytearray(FX.png_encode(flat)), "png"),
            ("spread", bytearray(FX.png_encode(spread)), "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {
        (r["image_id"], r["channel"]): (r["n_px"], r["ent_bits"])
        for r in channel_entropy(image_histogram(df, bins=16)).collect()
    }
    for ch in "rgb":
        assert got[("flat", ch)] == (64, 0)
    # spread r-channel: 16 bins x 4 pixels: 64*7 - 16*(4*3) = 256
    assert got[("spread", "r")] == (64, 64 * 7 - 16 * 4 * 3)
    assert got[("spread", "g")] == (64, 0)  # g stays constant 0
