"""Multimodal (image) column operators.

Images travel as opaque `binary` columns with typed metadata (w, h, fmt).
Decode / feature-extract / resize run as Arrow-batched pandas iterators
over mapInPandas — the Spark-side plumbing (schema, batching, partition
behaviour) is real.  Codecs (sources/fixtures.py): PNG is a real
pure-Python codec; fmt='jpeg' is a real lossy DCT-quantization codec
(JPEG's transform path with zlib standing in for the Huffman stage,
since this container ships no imaging libraries).

The codec call is inherently per-image; everything around it iterates
via zip() over the Arrow-backed columns (never pdf.iterrows(), which
constructs a pandas Series per row).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import fixtures as FX

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("n_pixels", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


DECODE_VERIFY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("psnr_ok", LongType()),
    ]
)


def decode_verify(
    images: DataFrame,
    ref_pixels,
    lossless_fmts: tuple[str, ...] = ("png",),
    min_psnr_db: float = 40.0,
) -> DataFrame:
    """Decode every image and verify it against reference pixels — the
    BASELINE.json per-row invariant (decoded-pixel equality for lossless,
    PSNR >= 40 dB for lossy) as a first-class operator.

    `ref_pixels(image_id, w, h) -> (h, w, 3) uint8` supplies the expected
    pixels (ships to executors by closure).  Output per image:
    - exact integer channel sums of the DECODED pixels for lossless
      formats (NULL for lossy — quantization error makes them
      non-derivable), deterministic and cross-engine comparable;
    - psnr_ok = 1 when the invariant holds (exact match for lossless,
      PSNR >= min_psnr_db for lossy).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sums = np.zeros((n, 3), dtype=np.int64)
            lossless = np.zeros(n, dtype=bool)
            ok = np.zeros(n, dtype=np.int64)
            npx = np.zeros(n, dtype=np.int64)
            for idx, (image_id, data, fmt, w, h) in enumerate(
                zip(pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"])
            ):
                px = FX.decode_image(bytes(data), fmt)
                npx[idx] = px.shape[0] * px.shape[1]
                ref = ref_pixels(str(image_id), int(w), int(h))
                if fmt in lossless_fmts:
                    lossless[idx] = True
                    if px.ndim == 3 and px.shape[2] == 3:
                        sums[idx] = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    ok[idx] = 1 if bool(np.array_equal(px, ref)) else 0
                elif px.shape != ref.shape:
                    # a corrupt/mislabeled row whose decoded dims differ
                    # from the metadata is a per-row VERIFY FAILURE, not a
                    # job-killing broadcast error in the subtraction
                    ok[idx] = 0
                else:
                    mse = float(
                        np.mean(
                            (px.astype(np.float64) - ref.astype(np.float64)) ** 2
                        )
                    )
                    psnr = float("inf") if mse == 0.0 else 10.0 * np.log10(
                        255.0 * 255.0 / mse
                    )
                    ok[idx] = 1 if psnr >= min_psnr_db else 0
            out = pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "w": pdf["w"].to_numpy(),
                    "h": pdf["h"].to_numpy(),
                    "fmt": pdf["fmt"].to_numpy(),
                    "n_pixels": npx,
                    "sum_r": pd.array(
                        [int(s) if l else None for s, l in zip(sums[:, 0], lossless)],
                        dtype="Int64",
                    ),
                    "sum_g": pd.array(
                        [int(s) if l else None for s, l in zip(sums[:, 1], lossless)],
                        dtype="Int64",
                    ),
                    "sum_b": pd.array(
                        [int(s) if l else None for s, l in zip(sums[:, 2], lossless)],
                        dtype="Int64",
                    ),
                    "psnr_ok": ok,
                }
            )
            yield out

    return images.mapInPandas(batches, DECODE_VERIFY_SCHEMA)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit per-image pixel statistics.

    mapInPandas keeps whole Arrow batches in flight; no per-row Python
    call overhead beyond the decode itself.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            w = np.empty(n, dtype=np.int32)
            h = np.empty(n, dtype=np.int32)
            npx = np.empty(n, dtype=np.int64)
            means = np.empty((n, 3), dtype=np.float64)
            for idx, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                px = FX.decode_image(bytes(data), fmt)
                h[idx], w[idx] = px.shape[0], px.shape[1]
                npx[idx] = px.shape[0] * px.shape[1]
                means[idx] = px.reshape(-1, 3).mean(axis=0)
            means = np.round(means, 6)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "w": w,
                    "h": h,
                    "fmt": pdf["fmt"].to_numpy(),
                    "n_pixels": npx,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                }
            )

    return images.mapInPandas(batches, DECODE_STATS_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("phash", LongType()),
    ]
)


def _phash64(px: np.ndarray) -> int:
    """Classic DCT perceptual hash (public algorithm): grayscale ->
    32x32 nearest resize -> 2D DCT-II -> top-left 8x8 low-frequency block
    (minus DC) -> bit = coefficient > median.  Near-duplicate images land
    within small Hamming distance, so the SimHash banding machinery
    (operators/dedup.simhash_neardup_pairs) applies unchanged."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).astype(int)
    xs = (np.arange(32) * w // 32).astype(int)
    small = gray[ys][:, xs]
    # 32x32 DCT-II via two 8x8... use direct matrix for 32
    k = np.arange(32)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 64.0)
    m[0, :] = 1.0
    m *= np.where(k == 0, np.sqrt(1.0 / 32.0), np.sqrt(2.0 / 32.0))[:, None]
    coeff = m @ small @ m.T
    block = coeff[:8, :8].flatten()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = 0
    for i, v in enumerate(vals[:64]):
        if v > med:
            bits |= 1 << i
    return bits


def image_phash(images: DataFrame) -> DataFrame:
    """(image_id, phash) via decode + DCT pHash, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                ids.append(image_id)
                hashes.append(_phash64(FX.decode_image(bytes(data), fmt)))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "phash": np.array(hashes, dtype=np.uint64).view(np.int64),
                }
            )

    return images.mapInPandas(batches, PHASH_SCHEMA)


def image_neardup_pairs(images: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs: pHash + pigeonhole-banded Hamming join
    (same scale-safe candidate generation as text SimHash)."""
    from . import dedup as D
    from pyspark.sql import functions as F

    sigs = image_phash(images).select(
        F.col("image_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    return D.simhash_neardup_pairs(sigs, max_hamming=max_hamming).withColumnsRenamed(
        {"a": "image_a", "b": "image_b"}
    )


def multimodal_neardup_pairs(
    pairs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 3,
    threshold_ppm: int = 500000,
    n: int = 3,
    df_cap: int | None = None,
    policy: str = "both",
    fast: bool = True,
) -> DataFrame:
    """Joint near-dup over image+caption PAIRS — the north-star input
    table's (phash, caption) columns judged together.

    policy='both': a pair is a duplicate only when the images are
    phash-near (Hamming <= max_hamming) AND the captions are n-gram-
    Jaccard-near (>= threshold_ppm) — the strict training-pair dedup.
    policy='any': either modality suffices (full outer union; the missing
    side's metric is NULL).

    Both sides are recall-exact candidate generators (pigeonhole banding
    for the phash, shared-shingle equi-join for the caption), so the
    result is provably identical to brute force under either policy and
    the DuckDB oracle may stay quadratic.

    policy='both' takes the conjunction fast path by default
    (fast=True): image-banded candidates first, then the caption n-gram
    verify RESTRICTED to those pairs (ngram_jaccard_on_pairs) — strictly
    fewer rows than the caption pipeline over the full corpus, since the
    shingle equi-join only ever sees docs that already image-matched.
    The image candidate set is persisted before the double consumption
    (id harvest + verify join) so its banding subtree computes once;
    the cache lives until Spark's LRU evicts it or the caller clears it
    (`df.unpersist()` on a collected result's lineage is not reachable,
    so long-lived sessions calling this repeatedly should
    `spark.catalog.clearCache()` between rounds).
    fast=False keeps the generic run-both-pipelines composition
    (property-tested equal); 'any' always composes generically (it needs
    both full pipelines by definition).

    Returns (a, b, hamming, jaccard_ppm); under 'any' one metric may be
    NULL when only the other modality matched."""
    from . import dedup as D

    if policy not in ("both", "any"):
        raise ValueError(f"policy={policy!r} must be 'both' or 'any'")
    img = D.simhash_neardup_pairs(
        pairs.select(
            F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
        ),
        max_hamming=max_hamming,
    )
    # the restricted verify requires threshold_ppm > 0 (its intersection
    # join drops zero-overlap pairs); at 0, use the generic composition
    if policy == "both" and fast and threshold_ppm > 0:
        img = img.persist()
        txt = D.ngram_jaccard_on_pairs(
            img,
            pairs.select(
                F.col(id_col).alias("doc_id"), F.col(caption_col).alias("text")
            ),
            n=n,
            threshold_ppm=threshold_ppm,
            df_cap=df_cap,
        )
        return img.join(txt, ["a", "b"])
    txt = D.ngram_neardup_pairs(
        pairs.select(F.col(id_col).alias("doc_id"), F.col(caption_col).alias("text")),
        n=n,
        threshold_ppm=threshold_ppm,
        df_cap=df_cap,
    )
    how = "inner" if policy == "both" else "full"
    return img.join(txt, ["a", "b"], how)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_nearest(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize, re-encoded as PNG (deterministic)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys_cache: dict[int, np.ndarray] = {}
        xs_cache: dict[int, np.ndarray] = {}
        for pdf in it:
            recs = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px = FX.decode_image(bytes(data), fmt)
                ih, iw = px.shape[0], px.shape[1]
                if ih not in ys_cache:
                    ys_cache[ih] = (np.arange(out_h) * ih // out_h).astype(int)
                if iw not in xs_cache:
                    xs_cache[iw] = (np.arange(out_w) * iw // out_w).astype(int)
                small = px[ys_cache[ih]][:, xs_cache[iw]]
                recs.append((image_id, FX.png_encode(small), out_w, out_h, "png"))
            yield pd.DataFrame(
                recs, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.mapInPandas(batches, RESIZE_SCHEMA)


GRADIENT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("grad_l1", LongType()),
        StructField("edge_px", LongType()),
    ]
)


def image_gradient_stats(images: DataFrame, edge_thr: int = 512) -> DataFrame:
    """Integer Sobel feature extraction: per image, the exact L1
    gradient energy and edge-pixel count of the decoded pixels.

    Per channel, the 3x3 Sobel responses gx/gy are computed on int64
    pixels with pure slicing (separable smooth-then-difference — no
    scipy, no floats); `grad_l1` sums |gx| + |gy| over all channels and
    interior pixels, and `edge_px` counts interior pixels whose
    cross-channel response total reaches `edge_thr` (512 = two
    byte-scale steps — a visible edge, not gradient-ramp noise).
    Exact integers, so the gate hash-compares against a DuckDB oracle
    that re-derives the responses from the synth_pixels closed forms
    without decoding (the image_decode_stats construction).

    Images smaller than 3x3 have no interior and report zeros.  Scale
    shape: one mapInPandas projection, Arrow-batched; the output is
    one small row per image.
    """
    thr = int(edge_thr)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px = FX.decode_image(bytes(data), fmt).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if h < 3 or w < 3:
                    recs.append((image_id, w, h, 0, 0))
                    continue
                pp = np.zeros((h - 2, w - 2), dtype=np.int64)
                for c in range(px.shape[2]):
                    P = px[:, :, c]
                    col = P[:-2, :] + 2 * P[1:-1, :] + P[2:, :]
                    gx = col[:, 2:] - col[:, :-2]
                    row = P[:, :-2] + 2 * P[:, 1:-1] + P[:, 2:]
                    gy = row[2:, :] - row[:-2, :]
                    pp += np.abs(gx) + np.abs(gy)
                recs.append(
                    (image_id, w, h, int(pp.sum()), int((pp >= thr).sum()))
                )
            yield pd.DataFrame(
                recs, columns=["image_id", "w", "h", "grad_l1", "edge_px"]
            )

    return images.mapInPandas(batches, GRADIENT_SCHEMA)


AUGMENT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("flip", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def augment_crop_flip(
    images: DataFrame,
    out_w: int,
    out_h: int,
    left_col: str = "aug_left",
    top_col: str = "aug_top",
    flip_col: str = "aug_flip",
) -> DataFrame:
    """Deterministic augmentation — crop, optional horizontal flip,
    nearest-neighbour resize to (out_w, out_h) — re-encoded as PNG with
    exact output channel sums (the value the gate pins).

    The augmentation parameters are COLUMNS (per-image crop offsets and
    a 0/1 flip), not hidden randomness: a training pipeline derives
    them from a seed + image id upstream, so the same row always
    produces the same bytes (reproducible epochs, cacheable shards).

    Source index maps are pure integer ops mirrored by the oracle:
    sx(x) = left + (x * cw) DIV out_w, mirrored to
    left + cw - 1 - (x * cw) DIV out_w when flipped, with
    cw = in_w - left (and sy likewise, never flipped).

    Scale shape: one mapInPandas projection, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for image_id, data, fmt, left, top, flip in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"],
                pdf[left_col], pdf[top_col], pdf[flip_col],
            ):
                px = FX.decode_image(bytes(data), fmt)
                ih, iw = px.shape[0], px.shape[1]
                left, top, flip = int(left), int(top), int(flip)
                if not (0 <= left < iw and 0 <= top < ih):
                    raise ValueError(
                        f"augment_crop_flip: crop ({left},{top}) outside "
                        f"{iw}x{ih} for {image_id}"
                    )
                cw, ch = iw - left, ih - top
                xs = (np.arange(out_w) * cw) // out_w
                if flip:
                    xs = cw - 1 - xs
                ys = top + (np.arange(out_h) * ch) // out_h
                out = px[ys][:, left + xs]
                sums = out.astype(np.int64).sum(axis=(0, 1))
                recs.append(
                    (
                        image_id, FX.png_encode(out), out_w, out_h, flip,
                        int(sums[0]), int(sums[1]), int(sums[2]),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "image_id", "bytes", "w", "h", "flip",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return images.mapInPandas(batches, AUGMENT_SCHEMA)


PATCH_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def patch_stats(images: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch extraction: split each decoded image into a grid
    of `patch` x `patch` pixel patches and emit exact per-patch channel
    sums — the pre-embedding statistics a vision-training pipeline
    computes (patch means feed normalization; degenerate-patch
    detection cuts blank tiles).

    Image dimensions must be divisible by `patch` (raise, not a silent
    partial patch — a ragged edge would mean a different model input
    contract).  Patch (px, py) covers x in [px*patch, (px+1)*patch).

    Scale shape: one mapInPandas projection; the per-image reshape is a
    numpy view (no copy), sums vectorized over all patches at once.
    Output fans out (w*h)/patch^2 small rows per image."""
    P = int(patch)
    if P <= 0:
        raise ValueError(f"patch={patch} must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px = FX.decode_image(bytes(data), fmt).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if h % P or w % P:
                    raise ValueError(
                        f"patch_stats: {w}x{h} not divisible by patch={P} "
                        f"for {image_id}"
                    )
                ny, nx = h // P, w // P
                # (ny, P, nx, P, c) view -> sums over the two P axes
                sums = px.reshape(ny, P, nx, P, 3).sum(axis=(1, 3))
                for py in range(ny):
                    for gx in range(nx):
                        recs.append(
                            (
                                image_id, gx, py,
                                int(sums[py, gx, 0]),
                                int(sums[py, gx, 1]),
                                int(sums[py, gx, 2]),
                            )
                        )
            yield pd.DataFrame(
                recs,
                columns=["image_id", "px", "py", "sum_r", "sum_g", "sum_b"],
            )

    return images.mapInPandas(batches, PATCH_SCHEMA)


PATCH_EMB_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("dim", IntegerType()),
        StructField("value", LongType()),
    ]
)


def patch_embeddings(
    images: DataFrame, patch: int = 8, dims: int = 4
) -> DataFrame:
    """Integer patch embeddings — the deterministic stand-in for a ViT
    patch-embedding layer: each `patch` x `patch` block projects to
    `dims` values through a seeded +-1 sign matrix

        sign(x, y, c, d) = 1 - 2*((x*73 + y*151 + c*37 + d*101) % 2)
        value(d) = SUM over the patch's (x, y, c) of sign * pixel

    (x, y are IMAGE coordinates, so the matrix is position-dependent
    like a learned embedding, and the whole computation is exact int64
    both engines — the oracle composes the fixture pixel formulas with
    the same sign text).  Dimensions must divide as in patch_stats.

    Scale shape: one mapInPandas projection; the per-image work is one
    cached sign tensor and a vectorized blockwise einsum; output fans
    out dims * (w*h)/patch^2 small rows per image."""
    P, K = int(patch), int(dims)
    if P <= 0 or K <= 0:
        raise ValueError("patch and dims must be positive")

    sign_cache: dict = {}

    def signs(h: int, w: int) -> np.ndarray:
        key = (h, w)
        if key not in sign_cache:
            y, x, c, d = np.ogrid[0:h, 0:w, 0:3, 0:K]
            sign_cache[key] = (
                1 - 2 * ((x * 73 + y * 151 + c * 37 + d * 101) % 2)
            ).astype(np.int64)
        return sign_cache[key]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px = FX.decode_image(bytes(data), fmt).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if h % P or w % P:
                    raise ValueError(
                        f"patch_embeddings: {w}x{h} not divisible by "
                        f"patch={P} for {image_id}"
                    )
                ny, nx = h // P, w // P
                prod = px[:, :, :, np.newaxis] * signs(h, w)
                vals = prod.reshape(ny, P, nx, P, 3, K).sum(
                    axis=(1, 3, 4)
                )
                for py in range(ny):
                    for gx in range(nx):
                        for d in range(K):
                            recs.append(
                                (image_id, gx, py, d, int(vals[py, gx, d]))
                            )
            yield pd.DataFrame(
                recs, columns=["image_id", "px", "py", "dim", "value"]
            )

    return images.mapInPandas(batches, PATCH_EMB_SCHEMA)


HISTOGRAM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("channel", StringType()),
        StructField("bin", IntegerType()),
        StructField("cnt", LongType()),
    ]
)


def image_histogram(images: DataFrame, bins: int = 16) -> DataFrame:
    """Per-channel brightness histograms of the decoded pixels — the
    exposure/clipping QA signal an image-curation pipeline cuts on
    (all-dark, all-bright, or low-dynamic-range images show up as mass
    concentrated in few bins).

    `bins` must divide 256; bin = pixel_value DIV (256/bins).  Emits
    one row per NON-EMPTY (image, channel, bin) — exact integer counts,
    so the gate hash-compares against a DuckDB oracle deriving the same
    counts from the fixture pixel formulas without decoding.

    Scale shape: one mapInPandas projection (np.bincount per channel),
    <= 3*bins small rows out per image.
    """
    if 256 % bins != 0:
        raise ValueError(f"bins={bins} must divide 256")
    width = 256 // bins

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = ["r", "g", "b"]
        for pdf in it:
            recs = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px = FX.decode_image(bytes(data), fmt)
                for c in range(min(px.shape[2], 3)):
                    counts = np.bincount(
                        (px[:, :, c].ravel() // width).astype(np.int64),
                        minlength=bins,
                    )
                    recs.extend(
                        (image_id, names[c], int(b), int(n))
                        for b, n in enumerate(counts)
                        if n > 0
                    )
            yield pd.DataFrame(
                recs, columns=["image_id", "channel", "bin", "cnt"]
            )

    return images.mapInPandas(batches, HISTOGRAM_SCHEMA)


FRAME_DIFF_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("diff_l1", LongType()),
    ]
)


def frame_diff_stats(videos: DataFrame) -> DataFrame:
    """Scene-change signal: exact L1 distance between consecutive
    decoded frames (sum of |delta| over pixels and channels) — the
    shot-boundary / static-clip detector a video-curation pipeline
    thresholds on (near-zero runs = frozen footage, spikes = cuts).
    `frame_idx` is the LATER frame of each pair.

    Scale shape: one mapInPandas projection; a video row fans out to
    n_frames - 1 small rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                prev = None
                for fi, frame in enumerate(
                    FX.video_decode_frames(bytes(data))
                ):
                    cur = frame.astype(np.int64)
                    if prev is not None:
                        recs.append(
                            (vid, fi, int(np.abs(cur - prev).sum()))
                        )
                    prev = cur
            yield pd.DataFrame(
                recs, columns=["video_id", "frame_idx", "diff_l1"]
            )

    return videos.mapInPandas(batches, FRAME_DIFF_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 5) -> DataFrame:
    """Explode videos into every Nth frame (re-encoded PNG) — the frame-
    sampling stage of a video training pipeline.  One input row fans out
    to ceil(n_frames / every_n) rows inside the Arrow batch; at 100 TB
    the repartition belongs BEFORE this operator (rows expand)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                for idx, frame in enumerate(FX.video_decode_frames(bytes(data))):
                    if idx % every_n == 0:
                        recs.append(
                            (
                                video_id,
                                idx,
                                FX.png_encode(frame),
                                frame.shape[1],
                                frame.shape[0],
                            )
                        )
            yield pd.DataFrame(
                recs, columns=["video_id", "frame_idx", "bytes", "w", "h"]
            )

    return videos.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_milli", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(audios: DataFrame) -> DataFrame:
    """Per-clip DSP features (duration, RMS, zero-crossing count) —
    vectorized numpy per clip, Arrow-batched rows.  Integer outputs
    (FLOOR-milli RMS) so results are engine/platform exact."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for audio_id, data in zip(pdf["audio_id"], pdf["bytes"]):
                sr, s = FX.audio_decode(bytes(data))
                x = s.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x))) if len(s) else 0.0
                zc = int(np.sum((s[:-1] >= 0) != (s[1:] >= 0))) if len(s) > 1 else 0
                recs.append(
                    (
                        audio_id,
                        sr,
                        len(s),
                        int(len(s) * 1000 // sr) if sr else 0,
                        int(np.floor(rms * 1000.0)),
                        zc,
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "audio_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "rms_milli",
                    "zero_crossings",
                ],
            )

    return audios.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def image_dedup_keep_best(
    sigs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    quality_col: str = "quality",
    max_hamming: int = 3,
) -> DataFrame:
    """Corpus-level image dedup: keep ONE best image per perceptual-hash
    duplicate CLUSTER — the image half of training-set curation (the
    pair table from image_neardup_pairs only names duplicates; real
    pipelines must then pick a keeper per transitive cluster, e.g. the
    highest-resolution copy of a meme reposted 10^5 times).

    `sigs` is (id, phash, quality): phash from image_phash (or any
    64-bit perceptual signature), quality the keep-preference (w*h from
    decode_stats, a sharpness score, ...).  Composition, all bounded:
    pigeonhole-banded Hamming candidate pairs (recall-exact, the text
    SimHash machinery) -> min-label connected components (O(diameter)
    shuffles, constant lineage) -> salted keep-best (a mega-cluster
    never sorts on one task).  Integral ids required (the
    connected_components contract; map string ids through a dense id
    table first).

    Returns the kept rows of `sigs` unchanged (losers dropped)."""
    from . import dedup as D

    pairs = D.simhash_neardup_pairs(
        sigs.select(
            F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
        ),
        max_hamming=max_hamming,
    ).select("a", "b")
    comps = D.connected_components(
        sigs.select(F.col(id_col).alias("doc_id")), pairs
    )
    kept = D.dedup_keep_best(
        sigs.withColumnRenamed(id_col, "doc_id"),
        comps,
        order=quality_col,
    )
    return kept.withColumnRenamed("doc_id", id_col)


def geo_image_dedup_keep_best(
    sigs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    quality_col: str = "quality",
    lon: str = "lon",
    lat: str = "lat",
    max_hamming: int = 3,
    radius_mm: int = 500_000,
) -> DataFrame:
    """Spatially-constrained image dedup: two images are duplicates only
    when they are phash-near (Hamming <= max_hamming) AND taken within
    `radius_mm` great-circle millimetres of each other — the
    geo-image-corpus curation rule (the same street photographed from
    the same spot collapses; the same meme template re-shot on another
    continent is a distinct observation and survives).

    Composition, every stage bounded: pigeonhole-banded Hamming
    candidate pairs (recall-exact) -> per-pair chord verify (integer-mm
    great-circle chord, trajectory._chord_mm_udf — two entity-sized
    hash joins attach coordinates to the pair frame, never a spatial
    all-pairs) -> min-label connected components over the surviving
    pairs -> salted keep-best by `quality_col`.  Note transitive
    chaining is the standard CC semantic: a chain of pairwise-co-located
    dups can span more than radius_mm end to end.

    `sigs` is (id, phash, quality, lon, lat) with fixed-point 1e-7 deg
    coordinates.  Returns the kept rows of `sigs` unchanged."""
    from . import dedup as D
    from .trajectory import _chord_mm_udf

    if radius_mm < 0:
        raise ValueError(f"radius_mm={radius_mm} must be >= 0")
    pairs = D.simhash_neardup_pairs(
        sigs.select(
            F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
        ),
        max_hamming=max_hamming,
    ).select("a", "b")
    pa = sigs.select(
        F.col(id_col).alias("a"),
        F.col(lon).alias("__alon"),
        F.col(lat).alias("__alat"),
    )
    pb = sigs.select(
        F.col(id_col).alias("b"),
        F.col(lon).alias("__blon"),
        F.col(lat).alias("__blat"),
    )
    near = (
        pairs.join(pa, "a")
        .join(pb, "b")
        .filter(
            _chord_mm_udf(
                F.col("__alon"), F.col("__alat"), F.col("__blon"), F.col("__blat")
            )
            <= F.lit(int(radius_mm))
        )
        .select("a", "b")
    )
    comps = D.connected_components(
        sigs.select(F.col(id_col).alias("doc_id")), near
    )
    kept = D.dedup_keep_best(
        sigs.withColumnRenamed(id_col, "doc_id"), comps, order=quality_col
    )
    return kept.withColumnRenamed("doc_id", id_col)


def channel_entropy(hist: DataFrame) -> DataFrame:
    """Integer entropy proxy per (image, channel) from image_histogram
    output — the flat/low-information detector: with n = total pixels
    and bin counts c_i,

        ent_bits = n * len(bin(n)) - SUM(c_i * len(bin(c_i)))

    (the whole-bit surrogate of n*H = sum c_i*log2(n/c_i); zero when
    every pixel sits in one bin, growing with spread — exact integer
    bit math both engines, the text-stack idf trick).  Pure JVM
    aggregate over the histogram rows; no decode."""
    return (
        hist.groupBy("image_id", "channel")
        .agg(
            F.sum("cnt").alias("n_px"),
            F.sum(
                F.col("cnt") * F.length(F.bin(F.col("cnt")))
            ).alias("__s"),
        )
        .select(
            "image_id",
            "channel",
            F.col("n_px").cast("long"),
            (
                F.col("n_px") * F.length(F.bin(F.col("n_px"))) - F.col("__s")
            ).cast("long").alias("ent_bits"),
        )
    )
