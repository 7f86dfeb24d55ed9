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
