"""Multimodal (image) column operators.

Images travel as opaque `binary` columns with typed metadata (w, h, fmt).
Decode / feature-extract / resize run as Arrow-batched pandas iterators
over mapInPandas — the Spark-side plumbing (schema, batching, partition
behaviour) is real; the JPEG codec itself is a clearly-marked
deterministic stub (sources/fixtures.py) because this container ships no
imaging libraries, while PNG rows use a real (pure-Python) codec.
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
            out = {k: [] for k in ("image_id", "w", "h", "fmt", "n_pixels", "mean_r", "mean_g", "mean_b")}
            for _, row in pdf.iterrows():
                px = FX.decode_image(bytes(row["bytes"]), row["fmt"])
                out["image_id"].append(row["image_id"])
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["fmt"].append(row["fmt"])
                out["n_pixels"].append(int(px.shape[0] * px.shape[1]))
                m = px.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(round(float(m[0]), 6))
                out["mean_g"].append(round(float(m[1]), 6))
                out["mean_b"].append(round(float(m[2]), 6))
            yield pd.DataFrame(out)

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
        for pdf in it:
            recs = []
            for _, row in pdf.iterrows():
                px = FX.decode_image(bytes(row["bytes"]), row["fmt"])
                ys = (np.arange(out_h) * px.shape[0] // out_h).astype(int)
                xs = (np.arange(out_w) * px.shape[1] // out_w).astype(int)
                small = px[ys][:, xs]
                recs.append(
                    (row["image_id"], FX.png_encode(small), out_w, out_h, "png")
                )
            yield pd.DataFrame(
                recs, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.mapInPandas(batches, RESIZE_SCHEMA)
