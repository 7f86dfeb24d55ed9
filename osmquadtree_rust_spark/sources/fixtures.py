"""Deterministic synthetic test fixtures (seed fixed, no external data).

Implements FIXTURES.md: the `images` table (image_id, bytes, w, h, fmt,
caption, phash) with real PNG payloads (pure-Python codec below — the
container has no imaging libraries) and a clearly-marked deterministic
stand-in for JPEG; the OSM-shaped `elements` tables that pin the reference
join/aggregate semantics; a `changes` table; and `tile_polygons`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..functions import qt_numpy as qtn

SEED = 42
NOUNS = ["river", "harbor", "forest", "plaza", "bridge", "meadow", "canyon", "island"]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 mixer over uint64 (public-domain algorithm)."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# ---------------------------------------------------------------------------
# minimal PNG codec (RGB8, filter 0) — real, verifiable image bytes
# ---------------------------------------------------------------------------

def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG (color type 2,
    bit depth 8, filter 0 rows, one IDAT)."""
    h, w, _ = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNGs produced by png_encode (filter 0/1/2 supported)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if f == 1:  # Sub
            for c in range(3, stride):
                row[c] = (int(row[c]) + int(row[c - 3])) & 0xFF
        elif f == 2:  # Up
            row = (row.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif f != 0:
            raise NotImplementedError(f"PNG filter {f}")
        out[r] = row.reshape(w, 3)
        prev = out[r].reshape(-1)
    return out


# JPEG is stubbed: the container ships no codec libraries, so `fmt='jpeg'`
# rows carry a deterministic container (magic + zlib pixels) that our decode
# path round-trips exactly; the PSNR>=40dB check therefore passes trivially
# for the stub while exercising the same Spark plumbing.  Swap in a real
# codec by replacing these two functions.
_JPEG_STUB_MAGIC = b"FAKEJPG1"


def jpeg_stub_encode(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return _JPEG_STUB_MAGIC + struct.pack(">II", w, h) + zlib.compress(pixels.tobytes(), 1)


def jpeg_stub_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _JPEG_STUB_MAGIC
    w, h = struct.unpack(">II", data[8:16])
    return np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return jpeg_stub_decode(data)
    raise NotImplementedError(f"unsupported fmt {fmt!r}")


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic gradient/pattern pixels keyed by i."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + i) % 256
    g = (yy * 255 // max(h - 1, 1) + 2 * i) % 256
    b = (xx + yy + 3 * i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# images table (FIXTURES.md §1)
# ---------------------------------------------------------------------------

W_CYCLE = [16, 32, 64, 128]
H_CYCLE = [16, 24, 48, 96]
FMT_CYCLE = ["png", "jpeg"]


def images_rows(n: int, with_bytes: bool = True):
    """List of dict rows for the images table; deterministic in i."""
    ph = splitmix64(np.arange(n, dtype=np.uint64)).astype(np.int64)
    rows = []
    for i in range(n):
        w = W_CYCLE[i % 4]
        h = H_CYCLE[i % 4]
        fmt = FMT_CYCLE[i % 2]
        if with_bytes:
            px = synth_pixels(i, w, h)
            data = png_encode(px) if fmt == "png" else jpeg_stub_encode(px)
        else:
            data = None
        rows.append(
            {
                "image_id": f"img{i:012d}",
                "bytes": bytearray(data) if data is not None else None,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption {i} {NOUNS[i % len(NOUNS)]}",
                "phash": int(ph[i]),
            }
        )
    return rows


def images_spark_df(spark, n: int, with_bytes: bool = True):
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]
    )
    rows = [
        (r["image_id"], bytes(r["bytes"]) if r["bytes"] is not None else None,
         r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for r in images_rows(n, with_bytes)
    ]
    return spark.createDataFrame(rows, schema)


def phash_footprint(phash: np.ndarray, w: np.ndarray, h: np.ndarray):
    """FIXTURES.md footprint rule: deinterleave phash bits geohash-style to
    a (lon, lat) centre, extent = pixel dims x FOOTPRINT_SCALE."""
    from .synth import FOOTPRINT_SCALE

    p = np.asarray(phash, dtype=np.uint64)
    lon_bits = np.zeros(p.shape, dtype=np.uint64)
    lat_bits = np.zeros(p.shape, dtype=np.uint64)
    for k in range(32):
        lon_bits |= ((p >> np.uint64(2 * k)) & np.uint64(1)) << np.uint64(k)
        lat_bits |= ((p >> np.uint64(2 * k + 1)) & np.uint64(1)) << np.uint64(k)
    lon = ((lon_bits >> np.uint64(1)).astype(np.int64) * 3600000000 >> 31) - 1800000000
    lat = ((lat_bits >> np.uint64(1)).astype(np.int64) * 1800000000 >> 31) - 900000000
    we = np.asarray(w, dtype=np.int64) * FOOTPRINT_SCALE
    he = np.asarray(h, dtype=np.int64) * FOOTPRINT_SCALE
    return (
        np.maximum(lon - we, -1800000000),
        np.maximum(lat - he, -900000000),
        np.minimum(lon + we, 1800000000),
        np.minimum(lat + he, 900000000),
    )


# ---------------------------------------------------------------------------
# OSM-shaped elements fixture (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def elements_fixture(n_nodes: int = 2000, n_ways: int = 400, n_rels: int = 60):
    """(nodes, ways, relations) as plain dicts, deterministic.

    nodes: {id: (lon, lat)}; ways: {id: [node ids]};
    relations: {id: [(mem_type, mem_ref)]} with 0=node 1=way 2=relation.
    Grid spans several quadrants incl. antimeridian/equator straddles.
    """
    rng = np.random.RandomState(SEED)
    side = int(np.ceil(np.sqrt(n_nodes)))
    ids = np.arange(1, n_nodes + 1, dtype=np.int64)
    gx = (ids - 1) % side
    gy = (ids - 1) // side
    lon = (-1700000000 + gx * (3400000000 // side)).astype(np.int64)
    lat = (-850000000 + gy * (1700000000 // side)).astype(np.int64)
    lon = lon + rng.randint(-500000, 500000, n_nodes)
    lat = lat + rng.randint(-500000, 500000, n_nodes)
    # straddlers: pin some nodes right at the equator/meridian/antimeridian
    for k, (lo, la) in enumerate(
        [(0, 0), (-1, 0), (1, -1), (-1799999999, 0), (1799999998, 5),
         (3, 899999998), (7, -899999999), (0, 450000000), (-900000000, 0)]
    ):
        lon[k], lat[k] = lo, la
    nodes = {int(i): (int(lon[k]), int(lat[k])) for k, i in enumerate(ids)}

    ways = {}
    node_list = list(nodes)
    for wi in range(1, n_ways + 1):
        ln = int(rng.randint(2, 31))
        start = int(rng.randint(0, n_nodes))
        if wi % 7 == 0:
            # crossing ways: sample far-apart nodes so way qt < node depth
            refs = [node_list[int(rng.randint(0, n_nodes))] for _ in range(ln)]
        else:
            refs = [node_list[(start + j) % n_nodes] for j in range(ln)]
        ways[wi] = refs

    relations = {}
    way_list = list(ways)
    for ri in range(1, n_rels + 1):
        mems = []
        if ri == 1:
            pass  # empty relation -> qt 0
        elif ri == 2:
            mems = [(2, ri)]  # self-reference (find_update.rs:482-484)
        elif ri <= 8:
            # chain of depth ri-2 (1..6): ri references ri+1... built below
            mems = [(2, ri + 100)]
        elif ri % 3 == 0:
            mems = [(0, node_list[int(rng.randint(0, n_nodes))]) for _ in range(3)]
        elif ri % 3 == 1:
            mems = [(1, way_list[int(rng.randint(0, n_ways))]) for _ in range(2)]
        else:
            mems = [
                (0, node_list[int(rng.randint(0, n_nodes))]),
                (1, way_list[int(rng.randint(0, n_ways))]),
                (2, (ri % n_rels) + 1),
            ]
        relations[ri] = mems
    # rel-of-rel chains rooted at 103..108 with descending tails
    for d in range(6):
        base = 103 + d
        chain = [base]
        for j in range(d + 1):
            nxt = 200 + 10 * d + j
            relations[chain[-1]] = relations.get(chain[-1], []) + [(2, nxt)]
            chain.append(nxt)
        relations[chain[-1]] = [(0, node_list[d])]
    return nodes, ways, relations


def elements_spark_dfs(spark, nodes, ways, relations):
    nodes_df = spark.createDataFrame(
        [(i, ln, lt) for i, (ln, lt) in sorted(nodes.items())],
        "id long, lon long, lat long",
    )
    ways_df = spark.createDataFrame(
        [(i, refs) for i, refs in sorted(ways.items())],
        "id long, refs array<long>",
    )
    rels_df = spark.createDataFrame(
        [
            (i, [{"mem_type": t, "mem_ref": r} for t, r in mems])
            for i, mems in sorted(relations.items())
        ],
        "id long, members array<struct<mem_type:int, mem_ref:long>>",
    )
    return nodes_df, ways_df, rels_df
