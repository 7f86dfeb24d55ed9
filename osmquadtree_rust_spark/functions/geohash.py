"""Geohash encoding (public algorithm) as the generalized alternate cell
index (BASELINE.json asks for hierarchical H3/S2-style indexing; no such
native libraries ship in this container, so the engine's canonical index
is the reference-exact quadtree cell and geohash is the public
general-purpose alternative — both hierarchical-prefix codes).

All arithmetic is integer-exact and emitted identically for Spark SQL and
DuckDB: bit index = floor((coord + offset) * 2^k / span) computed as
(x*m - (x*m) % span) / span over int64 (quotient < 2^53 so the double
division is exact), then bit-interleaved (lon first, per the geohash
spec) into a 5*chars-bit code.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits_for(chars: int) -> tuple[int, int]:
    total = 5 * chars
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_int_np(lon_fixed, lat_fixed, chars: int = 8) -> np.ndarray:
    """Integer geohash (the 5*chars-bit interleaved code) from fixed-point
    1e-7-degree coordinates."""
    lon_bits, lat_bits = _bits_for(chars)
    lon = np.asarray(lon_fixed, dtype=np.int64) + 1800000000
    lat = np.asarray(lat_fixed, dtype=np.int64) + 900000000
    # canonical geohash: idx = floor(frac * 2^bits), clamped at +180/+90
    x = np.minimum((lon << lon_bits) // 3600000000, (1 << lon_bits) - 1)
    y = np.minimum((lat << lat_bits) // 1800000000, (1 << lat_bits) - 1)
    out = np.zeros(x.shape, dtype=np.int64)
    for i in range(5 * chars):
        # geohash interleave: even positions (from the top) take lon bits
        pos = 5 * chars - 1 - i  # output bit position
        if i % 2 == 0:
            src = x >> (lon_bits - 1 - i // 2)
        else:
            src = y >> (lat_bits - 1 - i // 2)
        out |= (src & 1) << pos
    return out


def geohash_str_np(lon_fixed, lat_fixed, chars: int = 8) -> list[str]:
    vals = geohash_int_np(lon_fixed, lat_fixed, chars)
    out = []
    for v in np.atleast_1d(vals):
        s = "".join(
            BASE32[(int(v) >> (5 * (chars - 1 - c))) & 31] for c in range(chars)
        )
        out.append(s)
    return out


def geohash_int_sql(lon: str, lat: str, chars: int = 8, dialect: str = "duckdb") -> str:
    """Same computation as SQL text (dialect-neutral except shifts).

    chars <= 8 only: the exact-division trick needs the shifted coordinate
    to stay under 2^53 so the double division is exact in both engines.
    """
    if chars > 8:
        raise ValueError("geohash_int_sql supports chars <= 8")
    x, y = geohash_xy_sql(lon, lat, chars, dialect)
    return interleave_sql(x, y, chars, dialect)


def geohash_xy_sql(
    lon: str, lat: str, chars: int = 8, dialect: str = "duckdb"
) -> tuple[str, str]:
    """The cell's integer grid coordinates (x = lon index of lon_bits
    bits, y = lat index) as SQL text — the de-interleaved form the
    neighbor math operates on."""
    lon_bits, lat_bits = _bits_for(chars)
    shl = _shl_fn(dialect)
    lon_u = f"(CAST({lon} AS BIGINT) + 1800000000)"
    lat_u = f"(CAST({lat} AS BIGINT) + 900000000)"
    xm = shl(lon_u, lon_bits)
    ym = shl(lat_u, lat_bits)
    x = (
        f"LEAST(CAST(({xm} - ({xm}) % 3600000000) / 3600000000.0 AS BIGINT), "
        f"{(1 << lon_bits) - 1})"
    )
    y = (
        f"LEAST(CAST(({ym} - ({ym}) % 1800000000) / 1800000000.0 AS BIGINT), "
        f"{(1 << lat_bits) - 1})"
    )
    return x, y


def interleave_sql(x: str, y: str, chars: int, dialect: str = "duckdb") -> str:
    """Geohash bit interleave (lon first) of integer grid coordinates.
    Keep x/y SMALL expressions (ideally plain column names) — each is
    inlined once per bit."""
    lon_bits, lat_bits = _bits_for(chars)
    shl, shr = _shl_fn(dialect), _shr_fn(dialect)
    terms = []
    for i in range(5 * chars):
        pos = 5 * chars - 1 - i
        if i % 2 == 0:
            src = shr(x, lon_bits - 1 - i // 2)
        else:
            src = shr(y, lat_bits - 1 - i // 2)
        terms.append(shl(f"(({src}) & 1)", pos))
    return "(" + " + ".join(terms) + ")"


def _shl_fn(dialect: str):
    if dialect == "spark":
        return lambda x, n: f"shiftleft({x}, {n})"
    return lambda x, n: f"(({x}) << ({n}))"


def _shr_fn(dialect: str):
    if dialect == "spark":
        return lambda x, n: f"shiftright({x}, {n})"
    return lambda x, n: f"(({x}) >> ({n}))"


def anchor_xy_sql(
    cx: str, cy: str, chars: int, dialect: str = "duckdb"
) -> tuple[str, str]:
    """The integer ANCHOR of a grid cell — floor of its center in
    u-space (u = lon + 1.8e9, v = lat + 9e8) — as SQL text.  Cell
    centers are rationals with denominator 2^bits; the anchor
    au = ((2*cx + 1) * 3600000000) DIV 2^(lon_bits+1) is the exact
    integer both engines agree on (non-negative operands throughout),
    within one fixed-point unit (~11 mm) of the true center.  Overflow:
    (2*cx + 1) <= 2^(lon_bits+1), times 3.6e9 stays under 2^63 for
    chars <= 8 (the geohash_int_sql bound)."""
    if chars > 8:
        raise ValueError("anchor_xy_sql supports chars <= 8")
    lon_bits, lat_bits = _bits_for(chars)
    div = "DIV" if dialect == "spark" else "//"
    au = (
        f"((CAST(2 * ({cx}) + 1 AS BIGINT) * 3600000000) "
        f"{div} {1 << (lon_bits + 1)})"
    )
    av = (
        f"((CAST(2 * ({cy}) + 1 AS BIGINT) * 1800000000) "
        f"{div} {1 << (lat_bits + 1)})"
    )
    return au, av
