"""Filter-spec parsing (reference Bbox::from_str/from_str_alt,
quadtree.rs:152-225): four ints, four floats, or `tile:x,y,z[:buffer]`."""

from __future__ import annotations

import math
import re

EARTH_WIDTH = 20037508.342789244


def _coordinate_as_integer(v: float) -> int:
    if v > 0.0:
        return int(v * 1e7 + 0.5)
    return int(v * 1e7 - 0.5)


def _latitude_un_mercator(d: float, scale: float) -> float:
    return (math.atan(math.exp(d * math.pi / scale)) * 4.0 / math.pi - 1.0) * 90.0


def zoom(z: float) -> float:
    """Web-mercator metres-per-pixel ladder (quadtree.rs:33):
    2 * EARTH_WIDTH / 256 / 2^z."""
    return 2.0 * EARTH_WIDTH / 256.0 / (2.0**z)


def bbox_from_tile(x: float, y: float, z: float, buffer: float = 0.0):
    """quadtree.rs:212-225 (note the reference's (2.0+buffer) span)."""
    sz = (2.0 * EARTH_WIDTH / 256.0 / (2.0**z)) * 256.0
    minx = -EARTH_WIDTH + (x - buffer) * sz
    maxy = EARTH_WIDTH - (y - buffer) * sz
    maxx = minx + (2.0 + buffer) * sz
    miny = maxy - (2.0 + buffer) * sz
    return (
        _coordinate_as_integer(minx * 180.0 / EARTH_WIDTH),
        _coordinate_as_integer(_latitude_un_mercator(miny, EARTH_WIDTH)),
        _coordinate_as_integer(maxx * 180.0 / EARTH_WIDTH),
        _coordinate_as_integer(_latitude_un_mercator(maxy, EARTH_WIDTH)),
    )


# --------------------------------------------------------------------------
# timestamp parse/format (reference src/utils.rs:241-307)
# --------------------------------------------------------------------------

import datetime as _dt

_TS_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",   # TIMEFORMAT
    "%Y-%m-%dT%H:%M:%SZ",  # TIMEFORMATZ
    "%Y-%m-%dT%H-%M-%S",   # TIMEFORMAT_ALT
    "%Y%m%d",              # DATEFORMAT (midnight)
)


def parse_timestamp(ts: str) -> int:
    """Epoch seconds, accepting the reference's four formats in order."""
    for fmt in _TS_FORMATS:
        try:
            d = _dt.datetime.strptime(ts, fmt)
            return int(d.replace(tzinfo=_dt.timezone.utc).timestamp())
        except ValueError:
            continue
    raise ValueError(f"can't read {ts!r}: use one of {_TS_FORMATS}")


def timestamp_string(ts: int) -> str:
    return _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )


def timestamp_string_alt(ts: int) -> str:
    return _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).strftime(
        "%Y-%m-%dT%H-%M-%S"
    )


def date_string(ts: int) -> str:
    return _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).strftime("%Y%m%d")


_FOUR_INTS = re.compile(r"(\-?[0-9]+),(\-?[0-9]+),(\-?[0-9]+),(\-?[0-9]+)")
_FOUR_FLOATS = re.compile(
    r"(\-?[0-9]*\.?[0-9]*),(\-?[0-9]*\.?[0-9]*),(\-?[0-9]*\.?[0-9]*),(\-?[0-9]*\.?[0-9]*)"
)
_TILE_SPEC = re.compile(
    r"tile:(\-?[0-9]*\.?[0-9]*),(\-?[0-9]*\.?[0-9]*),(\-?[0-9]*\.?[0-9]*)(:(\-?[0-9]*\.?[0-9]*))?"
)


def bbox_from_str(spec: str):
    """Accepts the reference's three syntaxes; ints are fixed-point 1e-7
    degrees, floats are degrees.  Returns (minlon, minlat, maxlon, maxlat)."""
    # reference precedence: ints, then floats, then tile spec
    # (quadtree.rs:168-201, including its substring-search semantics)
    m = _FOUR_INTS.search(spec)
    if m:
        return tuple(int(g) for g in m.groups())
    m = _FOUR_FLOATS.search(spec)
    if m:
        return tuple(_coordinate_as_integer(float(g)) for g in m.groups())
    m = _TILE_SPEC.search(spec)
    if m:
        x, y, z = float(m.group(1)), float(m.group(2)), float(m.group(3))
        buf = float(m.group(5)) if m.group(5) else 0.0
        return bbox_from_tile(x, y, z, buf)
    raise ValueError(f"can't make bbox from {spec!r}")


def epoch_seconds(df, ts_col: str, floor: bool = True):
    """Epoch-seconds Column for a ts column with STRICT dtype dispatch —
    THE shared implementation for every time-keyed operator (sessionize,
    hopping windows, bucketed range join).  A numeric epoch column
    passes through directly (unix_timestamp() would cast it to string,
    fail to parse, and silently NULL-group every row); temporal columns
    are converted per dtype; parseable STRING timestamps are accepted
    via CAST(ts AS TIMESTAMP) (under Spark's default ANSI mode an
    unparseable string raises CAST_INVALID_INPUT instead of silently
    NULLing — with ANSI off it degrades to NULL, the pre-round-4
    unix_timestamp behavior); anything else raises.

    floor=True returns BIGINT FLOOR-seconds (window/island keys);
    floor=False returns DOUBLE preserving fractional epochs (the range
    join's ceil(end/b) coverage math needs them).  Fraction
    preservation: TIMESTAMP and STRING columns go through
    CAST(.. AS DOUBLE) on the timestamp value, which keeps sub-second
    precision; TIMESTAMP_NTZ cannot be cast to DOUBLE (and unix_micros
    rejects it), so it goes through unix_timestamp and TRUNCATES to
    whole seconds even with floor=False — a documented limitation;
    DATE has no sub-second content."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(ts_col)
    if dtype is None:
        raise ValueError(f"ts column {ts_col!r} not in {df.columns}")
    if dtype == "timestamp":
        # cast(timestamp as double) = fractional epoch seconds
        base = F.col(ts_col).cast("double")
    elif dtype == "string":
        base = F.col(ts_col).cast("timestamp").cast("double")
    elif dtype in ("timestamp_ntz", "date"):
        base = F.unix_timestamp(F.col(ts_col)).cast("double")
    elif dtype in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or dtype.startswith("decimal"):
        base = F.col(ts_col).cast("double")
    else:
        raise ValueError(
            f"ts column {ts_col!r} has non-temporal, non-numeric type {dtype}"
        )
    return F.floor(base).cast("long") if floor else base


def epoch_micros(df, ts_col: str):
    """Epoch-MICROSECONDS Column with the same strict dtype dispatch as
    epoch_seconds — for operators that need sub-second time arithmetic
    (trajectory interpolation).  TIMESTAMP goes through unix_micros;
    TIMESTAMP_NTZ is cast to TIMESTAMP first, which is instant-exact
    because the engine session timezone is pinned to UTC (session.py) —
    the same naive==UTC convention DuckDB's epoch_us applies to parquet
    NTZ values, verified bit-equal cross-engine.  Integral columns pass
    through as already-micros; anything else raises."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(ts_col)
    if dtype is None:
        raise ValueError(f"ts column {ts_col!r} not in {df.columns}")
    if dtype == "timestamp":
        return F.unix_micros(F.col(ts_col))
    if dtype == "timestamp_ntz":
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return F.col(ts_col).cast("long")
    raise ValueError(
        f"ts column {ts_col!r} has type {dtype}; epoch_micros needs a "
        f"timestamp or integral-micros column"
    )
