"""Great-circle (haversine) primitives, cross-engine exact.

Float discipline (README "Determinism contract" + the measured libm
boundary): the haversine term uses ONLY sin/cos — numpy's float64
sin/cos equal scalar libm bit-for-bit on this platform, and so do
DuckDB's — plus plain IEEE mul/add/sub/div with PINNED association; no
asin/atan2/hypot anywhere cross-engine (numpy's SIMD kernels for those
are NOT libm).  Distances are therefore compared in HAV space: hav is
strictly monotone in great-circle distance (d = 2R*asin(sqrt(hav))),
so the radius predicate d <= D becomes hav <= sin^2(D/2R) with the
threshold computed ONCE in scalar libm (math.sin == libm) and embedded
as the SAME repr literal in both engines.

Coordinates are the repo's 1e-7-degree fixed-point int64 (exact in
float64: |lat| <= 9e8 << 2^53).  Conversion order is pinned:
rad = (CAST(f AS DOUBLE) * pi) / 1.8e9 — one mul, one div.
"""

from __future__ import annotations

import math

import numpy as np

PI_LIT = repr(math.pi)  # 3.141592653589793 — the same double as np.pi
EARTH_R_M = 6371008.8  # IUGG mean Earth radius (meters)
_FIX = "1800000000.0"  # fixed-point units per pi radians


def hav_threshold(d_meters: float) -> float:
    """sin^2(d / 2R) — the hav-space equivalent of `distance <= d`.
    Scalar libm; embed repr() of this in generated SQL."""
    if not 0 < d_meters < math.pi * EARTH_R_M:
        raise ValueError(f"d_meters={d_meters} outside (0, pi*R)")
    s = math.sin(d_meters / (2.0 * EARTH_R_M))
    return s * s


def hav_np(
    lon_a: np.ndarray, lat_a: np.ndarray, lon_b: np.ndarray, lat_b: np.ndarray
) -> np.ndarray:
    """Haversine term for fixed-point int64 coordinate arrays, operation
    order EXACTLY mirroring hav_sql (sin/cos + IEEE arithmetic only)."""
    pi = math.pi
    ra = (lat_a.astype(np.float64) * pi) / 1800000000.0
    rb = (lat_b.astype(np.float64) * pi) / 1800000000.0
    dl = np.abs(lon_a - lon_b)
    wl = np.minimum(dl, 3600000000 - dl)
    sp = np.sin((ra - rb) * 0.5)
    sl = np.sin(((wl.astype(np.float64) * pi) / 1800000000.0) * 0.5)
    return sp * sp + (np.cos(ra) * np.cos(rb)) * (sl * sl)


def hav_sql(lon_a: str, lat_a: str, lon_b: str, lat_b: str) -> str:
    """The identical haversine term as SQL text (runs on DuckDB; every
    function/operator used behaves identically in Spark SQL, but engine
    policy keeps Spark's float path in numpy — see hav_np)."""
    ra = f"((CAST({lat_a} AS DOUBLE) * {PI_LIT}) / {_FIX})"
    rb = f"((CAST({lat_b} AS DOUBLE) * {PI_LIT}) / {_FIX})"
    dl = f"ABS({lon_a} - {lon_b})"
    wl = f"LEAST({dl}, 3600000000 - {dl})"
    sp = f"sin(({ra} - {rb}) * 0.5)"
    sl = f"sin(((CAST({wl} AS DOUBLE) * {PI_LIT}) / {_FIX}) * 0.5)"
    return f"({sp} * {sp} + (cos({ra}) * cos({rb})) * ({sl} * {sl}))"


def planar_bound_fixed(d_meters: float, max_abs_lat_fixed: int) -> int:
    """Fixed-point PLANAR (wrapped-lon, lat) distance bound implied by a
    great-circle radius, for candidate generation: any two data points
    (|lat| <= max_abs_lat) within d meters great-circle satisfy
    sqrt(wrapped_dlon^2 + dlat^2) <= this bound in 1e-7-degree units.

      dlat:  arc length >= R * |dphi|            -> |dphi| <= d/R
      dlon:  hav >= cos(phi_a)cos(phi_b) sin^2(dlam/2) and
             cos(phi_a)cos(phi_b) >= cos^2(phi_max)
             -> sin(dlam/2) <= sin(d/2R)/cos(phi_max)

    Driver-side only (candidate recall, not cross-engine compare), so
    asin/hypot are fine here; the result is inflated by 1e-9 relative +
    1 unit absolute slack before ceil.  Raises near the poles, where a
    lon/lat grid cannot bound a metric radius (the standard limitation
    of grid-cover radius joins)."""
    if not 0 <= max_abs_lat_fixed <= 900000000:
        raise ValueError(f"max_abs_lat_fixed={max_abs_lat_fixed} not a lat")
    dlat_fix = (d_meters / EARTH_R_M) * 180.0 / math.pi * 1e7
    cosmax = math.cos((max_abs_lat_fixed / 1e7) * math.pi / 180.0)
    s = math.sin(d_meters / (2.0 * EARTH_R_M))
    if cosmax <= 0 or s / cosmax >= 1.0:
        raise ValueError(
            f"radius {d_meters} m unbounded in longitude at "
            f"|lat| <= {max_abs_lat_fixed / 1e7} deg — too close to a pole "
            f"for a grid-cover radius join"
        )
    dlon_fix = 2.0 * math.asin(s / cosmax) * 180.0 / math.pi * 1e7
    return int(math.ceil(math.hypot(dlat_fix, dlon_fix) * (1.0 + 1e-9))) + 1
