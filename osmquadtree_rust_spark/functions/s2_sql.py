"""DuckDB SQL generator mirroring functions/s2.py bit-for-bit.

Cross-engine determinism contract (same discipline as qt_sql.py):

- trig is sin/cos ONLY, which numpy evaluates through libm for float64 —
  verified bit-identical to DuckDB's libm sin/cos on this platform (numpy's
  SIMD kernels for log/tan/atan/asin/atan2 are NOT, so the numpy encode in
  s2.py deliberately avoids them);
- everything downstream is exact IEEE mul/add/div/sqrt/floor in a pinned
  left-to-right order, identical in both engines;
- the 30-step Hilbert walk is pure integer bit math emitted as one CTE
  per step (the 4-bit lookup tables in s2.py are the SAME recursion,
  chunked; per-bit unrolling reproduces identical curve positions).

Used by gate_text's `s2_cells` oracle; compared end-to-end against the
numpy path in tests/test_s2.py.
"""

from __future__ import annotations

import math

# pi/180, inlined identically in numpy (np.radians is a multiply by this
# constant) and SQL
_DEG2RAD = repr(math.pi / 180.0)

# ij -> pos per orientation (inverse of s2.py's _POS_TO_IJ rows) and
# pos -> orientation-xor, from the published Hilbert recursion
_IJ_TO_POS = [
    [0, 1, 3, 2],
    [0, 3, 1, 2],
    [2, 3, 1, 0],
    [2, 1, 3, 0],
]
_POS_TO_ORIENTATION = [1, 0, 0, 3]  # SWAP, 0, 0, INVERT|SWAP

MAX_LEVEL = 30

# (u_expr, v_expr) per face in terms of x, y, z — s2.py xyz_to_face_uv
_FACE_UV = [
    ("(y / x)", "(z / x)"),
    ("(-x / y)", "(z / y)"),
    ("(-x / z)", "(-y / z)"),
    ("(z / x)", "(y / x)"),
    ("(z / y)", "(-x / y)"),
    ("(-y / z)", "(-x / z)"),
]


def _case(expr: str, mapping: list[int]) -> str:
    """CASE expr WHEN i THEN mapping[i] ... END (0..len-1)."""
    whens = " ".join(f"WHEN {i} THEN {v}" for i, v in enumerate(mapping))
    return f"(CASE {expr} {whens} END)"


def _st_expr(u: str) -> str:
    # s2.py uv_to_st: quadratic projection, sqrt is IEEE-exact
    return (
        f"(CASE WHEN {u} >= 0.0 THEN 0.5 * SQRT(1.0 + 3.0 * {u}) "
        f"ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * {u}) END)"
    )


def _ij_expr(s: str) -> str:
    # st_to_ij: clip(floor(2^30 * s), 0, 2^30-1)
    hi = (1 << MAX_LEVEL) - 1
    return (
        f"GREATEST(LEAST(CAST(FLOOR({float(1 << MAX_LEVEL)!r} * {s}) AS BIGINT), "
        f"{hi}), 0)"
    )


def s2_leaf_subquery(
    inner_sql: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "s2",
    keep: tuple[str, ...] = (),
) -> str:
    """SELECT returning `keep` + out_col = signed leaf S2 id of the
    fixed-point 1e-7-degree (lon_col, lat_col) rows of inner_sql.

    Faces 4-5 set bit 63 of the unsigned id; the signed reinterpretation
    is computed directly as (face-8)*2^61 for face >= 4 (exactly numpy's
    uint64 -> int64 view)."""
    kl = "".join(f"{c}, " for c in keep)

    # layer 1: radians (single multiply, matching np.radians), xyz via
    # sin/cos, pinned op order cl*cos / cl*sin
    l1 = (
        f"SELECT {kl}"
        f"cos(latr) * cos(lngr) AS x, cos(latr) * sin(lngr) AS y, "
        f"sin(latr) AS z FROM ("
        f"SELECT {kl}"
        f"(CAST({lat_col} AS DOUBLE) * 1e-07) * {_DEG2RAD} AS latr, "
        f"(CAST({lon_col} AS DOUBLE) * 1e-07) * {_DEG2RAD} AS lngr "
        f"FROM ({inner_sql}) __s2_in) __s2_rad"
    )

    # layer 2: face selection (strict > comparisons, then +3 on negative
    # major component), u/v per face
    face0 = (
        "(CASE WHEN abs(x) > abs(y) THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END) "
        "ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END)"
    )
    comp = "(CASE face0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END)"
    uv_u = " ".join(
        f"WHEN {f} THEN {ue}" for f, (ue, _) in enumerate(_FACE_UV)
    )
    uv_v = " ".join(
        f"WHEN {f} THEN {ve}" for f, (_, ve) in enumerate(_FACE_UV)
    )
    l2 = (
        f"SELECT {kl}face, (CASE face {uv_u} END) AS u, (CASE face {uv_v} END) AS v "
        f"FROM (SELECT {kl}x, y, z, "
        f"(CASE WHEN {comp} < 0.0 THEN face0 + 3 ELSE face0 END) AS face "
        f"FROM (SELECT {kl}x, y, z, {face0} AS face0 FROM ({l1}) __s2_xyz) __s2_f0"
        f") __s2_face"
    )

    # layer 3: st -> leaf ij
    l3 = (
        f"SELECT {kl}face, {_ij_expr(_st_expr('u'))} AS i, "
        f"{_ij_expr(_st_expr('v'))} AS j FROM ({l2}) __s2_uv"
    )

    # layers 4..33: Hilbert walk, one CTE-less nested subquery per bit
    # (k = 29..0), state = (n accumulated curve position, orient)
    cur = (
        f"SELECT {kl}face, i, j, CAST(0 AS BIGINT) AS n, "
        f"(face & 1) AS orient FROM ({l3}) __s2_ij"
    )
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = f"(((i >> {k}) & 1) * 2 + ((j >> {k}) & 1))"
        pos_map = " ".join(
            f"WHEN {o * 4 + b} THEN {_IJ_TO_POS[o][b]}"
            for o in range(4)
            for b in range(4)
        )
        pos = f"(CASE orient * 4 + {ij} {pos_map} END)"
        orient_xor = _case("pos", _POS_TO_ORIENTATION)
        cur = (
            f"SELECT {kl}face, i, j, n + pos * CAST({1 << (2 * k)} AS BIGINT) AS n, "
            f"xor(orient, {orient_xor}) AS orient FROM ("
            f"SELECT {kl}face, i, j, n, orient, {pos} AS pos FROM ({cur}) __s2_p{k}"
            f") __s2_w{k}"
        )

    sid = (
        "(CASE WHEN face >= 4 THEN face - 8 ELSE face END) * 2305843009213693952 "
        "+ n * 2 + 1"
    )
    return f"SELECT {kl}CAST({sid} AS BIGINT) AS {out_col} FROM ({cur}) __s2_fin"


def s2_parent_sql(id_expr: str, level: int) -> str:
    """Ancestor at `level` on a SIGNED id column expression — two's-
    complement bit math identical to s2.py parent()."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return f"((({id_expr}) & {-lsb}) | {lsb})"
