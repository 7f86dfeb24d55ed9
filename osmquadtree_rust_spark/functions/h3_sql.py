"""DuckDB SQL generator mirroring functions/h3.py latlng_to_cell
bit-for-bit (same cross-engine determinism contract as s2_sql.py).

The numpy encode was deliberately shaped so its float path is sin/cos
(libm, bit-identical to DuckDB) plus exact IEEE mul/add/div/floor in a
pinned left-to-right order: the class-III rotation is a constant 2x2
matrix, face dots are explicit component sums (no BLAS/FMA), and the
aperture-7 ladder is integer math with one float divide-by-7 per step.
All icosahedron constants (face centers/axes, RES0_UNIT, rotation
cos/sin) are inlined via repr() so both engines hold identical doubles.
"""

from __future__ import annotations

from . import h3 as H

_DEG2RAD7 = repr(float(3.141592653589793 / 180.0 * 1e-7))


def _chk():
    import math

    assert _DEG2RAD7 == repr(math.pi / 180.0 * 1e-7)


_chk()

# digit -> unit ijk (h3.py _UNIT_I/J/K)
_UNITS = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0)]


def _digit_expr(i: str, j: str, k: str) -> str:
    whens = " ".join(
        f"WHEN ({i}) = {ui} AND ({j}) = {uj} AND ({k}) = {uk} THEN {d}"
        for d, (ui, uj, uk) in enumerate(_UNITS)
    )
    return f"(CASE {whens} ELSE 7 END)"


def _rha(x: str) -> str:
    """_round_half_away: floor(x+0.5) for x>=0 else ceil(x-0.5)."""
    return (
        f"CAST(CASE WHEN ({x}) >= 0.0 THEN FLOOR(({x}) + 0.5) "
        f"ELSE CEIL(({x}) - 0.5) END AS BIGINT)"
    )


def _norm3(i: str, j: str, k: str) -> tuple[str, str, str]:
    m = f"LEAST(LEAST({i}, {j}), {k})"
    return (f"(({i}) - {m})", f"(({j}) - {m})", f"(({k}) - {m})")


def _face_case(vals) -> str:
    whens = " ".join(f"WHEN {f} THEN {repr(float(v))}" for f, v in enumerate(vals))
    return f"(CASE face {whens} END)"


def h3_cell_subquery(
    inner_sql: str,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "h3",
    keep: tuple[str, ...] = (),
) -> str:
    """SELECT returning `keep` + out_col = signed H3-layout cell id at
    `res` for fixed-point 1e-7-degree rows of inner_sql (mirrors
    h3.latlng_to_cell; ids use bits <= 59 so signed == unsigned)."""
    assert 0 <= res <= H.MAX_RES
    kl = "".join(f"{c}, " for c in keep)

    # Every stage is a MATERIALIZED CTE: without the materialization
    # barrier DuckDB flattens the whole linear chain into one projection,
    # re-expanding each column reference — expression size then grows
    # exponentially in ladder depth (measured: 155 s to PLAN 3 rows at
    # res 9; with barriers the full 10k-row gate runs in milliseconds).
    stages: list[str] = []

    def emit(body: str) -> str:
        name = f"__h3s{len(stages)}"
        stages.append(f"{name} AS MATERIALIZED ({body})")
        return name

    # xyz (note h3._to_xyz multiplies by pi/180*1e-7 as ONE constant)
    s_in = emit(
        f"SELECT {kl}CAST({lat_col} AS DOUBLE) * {_DEG2RAD7} AS latr, "
        f"CAST({lon_col} AS DOUBLE) * {_DEG2RAD7} AS lngr "
        f"FROM ({inner_sql}) __h3_in"
    )
    l1 = emit(
        f"SELECT {kl}cos(latr) * cos(lngr) AS px, cos(latr) * sin(lngr) AS py, "
        f"sin(latr) AS pz FROM {s_in}"
    )

    # face dots + argmax fold (first strict max, matching np.argmax)
    dot_cols = ", ".join(
        f"(px * {repr(float(c[0]))} + py * {repr(float(c[1]))}) "
        f"+ pz * {repr(float(c[2]))} AS d{f}"
        for f, c in enumerate(H.FACE_CENTERS)
    )
    # argmax as GREATEST + first-match CASE (identical to np.argmax's
    # first-strict-max); NEVER a lateral-alias fold chain — DuckDB expands
    # lateral aliases by substitution, so a 20-step fold grows ~2^19 nodes
    s_dots = emit(f"SELECT {kl}px, py, pz, {dot_cols} FROM {l1}")
    best = "GREATEST(" + ", ".join(f"d{f}" for f in range(20)) + ")"
    s_best = emit(f"SELECT {kl}px, py, pz, {best} AS best, "
                  f"{', '.join(f'd{f}' for f in range(20))} FROM {s_dots}")
    face_case = " ".join(f"WHEN d{f} = best THEN {f}" for f in range(20))
    l2 = emit(f"SELECT {kl}px, py, pz, (CASE {face_case} END) AS face FROM {s_best}")

    # gnomonic projection: scale = p.n ; q = p/scale - n ; x = q.iax,
    # y = q.jax — all per-face constants inlined, pinned order
    nx = _face_case(H.FACE_CENTERS[:, 0])
    ny = _face_case(H.FACE_CENTERS[:, 1])
    nz = _face_case(H.FACE_CENTERS[:, 2])
    s_scale = emit(
        f"SELECT {kl}face, px, py, pz, "
        f"(px * {nx} + py * {ny}) + pz * {nz} AS scale FROM {l2}"
    )
    l3 = emit(
        f"SELECT {kl}face, px / scale - {nx} AS qx, py / scale - {ny} AS qy, "
        f"pz / scale - {nz} AS qz FROM {s_scale}"
    )
    iax = [_face_case(H.FACE_IAX[:, c]) for c in range(3)]
    jax = [_face_case(H.FACE_JAX[:, c]) for c in range(3)]
    k_res = repr(float((H.SQRT7**res) / H.RES0_UNIT))
    if H._is_class_iii(res):
        cr, sr = repr(float(H.COS_AP7)), repr(float(H.SIN_AP7))
        hx = f"(x * {cr} + y * {sr}) * {k_res}"
        hy = f"(y * {cr} - x * {sr}) * {k_res}"
    else:
        hx = f"x * {k_res}"
        hy = f"y * {k_res}"
    s_xy = emit(
        f"SELECT {kl}face, "
        f"(qx * {iax[0]} + qy * {iax[1]}) + qz * {iax[2]} AS x, "
        f"(qx * {jax[0]} + qy * {jax[1]}) + qz * {jax[2]} AS y FROM {l3}"
    )
    l4 = emit(f"SELECT {kl}face, {hx} AS hx, {hy} AS hy FROM {s_xy}")

    # _hex2d_to_ijk: quantize into the hex grid then fold negative axes.
    # lateral column aliases keep this one subquery per stage.
    third = repr(1.0 / 3.0)
    two_thirds = repr(2.0 / 3.0)
    sin60 = repr(float(H.SIN60))
    s_x12 = emit(
        f"SELECT {kl}face, hx, hy, abs(hx) + (abs(hy) / {sin60}) / 2.0 AS x1, "
        f"abs(hy) / {sin60} AS x2 FROM {l4}"
    )
    l5 = emit(
        f"SELECT {kl}face, hx, hy, "
        f"CAST(FLOOR(x1) AS BIGINT) AS m1, CAST(FLOOR(x2) AS BIGINT) AS m2, "
        f"x1 - CAST(FLOOR(x1) AS BIGINT) AS r1, "
        f"x2 - CAST(FLOOR(x2) AS BIGINT) AS r2 FROM {s_x12}"
    )
    i_raw = (
        f"(CASE WHEN r1 < 0.5 THEN "
        f"(CASE WHEN r1 < {third} THEN m1 "
        f" ELSE (CASE WHEN (1.0 - r1) <= r2 AND r2 < (2.0 * r1) THEN m1 + 1 ELSE m1 END) END) "
        f"ELSE (CASE WHEN r1 < {two_thirds} THEN "
        f"(CASE WHEN (2.0 * r1 - 1.0) < r2 AND r2 < (1.0 - r1) THEN m1 ELSE m1 + 1 END) "
        f" ELSE m1 + 1 END) END)"
    )
    j_raw = (
        f"(CASE WHEN r1 < 0.5 THEN "
        f"(CASE WHEN r1 < {third} THEN "
        f"(CASE WHEN r2 < (1.0 + r1) / 2.0 THEN m2 ELSE m2 + 1 END) "
        f" ELSE (CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END) END) "
        f"ELSE (CASE WHEN r1 < {two_thirds} THEN "
        f"(CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END) "
        f" ELSE (CASE WHEN r2 < (r1 / 2.0) THEN m2 ELSE m2 + 1 END) END) END)"
    )
    # negative-axis folds (i2: x<0 fold using j's parity; fi/fj: y<0 fold)
    s_raw = emit(
        f"SELECT {kl}face, hx, hy, {i_raw} AS i1, {j_raw} AS j1 FROM {l5}"
    )
    s_i2 = emit(
        f"SELECT {kl}face, hy, j1, "
        f"CASE WHEN hx < 0.0 THEN "
        f"(CASE WHEN (j1 % 2) = 0 THEN i1 - 2 * (i1 - (j1 // 2)) "
        f" ELSE i1 - (2 * (i1 - ((j1 + 1) // 2)) + 1) END) "
        f"ELSE i1 END AS i2 FROM {s_raw}"
    )
    l6 = emit(
        f"SELECT {kl}face, "
        f"CASE WHEN hy < 0.0 THEN i2 - (2 * j1 + 1) // 2 ELSE i2 END AS fi, "
        f"CASE WHEN hy < 0.0 THEN -j1 ELSE j1 END AS fj FROM {s_i2}"
    )
    ni, nj, nk = _norm3("fi", "fj", "0")
    cur = emit(
        f"SELECT {kl}face, {ni} AS ci, {nj} AS cj, {nk} AS ck FROM {l6}"
    )

    # aperture-7 up-ladder res..1, emitting digit d{rr} per level
    digit_cols: list[str] = []
    for rr in range(res, 0, -1):
        if H._is_class_iii(rr):
            up_i = _rha("(CAST(3 * (ci - ck) - (cj - ck) AS DOUBLE)) / 7.0")
            up_j = _rha("(CAST((ci - ck) + 2 * (cj - ck) AS DOUBLE)) / 7.0")
        else:
            up_i = _rha("(CAST(2 * (ci - ck) + (cj - ck) AS DOUBLE)) / 7.0")
            up_j = _rha("(CAST(3 * (cj - ck) - (ci - ck) AS DOUBLE)) / 7.0")
        pi, pj, pk = _norm3("ui", "uj", "0")
        if H._is_class_iii(rr):
            dn = ("3 * pi + pj", "3 * pj + pk", "pi + 3 * pk")
        else:
            dn = ("3 * pi + pk", "pi + 3 * pj", "pj + 3 * pk")
        bi, bj, bk = _norm3(*dn)
        di, dj, dk = _norm3(f"ci - {bi}", f"cj - {bj}", f"ck - {bk}")
        digit = _digit_expr(di, dj, dk)
        carried = "".join(f"d{r}, " for r in range(res, rr, -1))
        s_up = emit(
            f"SELECT {kl}face, {carried}ci, cj, ck, "
            f"{up_i} AS ui, {up_j} AS uj FROM {cur}"
        )
        s_par = emit(
            f"SELECT {kl}face, {carried}ci, cj, ck, "
            f"{pi} AS pi, {pj} AS pj, {pk} AS pk FROM {s_up}"
        )
        cur = emit(
            f"SELECT {kl}face, {carried}{digit} AS d{rr}, "
            f"pi AS ci, pj AS cj, pk AS ck FROM {s_par}"
        )
        digit_cols.append(f"d{rr}")

    # assemble the 64-bit index (mode 1, res, digit0 in bits 56-58, base
    # cell = face in bits 45-51, 3 bits per digit, unused digits = 7)
    d0 = _digit_expr("ci", "cj", "ck")
    parts = [
        f"CAST({1 << 59} AS BIGINT)",
        f"CAST({res} AS BIGINT) * {1 << 52}",
        f"CAST({d0} AS BIGINT) * {1 << 56}",
        f"CAST(face AS BIGINT) * {1 << 45}",
    ]
    for rr in range(1, res + 1):
        parts.append(f"CAST(d{rr} AS BIGINT) * CAST({1 << (3 * (H.MAX_RES - rr))} AS BIGINT)")
    for rr in range(res + 1, H.MAX_RES + 1):
        parts.append(f"CAST({7 << (3 * (H.MAX_RES - rr))} AS BIGINT)")
    hid = " + ".join(parts)
    return (
        f"WITH {', '.join(stages)} "
        f"SELECT {kl}CAST({hid} AS BIGINT) AS {out_col} FROM {cur}"
    )


def h3_parent_sql(id_expr: str, parent_res: int, from_res: int) -> str:
    """cell_to_parent as pure bit math on a signed id expression."""
    clear = ~(15 << 52)
    setbits = parent_res << 52
    for rr in range(parent_res + 1, from_res + 1):
        setbits |= 7 << (3 * (H.MAX_RES - rr))
    return f"(((({id_expr}) & CAST({clear} AS BIGINT))) | CAST({setbits} AS BIGINT))"
