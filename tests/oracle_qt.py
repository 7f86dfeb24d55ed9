"""Scalar pure-Python oracle for quadtree-cell semantics.

Independent transliteration of the reference's recursive algorithms
(jharris2268/osmquadtree-rust, src/elements/quadtree.rs) used ONLY by tests
to cross-check the vectorized engine implementation
(osmquadtree_rust_spark/functions/qt_numpy.py).  Also holds scalar oracles
for the assignment spec (src/calcqts/calcinmem.rs:151-242), tile grouping
(src/sortblocks/quadtreetree.rs:306-397) and merge rules
(src/elements/combine_block.rs:93-277).
"""

from __future__ import annotations

import math


def coordinate_as_integer(v: float) -> int:
    if v > 0.0:
        return int(v * 10000000.0 + 0.5)
    return int(v * 10000000.0 - 0.5)  # int() truncates toward zero, as `as i32`


def coordinate_as_float(v: int) -> float:
    return v * 0.0000001


def latitude_mercator(y: float, scale: float) -> float:
    # IEEE semantics of Rust's .tan().ln(): ln(0) = -inf, ln(<0) = NaN
    t = math.tan(math.pi * (1.0 + y / 90.0) / 4.0)
    if t < 0.0:
        return math.nan
    if t == 0.0:
        return -math.inf
    return math.log(t) * scale / math.pi


def latitude_un_mercator(d: float, scale: float) -> float:
    return (math.atan(math.exp(d * math.pi / scale)) * 4.0 / math.pi - 1.0) * 90.0


def find_quad(min_x, min_y, max_x, max_y, buffer):
    # quadtree.rs:558-601, branch for branch
    if (
        min_x < (-1.0 - buffer)
        or min_y < (-1.0 - buffer)
        or max_x > (1.0 + buffer)
        or max_y > (1.0 + buffer)
    ):
        return -1
    if max_x <= 0.0 and min_y >= 0.0:
        return 0
    elif min_x >= 0.0 and min_y >= 0.0:
        return 1
    elif max_x <= 0.0 and max_y <= 0.0:
        return 2
    elif min_x >= 0.0 and max_y <= 0.0:
        return 3
    elif (
        max_x < buffer
        and abs(max_x) < abs(min_x)
        and min_y > -buffer
        and abs(max_y) >= abs(min_y)
    ):
        return 0
    elif (
        min_x > -buffer
        and abs(max_x) >= abs(min_x)
        and min_y > -buffer
        and abs(max_y) >= abs(min_y)
    ):
        return 1
    elif (
        max_x < buffer
        and abs(max_x) < abs(min_x)
        and max_y < buffer
        and abs(max_y) < abs(min_y)
    ):
        return 2
    elif (
        min_x > -buffer
        and abs(max_x) >= abs(min_x)
        and max_y < buffer
        and abs(max_y) < abs(min_y)
    ):
        return 3
    return -1


def make_quad_tree_internal(min_x, min_y, max_x, max_y, buffer, max_level, current_level):
    # quadtree.rs:603-645
    if max_level == 0:
        return 0
    q = find_quad(min_x, min_y, max_x, max_y, buffer)
    if q == -1:
        return 0
    if q in (0, 2):
        min_x += 0.5
        max_x += 0.5
    else:
        min_x -= 0.5
        max_x -= 0.5
    if q in (2, 3):
        min_y += 0.5
        max_y += 0.5
    else:
        min_y -= 0.5
        max_y -= 0.5
    return (
        (q << (61 - 2 * current_level))
        + 1
        + make_quad_tree_internal(
            2.0 * min_x, 2.0 * min_y, 2.0 * max_x, 2.0 * max_y,
            buffer, max_level - 1, current_level + 1,
        )
    )


def make_quad_tree_floating(min_x, min_y, max_x, max_y, buffer, max_level):
    # quadtree.rs:647-672
    if min_x > max_x or min_y > max_y:
        return -1
    if max_x == min_x:
        max_x += 0.0000001
    if max_y == min_y:
        max_y += 0.0000001
    min_y_merc = latitude_mercator(min_y, 1.0)
    max_y_merc = latitude_mercator(max_y, 1.0)
    return make_quad_tree_internal(
        min_x / 180.0, min_y_merc, max_x / 180.0, max_y_merc, buffer, max_level, 0
    )


def calculate(minlon, minlat, maxlon, maxlat, maxlevel=18, buffer=0.05):
    return make_quad_tree_floating(
        coordinate_as_float(minlon),
        coordinate_as_float(minlat),
        coordinate_as_float(maxlon),
        coordinate_as_float(maxlat),
        buffer,
        maxlevel,
    )


def calculate_point(lon, lat, maxlevel=18, buffer=0.05):
    return make_quad_tree_floating(
        coordinate_as_float(lon),
        coordinate_as_float(lat),
        coordinate_as_float(lon + 1),
        coordinate_as_float(lat + 1),
        buffer,
        maxlevel,
    )


def depth(qt: int) -> int:
    return qt & 31


def qt_round(qt: int, level: int) -> int:
    # quadtree.rs:450-458
    if depth(qt) <= level:
        return qt
    q = qt >> (63 - 2 * level)
    q <<= 63 - 2 * level
    return q + level


def is_parent(a: int, b: int) -> bool:
    # quadtree.rs:460-469
    if a == b:
        return True
    if depth(a) > depth(b):
        return is_parent(b, a)
    return a == qt_round(b, depth(a))


def common(a: int, b: int) -> int:
    # quadtree.rs:471-496
    if a < 0:
        return b
    if b < 0:
        return a
    if a == b:
        return a
    d = min(depth(a), depth(b))
    p = 0
    for i in range(d):
        q = qt_round(a, i + 1)
        if q != qt_round(b, i + 1):
            return p
        p = q
    return p


def common_fold(qts) -> int:
    res = -2
    for q in qts:
        res = common(res, q)
    return res


def from_string(s: str) -> int:
    ans = 0
    for i, ch in enumerate(s):
        ans |= "ABCD".index(ch) << (61 - 2 * i)
    return ans | len(s)


def from_xyz(x: int, y: int, z: int) -> int:
    # quadtree.rs:392-406
    if z > 20:
        return -2
    ans = 0
    scale = 1
    for i in range(z):
        ans += (((x >> i) & 1) | (((y >> i) & 1) << 1)) * scale
        scale *= 4
    ans <<= 63 - 2 * z
    ans += z
    return ans


def to_xyz(qt: int):
    # quadtree.rs:61-87
    z = qt & 31
    x = y = 0
    for i in range(z):
        x <<= 1
        y <<= 1
        t = (qt >> (61 - 2 * i)) & 3
        if t in (1, 3):
            x |= 1
        if t in (2, 3):
            y |= 1
    return x, y, z


def as_bbox(qt: int, buffer: float = 0.0):
    # quadtree.rs:498-541
    min_x, min_y, max_x, max_y = -180.0, -90.0, 180.0, 90.0
    for i in range(depth(qt)):
        v = (qt >> (61 - 2 * i)) & 3
        if v in (0, 2):
            max_x -= (max_x - min_x) / 2.0
        else:
            min_x += (max_x - min_x) / 2.0
        if v in (2, 3):
            max_y -= (max_y - min_y) / 2.0
        else:
            min_y += (max_y - min_y) / 2.0
    min_y_m = latitude_un_mercator(min_y, 90.0)
    max_y_m = latitude_un_mercator(max_y, 90.0)
    if buffer > 0.0:
        xx = (max_x - min_x) * buffer
        yy = (max_y_m - min_y_m) * buffer
        min_x -= xx
        min_y_m -= yy
        max_x += xx
        max_y_m += yy
    return (
        coordinate_as_integer(min_x),
        coordinate_as_integer(min_y_m),
        coordinate_as_integer(max_x),
        coordinate_as_integer(max_y_m),
    )


# ---------------------------------------------------------------------------
# assignment spec oracle (calcinmem.rs:151-242)
# ---------------------------------------------------------------------------

def calc_element_quadtrees(
    nodes, ways, relations, qt_level=18, qt_buffer=0.05, missing_parent_zero=True
):
    """nodes: {id: (lon,lat)}; ways: {id: [node_id,...]} (sorted-dict order);
    relations: {id: [(mem_type, mem_ref), ...]} with mem_type in
    {0:node,1:way,2:relation}.  Returns (nodeqts, wayqts, relqts) dicts.
    Mirrors calc_collected_data_quadtrees including the Gauss-Seidel
    5-iteration rel->rel pass in ascending rel-id order.

    missing_parent_zero: the reference's two calcqts paths diverge here —
    the in-memory spec (calcinmem.rs:227-236) leaves relations whose parent
    rel never resolves absent from the output, while the out-of-core path
    used at planet scale (calculate.rs:825-841) folds cell 0 into them on
    the 5th pass.  We standardize on the planet-scale behaviour."""
    wayqts = {}
    for w in sorted(ways):
        bx = [1800000000, 900000000, -1800000000, -900000000]
        for r in ways[w]:
            ln, lt = nodes[r]
            bx[0] = min(bx[0], ln)
            bx[1] = min(bx[1], lt)
            bx[2] = max(bx[2], ln)
            bx[3] = max(bx[3], lt)
        wayqts[w] = calculate(bx[0], bx[1], bx[2], bx[3], qt_level, qt_buffer)

    nodeqts = {}
    for w in sorted(ways):
        q = wayqts[w]
        for r in ways[w]:
            nodeqts[r] = common(nodeqts[r], q) if r in nodeqts else q
    for n in sorted(nodes):
        if n not in nodeqts:
            ln, lt = nodes[n]
            nodeqts[n] = calculate_point(ln, lt, qt_level, qt_buffer)

    relrels = []
    relqts = {}

    def expand(r, q):
        relqts[r] = common(relqts[r], q) if r in relqts else q

    for r in sorted(relations):
        mems = relations[r]
        if not mems:
            relqts[r] = 0
        else:
            for ty, rf in mems:
                if ty == 0 and rf in nodeqts:
                    expand(r, nodeqts[rf])
                elif ty == 1 and rf in wayqts:
                    expand(r, wayqts[rf])
                elif ty == 2:
                    relrels.append((r, rf))
    for it in range(5):
        for a, b in relrels:
            if b in relqts:
                expand(a, relqts[b])
            elif missing_parent_zero and it == 4:
                expand(a, 0)
    return nodeqts, wayqts, relqts


# ---------------------------------------------------------------------------
# merge oracle (combine_block.rs:93-277)
# ---------------------------------------------------------------------------

NORMAL, DELETE, REMOVE, UNCHANGED, MODIFY, CREATE = 0, 1, 2, 3, 4, 5


def combine(left, right, key=lambda e: e["id"]):
    """Sorted 2-way union by id; right (newer) wins ties
    (combine_block.rs:93-134)."""
    out, i, j = [], 0, 0
    while i < len(left) or j < len(right):
        if i >= len(left):
            out.append(right[j]); j += 1
        elif j >= len(right):
            out.append(left[i]); i += 1
        elif key(left[i]) < key(right[j]):
            out.append(left[i]); i += 1
        elif key(left[i]) == key(right[j]):
            out.append(right[j]); i += 1; j += 1
        else:
            out.append(right[j]); j += 1
    return out


def apply_change(left, right, key=lambda e: e["id"]):
    """combine + drop Delete/Remove, survivors reset to Normal
    (combine_block.rs:181-277)."""
    out = []
    for e in combine(left, right, key):
        ct = e.get("changetype", NORMAL)
        if ct in (DELETE, REMOVE):
            continue
        e = dict(e)
        e["changetype"] = NORMAL
        out.append(e)
    return out
