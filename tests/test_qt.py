"""Property tests: vectorized cell math vs the scalar reference oracle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import oracle_qt as O
from osmquadtree_rust_spark.functions import qt_numpy as Q

lons = st.integers(min_value=-1800000000, max_value=1800000000)
lats = st.integers(min_value=-900000000, max_value=900000000)
spans = st.sampled_from([0, 1, 7, 1000, 10**5, 10**7, 10**9])


@settings(max_examples=300, deadline=None)
@given(lons, lats, spans, spans)
def test_calculate_matches_oracle(lon, lat, w, h):
    mx = min(lon + w, 1800000000)
    my = min(lat + h, 900000000)
    got = Q.calculate(np.array([lon]), np.array([lat]), np.array([mx]), np.array([my]))[0]
    assert got == O.calculate(lon, lat, mx, my)


@settings(max_examples=300, deadline=None)
@given(lons, lats)
def test_point_matches_oracle(lon, lat):
    lon = min(lon, 1799999998)
    lat = min(lat, 899999998)
    got = Q.calculate_point(np.array([lon]), np.array([lat]))[0]
    assert got == O.calculate_point(lon, lat)


def _random_cells(n=2000, seed=3):
    rng = np.random.RandomState(seed)
    lon = rng.randint(-1800000000, 1799999998, n)
    lat = rng.randint(-900000000, 899999998, n)
    return Q.calculate_point(lon, lat)


def test_round_common_parent_bbox_xyz():
    cells = _random_cells()
    for lvl in (0, 5, 12, 17, 18):
        r = Q.qt_round(cells, lvl)
        exp = np.array([O.qt_round(int(c), lvl) for c in cells])
        assert (r == exp).all()
    b = np.roll(cells, 7)
    c = Q.common(cells, b)
    assert (c == np.array([O.common(int(x), int(y)) for x, y in zip(cells, b)])).all()
    p = Q.is_parent(cells, Q.qt_round(cells, 9))
    assert p.all()
    x, y, z = Q.to_xyz(cells)
    assert (Q.from_xyz(x, y, z) == cells).all()
    bb = Q.as_bbox(cells, 0.05)
    exp = [O.as_bbox(int(c), 0.05) for c in cells]
    for k in range(4):
        assert (bb[k] == np.array([e[k] for e in exp])).all()


def test_parent_property_shrunken_boxes():
    """At buffer=0 a contained box's cell is a descendant-or-self of the
    outer box's cell.  (With buffer>0 the tolerance branches of find_quad
    can legitimately pick different quadrants for straddling boxes, so the
    property only holds unbuffered.)"""
    rng = np.random.RandomState(9)
    lon = rng.randint(-1700000000, 1600000000, 500)
    lat = rng.randint(-800000000, 700000000, 500)
    w = rng.randint(1000, 10**8, 500)
    h = rng.randint(1000, 10**8, 500)
    big = Q.calculate(lon, lat, lon + w, lat + h, buffer=0.0)
    small = Q.calculate(
        lon + w // 4, lat + h // 4, lon + w // 2, lat + h // 2, buffer=0.0
    )
    ok = (big >= 0) & (small >= 0)
    assert Q.is_parent(big[ok], small[ok]).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**61), min_size=1, max_size=8))
def test_common_reduce_matches_fold(seeds):
    cells = Q.calculate_point(
        np.array([s % 3600000000 - 1800000000 for s in seeds]) % 1799999998,
        np.array([s % 1800000000 - 900000000 for s in seeds]) % 899999998,
    )
    assert Q.common_reduce(cells) == O.common_fold([int(c) for c in cells])


def test_common_commutative_associative():
    cells = _random_cells(300)
    a, b = cells[:150], cells[150:]
    assert (Q.common(a, b) == Q.common(b, a)).all()
    c = np.roll(a, 1)
    assert (
        Q.common(Q.common(a, b), c) == Q.common(a, Q.common(b, c))
    ).all()


def test_string_roundtrip():
    for c in _random_cells(50):
        s = Q.as_string(int(c))
        assert Q.from_string(s) == int(c)
        assert len(s) == int(c) & 31


def test_geohash_known_vectors():
    import numpy as np

    from osmquadtree_rust_spark.functions import geohash as GH

    # canonical vectors from the public geohash spec
    assert GH.geohash_str_np(np.array([-56030000]), np.array([426050000]), 5) == ["ezs42"]
    assert GH.geohash_str_np(np.array([104074400]), np.array([576491100]), 8) == [
        "u4pruydq"
    ]
    # prefix property: deeper hash starts with shallower hash
    lon = np.array([104074400]); lat = np.array([576491100])
    g4 = GH.geohash_str_np(lon, lat, 4)[0]
    g8 = GH.geohash_str_np(lon, lat, 8)[0]
    assert g8.startswith(g4)
    # clamping at the antimeridian / poles stays in range
    v = GH.geohash_int_np(np.array([1800000000]), np.array([900000000]), 8)
    assert 0 <= int(v[0]) < (1 << 40)


def test_duckdb_ladder_matches_numpy_at_poles():
    """The DuckDB encode ladder must emulate IEEE NaN semantics: DuckDB
    orders NaN greater than everything, so unguarded `>` / `>=` on the
    mercator-y columns (NaN for lat > 90, reachable via the degenerate-box
    +1e-7 widening at exactly +90) would spuriously take the out-of-range
    branch and stop the descent at depth 0 where numpy/Rust descend."""
    import duckdb

    from osmquadtree_rust_spark.functions import qt_sql as S

    lons = [-1800000000, -100000000, -1, 0, 1, 100000000, 1799999998]
    lats = [-900000000, -899999999, -1, 0, 1, 899999999, 900000000]
    pts = [(lon, lat) for lon in lons for lat in lats]
    # extra regression case from ADVICE.md: depth-18 cell at the pole
    pts.append((-100000000, 900000000))

    lon_np = np.array([p[0] for p in pts], dtype=np.int64)
    lat_np = np.array([p[1] for p in pts], dtype=np.int64)
    expect = Q.calculate_point(lon_np, lat_np)

    con = duckdb.connect()
    base = " UNION ALL ".join(
        f"SELECT {i} AS i, CAST({p[0]} AS BIGINT) AS lon, CAST({p[1]} AS BIGINT) AS lat"
        for i, p in enumerate(pts)
    )
    sql = S.qt_calculate_point_subquery(base, "lon", "lat", "qt", ("i",))
    got = dict(con.execute(f"SELECT i, qt FROM ({sql}) q").fetchall())
    for i, p in enumerate(pts):
        assert got[i] == int(expect[i]), (p, got[i], int(expect[i]))
    # the pole point must actually descend (regression: oracle gave qt=0)
    pole = Q.calculate_point(np.array([-100000000]), np.array([900000000]))[0]
    assert int(pole) & 31 == 18


def test_common_scalar_matches_vectorized():
    rng = np.random.RandomState(17)
    cells = _random_cells(500)
    a = cells[rng.randint(0, 500, 2000)]
    b = cells[rng.randint(0, 500, 2000)]
    vec = Q.common(a, b)
    for x, y, v in zip(a.tolist(), b.tolist(), vec.tolist()):
        assert Q.common_scalar(x, y) == v
    # negative (null) identity + equal fast paths
    assert Q.common_scalar(-1, int(cells[0])) == int(cells[0])
    assert Q.common_scalar(int(cells[0]), -2) == int(cells[0])
    assert Q.common_scalar(int(cells[0]), int(cells[0])) == int(cells[0])
