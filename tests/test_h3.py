"""Invariant tests for the H3-style aperture-7 hex index (functions/h3.py),
mirroring the S2 test strategy: bit-layout exactness, center round-trip,
parent truncation, hierarchical containment rate, IJK machinery algebra."""

import numpy as np

from osmquadtree_rust_spark.functions import h3 as H


def _random_pts(n=5000, seed=7):
    rng = np.random.RandomState(seed)
    lon = rng.randint(-1800000000, 1799999999, n).astype(np.int64)
    lat = rng.randint(-900000000, 900000000, n).astype(np.int64)
    return lon, lat


def test_bit_layout():
    lon, lat = _random_pts(1000)
    for res in (0, 7, 9, 12, 15):
        h = H.latlng_to_cell(lon, lat, res)
        assert np.all((h >> np.uint64(59)) & np.uint64(15) == 1)  # mode = cell
        assert np.all(h >> np.uint64(63) == 0)  # reserved top bit
        assert np.all(H.get_resolution(h) == res)
        faces = H.get_base_cell(h)
        assert np.all((faces >= 0) & (faces < 20))
        assert np.all(H.get_digit0(h) != H.INVALID_DIGIT)
        for rr in range(1, 16):
            d = H.get_digit(h, rr)
            if rr <= res:
                assert np.all(d < 7), (res, rr)
            else:
                assert np.all(d == 7)


def test_all_faces_reachable():
    lon, lat = _random_pts(20000)
    h = H.latlng_to_cell(lon, lat, 7)
    assert len(np.unique(H.get_base_cell(h))) == 20


def test_center_roundtrip():
    """Encoding a cell's own center must return that exact cell, except
    for cells overhanging an icosahedron face seam (per-face clipped
    grids: a coarse cell's center can re-project onto the neighbouring
    face).  Every mismatch must be such a face change, and rare."""
    lon, lat = _random_pts(3000)
    for res in (0, 5, 7, 9, 12):
        h = H.latlng_to_cell(lon, lat, res)
        clon, clat = H.cell_to_center(h)
        h2 = H.latlng_to_cell(clon, clat, res)
        bad = h != h2
        if bad.any():
            # only face-seam cells may differ, and only a small fraction
            assert np.all(H.get_base_cell(h[bad]) != H.get_base_cell(h2[bad]))
            assert np.mean(bad) < 0.01, f"res={res}: {np.sum(bad)} mismatches"


def test_parent_truncation_consistency():
    """parent() is pure bit truncation: transitive and res-exact."""
    lon, lat = _random_pts(3000)
    h12 = H.latlng_to_cell(lon, lat, 12)
    h7 = H.cell_to_parent(h12, 7)
    assert np.all(H.get_resolution(h7) == 7)
    # transitivity: 12 -> 9 -> 7 == 12 -> 7
    assert np.array_equal(H.cell_to_parent(H.cell_to_parent(h12, 9), 7), h7)
    # digits above parent res preserved, below cleared to 7
    for rr in range(1, 8):
        assert np.array_equal(H.get_digit(h7, rr), H.get_digit(h12, rr))
    for rr in range(8, 16):
        assert np.all(H.get_digit(h7, rr) == 7)


def test_hierarchical_containment_rate():
    """Aperture-7 hexagons do not nest exactly (true in official H3 too),
    but the direct coarse encode must match the truncated parent for the
    vast majority of points."""
    lon, lat = _random_pts(20000)
    h12 = H.latlng_to_cell(lon, lat, 12)
    for res in (7, 9, 11):
        direct = H.latlng_to_cell(lon, lat, res)
        trunc = H.cell_to_parent(h12, res)
        rate = np.mean(direct == trunc)
        assert rate > 0.75, (res, rate)


def test_same_cell_locality():
    """Nearby points share coarse cells; a res-9 cell is ~100s of metres,
    so points 1e-5 deg apart (~1 m) nearly always share res 7."""
    rng = np.random.RandomState(11)
    lon = rng.randint(-1700000000, 1700000000, 2000).astype(np.int64)
    lat = rng.randint(-800000000, 800000000, 2000).astype(np.int64)
    h = H.latlng_to_cell(lon, lat, 7)
    h2 = H.latlng_to_cell(lon + 100, lat + 100, 7)
    assert np.mean(h == h2) > 0.95


def test_resolution_monotone_cell_counts():
    """Finer resolutions must produce strictly more distinct cells over a
    spread sample."""
    lon, lat = _random_pts(20000)
    counts = [
        len(np.unique(H.latlng_to_cell(lon, lat, res))) for res in (5, 7, 9, 11)
    ]
    assert counts == sorted(counts) and counts[0] < counts[-1]


def test_ijk_machinery_algebra():
    """down(up(x)) lands on the aperture-7 cluster center nearest x; the
    unit-digit decomposition reconstructs x exactly: x = down(up) + digit."""
    rng = np.random.RandomState(3)
    i = rng.randint(0, 200, 500)
    j = rng.randint(0, 200, 500)
    k = np.zeros_like(i)
    i, j, k = H._normalize(i, j, k)
    for up, down in ((H._up_ap7, H._down_ap7), (H._up_ap7r, H._down_ap7r)):
        ui, uj, uk = up(i, j, k)
        ci, cj, ck = down(ui, uj, uk)
        di, dj, dk = H._normalize(i - ci, j - cj, k - ck)
        d = H._unit_to_digit(di, dj, dk)
        assert np.all(d != H.INVALID_DIGIT)
        # reconstruct: center + unit == original
        ri, rj, rk = H._normalize(ci + H._UNIT_I[d], cj + H._UNIT_J[d], ck + H._UNIT_K[d])
        assert np.array_equal(ri, i) and np.array_equal(rj, j) and np.array_equal(rk, k)


def test_hex2d_to_ijk_centers():
    """Hex centers map to their own ijk: ijk -> hex2d -> ijk round-trip."""
    rng = np.random.RandomState(5)
    i = rng.randint(0, 50, 300)
    j = rng.randint(0, 50, 300)
    k = np.zeros_like(i)
    i, j, k = H._normalize(i, j, k)
    x = (i - k).astype(np.float64) - 0.5 * (j - k)
    y = (j - k) * H.SIN60
    ri, rj, rk = H._hex2d_to_ijk(x, y)
    assert np.array_equal(ri, i) and np.array_equal(rj, j) and np.array_equal(rk, k)


def test_signed_roundtrip():
    lon, lat = _random_pts(500)
    h = H.latlng_to_cell(lon, lat, 9)
    assert np.array_equal(H.from_signed(H.to_signed(h)), h)


def test_h3_sql_oracle_bit_exact():
    """functions/h3_sql must reproduce latlng_to_cell bit-for-bit at a
    class-III and a class-II resolution (the h3_cells gate contract)."""
    import duckdb
    import pandas as pd

    from osmquadtree_rust_spark.functions import h3_sql

    rng = np.random.RandomState(321)
    lon = rng.randint(-1800000000, 1800000000, 15000).astype(np.int64)
    lat = rng.randint(-900000000, 900000000, 15000).astype(np.int64)
    edge = np.array(
        [[0, 0], [1800000000, 0], [-1800000000, 0], [0, 900000000],
         [0, -900000000], [450000000, 450000000], [1, 1], [-1, -1]]
    )
    lon = np.concatenate([lon, edge[:, 0]])
    lat = np.concatenate([lat, edge[:, 1]])
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": np.arange(len(lon)), "lon": lon, "lat": lat}))
    for res in (9, 8):
        exp = H.to_signed(H.latlng_to_cell(lon, lat, res))
        q = h3_sql.h3_cell_subquery("SELECT id, lon, lat FROM pts", res, keep=("id",))
        r = con.execute(f"SELECT id, h3 FROM ({q}) t ORDER BY id").fetchnumpy()
        assert np.array_equal(r["h3"], exp), f"res {res}"
    exp_p7 = H.to_signed(
        H.cell_to_parent(H.latlng_to_cell(lon, lat, 9), 7)
    )
    q = h3_sql.h3_cell_subquery("SELECT id, lon, lat FROM pts", 9, keep=("id",))
    r = con.execute(
        f"SELECT id, {h3_sql.h3_parent_sql('h3', 7, 9)} AS p7 FROM ({q}) t ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(r["p7"], exp_p7)
