"""S2 cell id implementation invariants."""

import numpy as np

from osmquadtree_rust_spark.functions import s2


def test_hilbert_roundtrip():
    rng = np.random.RandomState(4)
    face = rng.randint(0, 6, 20000)
    i = rng.randint(0, 1 << 30, 20000)
    j = rng.randint(0, 1 << 30, 20000)
    cid = s2.cell_id_from_face_ij(face, i, j)
    f2, i2, j2 = s2.cell_id_to_face_ij(cid)
    assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()
    assert ((cid & np.uint64(1)) == 1).all()  # leaf bit


def test_known_vector_and_faces():
    assert int(s2.s2_cell_id(np.array([0.0]), np.array([0.0]))[0]) == 0x1000000000000001
    for (la, ln, exp) in [(0, 0, 0), (0, 90, 1), (90, 0, 2), (0, 180, 3), (0, -90, 4), (-90, 0, 5)]:
        f = int(s2.s2_cell_id(np.array([float(la)]), np.array([float(ln)]))[0] >> np.uint64(61))
        assert f == exp


def test_interop_vectors_hand_derived():
    """Known-answer vectors derivable by hand from the PUBLISHED S2 layout
    (no S2 runtime ships in this sandbox — see PLANS.md §19):

    - face cell ids are (face << 61) | 2^60 (published bit packing);
    - the center of each face (u = v = 0 -> s = t = 0.5 -> i = j = 2^29)
      walks the published kPosToIJ/kPosToOrientation tables to Hilbert
      position 2^59, so its leaf id is (face << 61) | 2^60 | 1 — the walk
      is reproduced digit-by-digit in the PLANS entry;
    - lng=180 lands one leaf below center (sin(pi) = 1.22e-16, not 0, so
      u < 0 tips s just under 0.5) — the identical cos/sin + IEEE double
      path any libm-based S2 build takes.
    """
    centers = s2.s2_cell_id(
        np.array([0.0, 0.0, 90.0, 0.0, -90.0]),
        np.array([0.0, 90.0, 0.0, -90.0, 0.0]),
    )
    for f, cid in zip([0, 1, 2, 4, 5], centers):
        assert int(cid) == (f << 61) | (1 << 60) | 1, (f, hex(int(cid)))
    anti = int(s2.s2_cell_id(np.array([0.0]), np.array([180.0]))[0])
    assert anti == (3 << 61) | ((1 << 60) - 1), hex(anti)
    # face cells via parent-0 truncation
    assert [int(x) for x in s2.parent(centers, 0)] == [
        (f << 61) | (1 << 60) for f in [0, 1, 2, 4, 5]
    ]


def test_tokens():
    faces = np.array([(f << 61) | (1 << 60) for f in range(6)], dtype=np.uint64)
    assert s2.to_token(faces) == ["1", "3", "5", "7", "9", "b"]
    assert (s2.from_token(["1", "3", "5", "7", "9", "b"]) == faces).all()
    leaf = s2.s2_cell_id(np.array([0.0]), np.array([0.0]))
    assert s2.to_token(leaf) == ["1000000000000001"]
    assert s2.to_token(np.array([0], dtype=np.uint64)) == ["X"]
    assert int(s2.from_token(["X"])[0]) == 0
    # round-trip over random ids at mixed levels
    rng = np.random.RandomState(11)
    ids = s2.parent(
        s2.s2_cell_id(rng.uniform(-80, 80, 500), rng.uniform(-179, 179, 500)), 12
    )
    assert (s2.from_token(s2.to_token(ids)) == ids).all()
    import pytest

    with pytest.raises(ValueError):
        s2.from_token(["12345678901234567"])


def test_hierarchy_and_ranges():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89, 89, 5000)
    lng = rng.uniform(-180, 180, 5000)
    leaf = s2.s2_cell_id(lat, lng)
    for lvl in (0, 3, 10, 22, 29):
        p = s2.parent(leaf, lvl)
        assert s2.contains(p, leaf).all()
        assert s2.contains(p, s2.parent(leaf, lvl + 1)).all()
    # nearby points share deep ancestors
    a = s2.s2_cell_id(np.array([10.0]), np.array([20.0]))
    b = s2.s2_cell_id(np.array([10.0000001]), np.array([20.0000001]))
    assert s2.contains(s2.parent(a, 25), b).all()
    # signed storage roundtrip (Spark LongType)
    assert (s2.from_signed(s2.to_signed(leaf)) == leaf).all()


def test_fixed_point_entry():
    v = s2.s2_cell_id_fixed(np.array([200000000]), np.array([576491100]))
    w = s2.s2_cell_id(np.array([57.64911]), np.array([20.0]))
    assert (v == w).all()


def test_s2_sql_oracle_bit_exact():
    """The DuckDB SQL emitted by s2_sql must reproduce the numpy encode
    bit-for-bit (libm sin/cos + exact IEEE arithmetic + integer Hilbert
    walk) — this is the cross-engine determinism the s2_cells gate rests
    on."""
    import duckdb
    import pandas as pd

    from osmquadtree_rust_spark.functions import s2_sql

    rng = np.random.RandomState(123)
    lon = rng.randint(-1800000000, 1800000000, 20000).astype(np.int64)
    lat = rng.randint(-900000000, 900000000, 20000).astype(np.int64)
    edge = np.array(
        [[0, 0], [1800000000, 0], [-1800000000, 0], [0, 900000000],
         [0, -900000000], [450000000, 450000000], [1, 1], [-1, -1]]
    )
    lon = np.concatenate([lon, edge[:, 0]])
    lat = np.concatenate([lat, edge[:, 1]])
    exp_leaf = s2.to_signed(s2.s2_cell_id_fixed(lon, lat))
    exp_p10 = s2.to_signed(s2.parent(s2.from_signed(exp_leaf), 10))
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": np.arange(len(lon)), "lon": lon, "lat": lat}))
    q = s2_sql.s2_leaf_subquery("SELECT id, lon, lat FROM pts", keep=("id",))
    r = con.execute(
        f"SELECT id, s2, {s2_sql.s2_parent_sql('s2', 10)} AS p10 "
        f"FROM ({q}) t ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(r["s2"], exp_leaf)
    assert np.array_equal(r["p10"], exp_p10)
