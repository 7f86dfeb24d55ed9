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
