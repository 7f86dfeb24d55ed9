"""idw_grid: seeded net vs a pure-python brute force (same integer
formulas), value/overflow guards."""

import random

import pytest

from osmquadtree_rust_spark.functions.geohash import _bits_for
from osmquadtree_rust_spark.operators.idw import idw_grid

W_SCALE = 1_000_000_000


def cell_of(lon, lat, chars):
    lb, tb = _bits_for(chars)
    u, v = lon + 1_800_000_000, lat + 900_000_000
    x = min((u << lb) // 3_600_000_000, (1 << lb) - 1)
    y = min((v << tb) // 1_800_000_000, (1 << tb) - 1)
    return x, y


def anchor_of(cx, cy, chars):
    lb, tb = _bits_for(chars)
    return (
        ((2 * cx + 1) * 3_600_000_000) // (1 << (lb + 1)),
        ((2 * cy + 1) * 1_800_000_000) // (1 << (tb + 1)),
    )


def ref_idw(pts, chars, r):
    cells = {cell_of(lon, lat, chars) for lon, lat, _ in pts}
    out = {}
    for c in cells:
        au, av = anchor_of(*c, chars)
        n = ws = wv = 0
        for lon, lat, v in pts:
            d2 = (lon + 1_800_000_000 - au) ** 2 + (lat + 900_000_000 - av) ** 2
            if d2 <= r * r:
                w = W_SCALE // (d2 + 1)
                n, ws, wv = n + 1, ws + w, wv + w * v
        if n:
            out[c] = (n, ws, wv // max(ws, 1))
    return out


def test_seeded_net_vs_bruteforce(spark):
    for seed in range(4):
        rng = random.Random(seed)
        chars = rng.choice([6, 7])
        r = rng.choice([5_000, 20_000, 60_000])
        pts = [
            (
                rng.randint(-400_000, 400_000),
                rng.randint(-300_000, 300_000),
                rng.randint(0, 1000),
            )
            for _ in range(400)
        ]
        df = spark.createDataFrame(pts, "lon long, lat long, v long")
        got = {
            (r_["cell_x"], r_["cell_y"]): (
                r_["n_pts"], r_["wsum"], r_["idw_value"]
            )
            for r_ in idw_grid(
                df, "v", chars=chars, radius_fixed=r, v_abs_max=1000
            ).collect()
        }
        assert got == ref_idw(pts, chars, r), f"seed {seed}"
        assert got, f"seed {seed} produced nothing"


def test_value_guard_raises(spark):
    df = spark.createDataFrame([(0, 0, 5_000)], "lon long, lat long, v long")
    out = idw_grid(df, "v", v_abs_max=1000)
    with pytest.raises(Exception, match="v_abs_max"):
        out.collect()


def test_overflow_budget_rejected(spark):
    df = spark.createDataFrame([(0, 0, 1)], "lon long, lat long, v long")
    with pytest.raises(ValueError, match="aggregation budget"):
        idw_grid(df, "v", v_abs_max=10**9, max_pts_per_cell=10**9)


def test_negative_value_division_raises(spark):
    df = spark.createDataFrame([(0, 0, -5)], "lon long, lat long, v long")
    out = idw_grid(df, "v", v_abs_max=1000)
    with pytest.raises(Exception, match="negative weighted sum"):
        out.collect()


def test_co_visits_semantics(spark):
    from osmquadtree_rust_spark.operators.trajectory import co_visits

    H = 3_600_000_000
    # users 1,2 share a cell in hour 0 (1 pings twice there — distinct
    # slot counts once) and again in hour 2; user 3 visits the same cell
    # in a different hour only
    rows = [
        (1, H // 2, 100, 100),
        (1, H // 3, 150, 120),       # same cell+hour as above
        (2, H // 4, 200, 180),
        (1, 2 * H + 1, 100, 100),
        (2, 2 * H + 2, 130, 140),
        (3, 5 * H, 100, 100),
        (3, 5 * H + 1, 90_000_000, 0),  # far cell
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, lon long, lat long")
    got = {
        (r["user_a"], r["user_b"]): r["n_covisits"]
        for r in co_visits(df, chars=6, bucket_us=H).collect()
    }
    assert got == {(1, 2): 2}


def test_speeding_segments_semantics(spark):
    from osmquadtree_rust_spark.operators.trajectory import speeding_segments

    # user 1: 3 segments — fast (big move, 1s), slow (small move, 1h),
    # zero-dt with movement (always a violation); plus a teleport pair
    # (extent > max_span) that must be excluded entirely
    M = 1_000_000
    rows = [
        (1, 1, 0 * M, 0, 0),
        (1, 2, 1 * M, 10_000, 0),          # ~111 m in 1 s -> speeding
        (1, 3, 3601 * M, 10_100, 0),       # ~1 m in 1 h -> fine
        (1, 4, 3601 * M, 10_200, 0),       # dt=0, moved -> speeding
        (1, 5, 3602 * M, 900_000, 0),      # teleport: excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, lon long, lat long"
    )
    r = speeding_segments(df, vmax_mmps=30_000, max_span_fixed=200_000).collect()
    assert len(r) == 1
    assert (r[0]["n_segs"], r[0]["n_speeding"]) == (3, 2)
    assert 100_000 < r[0]["max_chord_mm"] < 120_000  # the ~111 m segment


def test_pair_distance_histogram_vs_bruteforce(spark):
    import itertools

    from osmquadtree_rust_spark.operators.spatial_join import (
        pair_distance_histogram,
    )

    rng = random.Random(3)
    pts = [
        (j, rng.randint(-50_000, 50_000), rng.randint(-40_000, 40_000))
        for j in range(250)
    ]
    radii = [1_000, 4_000, 16_000]
    df = spark.createDataFrame(pts, "event_id long, lon long, lat long")
    got = {
        r["band"]: (r["radius_fixed"], r["n_pairs"])
        for r in pair_distance_histogram(df, radii).collect()
    }
    exp = {}
    bounds = [0] + [r * r for r in radii]
    for (i1, x1, y1), (i2, x2, y2) in itertools.combinations(pts, 2):
        d2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
        if 1 <= d2 <= bounds[-1]:
            for k in range(len(radii)):
                if d2 <= bounds[k + 1]:
                    rf, n = exp.get(k, (radii[k], 0))
                    exp[k] = (rf, n + 1)
                    break
    assert got == exp and sum(n for _, n in exp.values()) > 100


def test_pair_distance_histogram_rejects_bad_radii(spark):
    from osmquadtree_rust_spark.operators.spatial_join import (
        pair_distance_histogram,
    )

    df = spark.createDataFrame([(1, 0, 0)], "event_id long, lon long, lat long")
    with pytest.raises(ValueError, match="strictly increasing"):
        pair_distance_histogram(df, [5_000, 5_000])


def test_flow_matrix_semantics(spark):
    from osmquadtree_rust_spark.operators.trajectory import flow_matrix

    # user 1 walks far cell A -> A (no flow) -> B -> A; user 2 B -> A;
    # one teleport pair excluded.  chars=6 cells span 109863x109863.
    A, B = (0, 0), (200_000, 0)
    rows = [
        (1, 1, 10, *A), (1, 2, 20, 50, 60), (1, 3, 30, *B), (1, 4, 40, *A),
        (2, 5, 10, *B), (2, 6, 20, *A),
        (2, 7, 30, 900_000, 0),   # teleport from A: excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, lon long, lat long"
    )
    got = {
        ((r["from_x"], r["from_y"]), (r["to_x"], r["to_y"])):
            (r["n_steps"], r["n_entities"])
        for r in flow_matrix(df, chars=6, max_span_fixed=200_000).collect()
    }
    ca, cb = cell_of(*A, 6), cell_of(*B, 6)
    assert got == {(ca, cb): (1, 1), (cb, ca): (2, 2)}


def test_pairwise_operator_plan_shapes(spark):
    # The candidate joins must never fall back to nested-loop/cartesian.
    from osmquadtree_rust_spark.operators.spatial_join import (
        pair_distance_histogram,
    )
    from osmquadtree_rust_spark.operators.trajectory import co_visits

    pts = spark.createDataFrame(
        [(1, 10, 0, 0), (2, 20, 100, 100)],
        "user_id long, ts long, lon long, lat long",
    )
    for df in (
        co_visits(pts, chars=6),
        pair_distance_histogram(
            pts.withColumnRenamed("user_id", "event_id"), [5_000]
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_visit_profile_semantics(spark):
    from osmquadtree_rust_spark.operators.trajectory import visit_profile

    D = 86_400_000_000
    # user 1: cell A on days 0,1,2 (3 visits; repeats within day 0
    # dedup) + cell B on day 1 -> 4 visits, 2 cells, top 3
    A, B = (0, 0), (200_000, 0)
    rows = [
        (1, 10, *A), (1, 20, *A),
        (1, D + 1, *A), (1, 2 * D + 1, *A), (1, D + 2, *B),
        (2, 5, *B),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, lon long, lat long")
    got = {
        r["user_id"]: (
            r["n_visits"], r["n_cells"], r["top_visits"], r["top_share_ppm"]
        )
        for r in visit_profile(df, chars=6, bucket_us=D).collect()
    }
    assert got == {1: (4, 2, 3, 750_000), 2: (1, 1, 1, 1_000_000)}


def test_radius_of_gyration_exact(spark):
    from osmquadtree_rust_spark.operators.trajectory import radius_of_gyration

    # user 1: symmetric square around (1000, 2000); user 2: one point
    rows = [
        (1, 900, 1900), (1, 1100, 1900), (1, 900, 2100), (1, 1100, 2100),
        (2, -5, 7),
    ]
    df = spark.createDataFrame(rows, "user_id long, lon long, lat long")
    got = {
        r["user_id"]: (r["n_points"], r["cx"], r["cy"], r["rog2"])
        for r in radius_of_gyration(df).collect()
    }
    assert got[1] == (4, 1000, 2000, 100 * 100 * 2)
    assert got[2] == (1, -5, 7, 0)


def test_radius_of_gyration_extent_guard(spark):
    from osmquadtree_rust_spark.operators.trajectory import radius_of_gyration

    df = spark.createDataFrame(
        [(1, 0, 0), (1, 50_000_000, 0)], "user_id long, lon long, lat long"
    )
    out = radius_of_gyration(df, max_extent_fixed=1_000_000)
    with pytest.raises(Exception, match="max_extent_fixed"):
        out.collect()


def test_od_matrix_by_hour(spark):
    from osmquadtree_rust_spark.operators.trajectory import od_matrix

    H = 3_600_000_000
    # trip 1 departs hour 2, trip 2 (after an 8h gap) departs hour 13
    rows = [
        (1, 1, 2 * H + 5, 0, 0), (1, 2, 3 * H, 200_000, 0),
        (1, 3, 13 * H, 0, 0), (1, 4, 14 * H, 200_000, 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, lon long, lat long"
    )
    got = {
        r["dep_hour"]: r["n_trips"]
        for r in od_matrix(df, max_gap_us=6 * H, by_hour=True).collect()
    }
    assert got == {2: 1, 13: 1}
    # without by_hour the two identical OD pairs merge
    plain = od_matrix(df, max_gap_us=6 * H).collect()
    assert len(plain) == 1 and plain[0]["n_trips"] == 2
