"""snap_to_roads: seeded net vs a pure-python brute force, guard and
tie-break pins.  The python reference implements the identical floored
integer snap (python // floors, but every idiv operand is non-negative
by construction, so floor == trunc == both engines)."""

import random

import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_spark.operators.map_match import snap_exprs, snap_to_roads


def ref_snap(px, py, segs, cap):
    best = None
    for (rid, s, x1, y1, x2, y2) in segs:
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        tn = min(max((px - x1) * dx + (py - y1) * dy, 0), len2)
        qx = x1 + (1 if dx >= 0 else -1) * ((tn * abs(dx)) // max(len2, 1))
        qy = y1 + (1 if dy >= 0 else -1) * ((tn * abs(dy)) // max(len2, 1))
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        if d2 <= cap * cap:
            k = (d2, rid, s, qx, qy)
            if best is None or k < best:
                best = k
    return best


def _run(spark, segs, pts, cap, span, **kw):
    roads = spark.createDataFrame(
        segs, "road_id long, seg long, x1 long, y1 long, x2 long, y2 long"
    )
    pdf = spark.createDataFrame(pts, "event_id long, lon long, lat long")
    out = snap_to_roads(
        pdf, roads, max_dist_fixed=cap, max_seg_span_fixed=span, **kw
    )
    return {
        r["event_id"]: (
            r["road_id"], r["seg"], r["snap_d2"], r["snap_x"], r["snap_y"]
        )
        for r in out.collect()
    }


def test_seeded_net_vs_bruteforce(spark):
    # 6 seeded configs spanning caps, spans, degenerate (zero-length)
    # segments, and points straddling the match cap — the highest-yield
    # test form for candidate-join planners (CLAUDE.md).
    for seed in range(6):
        rng = random.Random(seed)
        cap = rng.choice([500, 5_000, 30_000])
        span = rng.choice([20_000, 50_000])
        segs = []
        for i in range(rng.randint(5, 40)):
            x1 = rng.randint(-300_000, 300_000)
            y1 = rng.randint(-200_000, 200_000)
            if i % 9 == 0:
                x2, y2 = x1, y1  # degenerate: snap to the endpoint
            else:
                x2 = x1 + rng.randint(-span, span)
                y2 = y1 + rng.randint(-span, span)
            segs.append((i % 7, i, x1, y1, x2, y2))
        pts = []
        for j in range(300):
            _, _, x1, y1, x2, y2 = segs[rng.randrange(len(segs))]
            t = rng.random()
            pts.append((
                j,
                int(x1 + t * (x2 - x1)) + rng.randint(-2 * cap, 2 * cap),
                int(y1 + t * (y2 - y1)) + rng.randint(-2 * cap, 2 * cap),
            ))
        got = _run(spark, segs, pts, cap, span)
        exp = {}
        for (j, px, py) in pts:
            b = ref_snap(px, py, segs, cap)
            if b is not None:
                exp[j] = (b[1], b[2], b[0], b[3], b[4])
        assert got == exp, f"seed {seed}: {len(got)} vs {len(exp)}"
        assert exp, f"seed {seed} matched nothing — test lost its teeth"


def test_deterministic_tiebreak(spark):
    # Two coincident segments with different (road, seg) ids: the winner
    # must be the lexicographically least (d2, road_id, seg).
    segs = [(7, 3, 0, 0, 10_000, 0), (2, 9, 0, 0, 10_000, 0)]
    got = _run(spark, segs, [(1, 5_000, 300)], cap=1_000, span=20_000)
    assert got == {1: (2, 9, 90_000, 5_000, 0)}


def test_keep_columns_pass_through(spark):
    segs = [(1, 0, 0, 0, 10_000, 0)]
    roads = spark.createDataFrame(
        segs, "road_id long, seg long, x1 long, y1 long, x2 long, y2 long"
    )
    pdf = spark.createDataFrame(
        [(1, 42, 5_000, 100)], "event_id long, user_id long, lon long, lat long"
    )
    rows = snap_to_roads(
        pdf, roads, max_dist_fixed=500, max_seg_span_fixed=20_000,
        keep=("user_id",),
    ).collect()
    assert len(rows) == 1 and rows[0]["user_id"] == 42


def test_overflow_guard_rejects_huge_spans(spark):
    roads = spark.createDataFrame(
        [(1, 0, 0, 0, 1, 1)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    pts = spark.createDataFrame([(1, 0, 0)], "event_id long, lon long, lat long")
    with pytest.raises(ValueError, match="int64 bound"):
        snap_to_roads(
            pts, roads, max_dist_fixed=1_000, max_seg_span_fixed=2_000_000_000
        )


def test_span_violation_raises_in_projection(spark):
    # A segment wider than max_seg_span_fixed must raise, not silently
    # drop or mis-snap.
    roads = spark.createDataFrame(
        [(1, 0, 0, 0, 400_000, 0)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    pts = spark.createDataFrame(
        [(1, 1_000, 50)], "event_id long, lon long, lat long"
    )
    out = snap_to_roads(
        pts, roads, max_dist_fixed=1_000, max_seg_span_fixed=100_000
    )
    with pytest.raises(Exception, match="exceeds max_seg_span_fixed"):
        out.collect()


def test_snap_exprs_stage_discipline():
    # Stages must only reference prior stages' names — re-inlining the
    # chain is the documented substitution trap.
    s1, s2, s3 = snap_exprs("px", "py", "x1", "y1", "x2", "y2", "duckdb")
    assert set(s1) == {"__dx", "__dy", "__len2", "__tn"}
    assert set(s2) == {"__qx", "__qy"}
    assert set(s3) == {"__d2"}
    assert "__tn" in s2["__qx"] and "__qx" in s3["__d2"]
    assert "GREATEST" in s2["__qx"]  # len2=0 guard


def test_route_edges_run_collapse_and_gaps(spark):
    from osmquadtree_rust_spark.operators.map_match import route_edges

    # user 1: roads A A B B A -> visits A,B,A -> edges (A,B),(B,A)
    # user 2: roads B A A    -> visits B,A   -> edges (B,A)
    rows = [
        (1, 1, 10, "A"), (1, 2, 20, "A"), (1, 3, 30, "B"),
        (1, 4, 40, "B"), (1, 5, 50, "A"),
        (2, 6, 10, "B"), (2, 7, 20, "A"), (2, 8, 30, "A"),
    ]
    m = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, road_id string"
    )
    got = {
        (r["road_from"], r["road_to"]): (r["n_trans"], r["n_entities"])
        for r in route_edges(m).collect()
    }
    assert got == {("A", "B"): (1, 1), ("B", "A"): (2, 2)}


def test_route_edges_single_road_no_edges(spark):
    from osmquadtree_rust_spark.operators.map_match import route_edges

    m = spark.createDataFrame(
        [(1, 1, 10, "A"), (1, 2, 20, "A")],
        "user_id long, event_id long, ts long, road_id string",
    )
    assert route_edges(m).count() == 0


def test_simplify_track_grid_semantics(spark):
    from osmquadtree_rust_spark.operators.trajectory import simplify_track_grid

    # depth-12 cells are 1-unit wide in u-space... use chars=7 cells
    # (13733 x 13733 units): points 1-2 share a cell, 3 moves, 4 stays,
    # 5 returns to the start cell (kept — only CONSECUTIVE runs collapse)
    rows = [
        (1, 1, 10, 100, 100),
        (1, 2, 20, 200, 200),          # same cell as 1 -> dropped
        (1, 3, 30, 20_000, 100),       # new cell -> kept
        (1, 4, 40, 20_100, 150),       # same cell -> dropped
        (1, 5, 50, 100, 100),          # back to start cell -> kept
        (2, 6, 10, 5, 5),              # single point -> kept
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, lon long, lat long"
    )
    kept = sorted(
        (r["user_id"], r["event_id"])
        for r in simplify_track_grid(df, chars=7).collect()
    )
    assert kept == [(1, 1), (1, 3), (1, 5), (2, 6)]


def test_simplify_track_grid_finest_grid_keeps_all(spark):
    from osmquadtree_rust_spark.operators.trajectory import simplify_track_grid

    rows = [(1, i, i * 10, i * 200_000, 0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, lon long, lat long"
    )
    assert simplify_track_grid(df, chars=8).count() == 5


def test_road_speed_stats_semantics(spark):
    from osmquadtree_rust_spark.operators.map_match import road_speed_stats

    # user 1: two same-road pairs on A (one spanning a road change is
    # excluded), user 2: one pair on B with zero elapsed time (speed
    # divides by GREATEST(sum_us,1))
    rows = [
        (1, 1, 0,          7, 0, 0),
        (1, 2, 1_000_000,  7, 10_000, 0),     # A pair 1
        (1, 3, 2_000_000,  9, 20_000, 0),     # road change: excluded
        (1, 4, 3_000_000,  9, 30_000, 0),     # B... road 9 pair
        (2, 5, 0,          7, 0, 0),
        (2, 6, 0,          7, 5_000, 0),      # dt = 0
    ]
    m = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts long, road_id long, "
        "snap_x long, snap_y long",
    )
    got = {
        r["road_id"]: (r["n_segs"], r["sum_us"], r["sum_mm"], r["speed_mmps"])
        for r in road_speed_stats(m).collect()
    }
    assert set(got) == {7, 9}
    n7, us7, mm7, sp7 = got[7]
    assert (n7, us7) == (2, 1_000_000)
    assert sp7 == mm7 * 1_000_000 // max(us7, 1)
    n9, us9, mm9, sp9 = got[9]
    assert (n9, us9) == (1, 1_000_000)
    assert sp9 == mm9 * 1_000_000 // us9


def test_snap_plan_shape(spark):
    # The candidate join must be a hash/sort-merge equi-join on the cell
    # key — never a nested-loop/cartesian fallback — and the road-side
    # covering explode must sit on the build side, not force a second
    # scan of the points.
    segs = [(1, 0, 0, 0, 10_000, 0)]
    roads = spark.createDataFrame(
        segs, "road_id long, seg long, x1 long, y1 long, x2 long, y2 long"
    )
    pts = spark.createDataFrame(
        [(1, 5_000, 100)], "event_id long, lon long, lat long"
    )
    out = snap_to_roads(pts, roads, max_dist_fixed=500, max_seg_span_fixed=20_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_conflate_roads_bearing_and_distance(spark):
    from osmquadtree_rust_spark.operators.map_match import conflate_roads

    # A: one horizontal segment.  B: a parallel twin 300 units away
    # (match), a perpendicular segment crossing nearby (bearing-blocked),
    # and a parallel segment far beyond the cap (distance-blocked).
    a = spark.createDataFrame(
        [(1, 0, 0, 0, 40_000, 0)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    b = spark.createDataFrame(
        [
            (10, 0, 0, 300, 40_000, 300),        # parallel, close
            (11, 0, 20_000, -5_000, 20_000, 5_000),  # perpendicular
            (12, 0, 0, 50_000, 40_000, 50_000),  # parallel, far
        ],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    rows = conflate_roads(
        a, b, max_dist_fixed=2_000, max_seg_span_fixed=50_000
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a_road"], r["b_road"], r["snap_d2"]) == (1, 10, 300 * 300)


def test_conflate_roads_angle_threshold(spark):
    from osmquadtree_rust_spark.operators.map_match import conflate_roads

    # tan(angle) = 10000/40000 = 0.25 <= 0.268 passes; 0.30 fails
    a = spark.createDataFrame(
        [(1, 0, 0, 0, 40_000, 0)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    ok = spark.createDataFrame(
        [(20, 0, 0, 100, 40_000, 10_100)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    bad = spark.createDataFrame(
        [(21, 0, 0, 100, 40_000, 12_100)],
        "road_id long, seg long, x1 long, y1 long, x2 long, y2 long",
    )
    kw = dict(max_dist_fixed=10_000, max_seg_span_fixed=50_000)
    assert conflate_roads(a, ok, **kw).count() == 1
    assert conflate_roads(a, bad, **kw).count() == 0


def test_conflate_seeded_net_vs_bruteforce(spark):
    from osmquadtree_rust_spark.operators.map_match import conflate_roads

    def ref_conflate(a_segs, b_segs, cap, tan_ppm):
        out = {}
        for (ar, asg, ax1, ay1, ax2, ay2) in a_segs:
            mx = ((ax1 + 1_800_000_000) + (ax2 + 1_800_000_000)) // 2 - 1_800_000_000
            my = ((ay1 + 900_000_000) + (ay2 + 900_000_000)) // 2 - 900_000_000
            vx, vy = ax2 - ax1, ay2 - ay1
            best = None
            for (br, bsg, x1, y1, x2, y2) in b_segs:
                dx, dy = x2 - x1, y2 - y1
                if abs(vx * dy - vy * dx) * 1_000_000 > abs(vx * dx + vy * dy) * tan_ppm:
                    continue
                len2 = dx * dx + dy * dy
                tn = min(max((mx - x1) * dx + (my - y1) * dy, 0), len2)
                qx = x1 + (1 if dx >= 0 else -1) * ((tn * abs(dx)) // max(len2, 1))
                qy = y1 + (1 if dy >= 0 else -1) * ((tn * abs(dy)) // max(len2, 1))
                d2 = (mx - qx) ** 2 + (my - qy) ** 2
                if d2 <= cap * cap:
                    k = (d2, br, bsg)
                    if best is None or k < best:
                        best = k
            if best is not None:
                out[(ar, asg)] = (best[1], best[2], best[0])
        return out

    for seed in range(4):
        rng = random.Random(100 + seed)
        cap, span, tan_ppm = 3_000, 40_000, 268_000
        def seg(i):
            x1 = rng.randint(-200_000, 200_000)
            y1 = rng.randint(-150_000, 150_000)
            return (i % 5, i, x1, y1,
                    x1 + rng.randint(-span, span), y1 + rng.randint(-span, span))
        a_segs = [seg(i) for i in range(25)]
        # B: jittered copies of A plus random strangers
        b_segs = []
        for j, (ar, asg, x1, y1, x2, y2) in enumerate(a_segs):
            dx, dy = rng.randint(-4_000, 4_000), rng.randint(-4_000, 4_000)
            rot = rng.randint(-15_000, 15_000)
            b_segs.append((50 + ar, j, x1 + dx, y1 + dy, x2 + dx, y2 + dy + rot))
        for j in range(8):
            b_segs.append((90, 100 + j, *seg(j)[2:]))
        a_df = spark.createDataFrame(
            a_segs, "road_id long, seg long, x1 long, y1 long, x2 long, y2 long"
        )
        b_df = spark.createDataFrame(
            b_segs, "road_id long, seg long, x1 long, y1 long, x2 long, y2 long"
        )
        got = {
            (r["a_road"], r["a_seg"]): (r["b_road"], r["b_seg"], r["snap_d2"])
            for r in conflate_roads(
                a_df, b_df, max_dist_fixed=cap, max_seg_span_fixed=60_000
            ).collect()
        }
        exp = ref_conflate(a_segs, b_segs, cap, tan_ppm)
        assert got == exp, f"seed {seed}"
        assert 0 < len(exp), f"seed {seed} matched nothing"


def test_route_edges_trip_bounded(spark):
    from osmquadtree_rust_spark.operators.map_match import route_edges

    H = 3_600_000_000
    # A -> B within a trip, then a 7h silence, then C -> A: the B->C
    # cross-gap transition must vanish with max_gap_us=6h and exist
    # without it
    rows = [
        (1, 1, 0, "A"), (1, 2, 1 * H, "B"),
        (1, 3, 8 * H, "C"), (1, 4, 9 * H, "A"),
    ]
    m = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, road_id string"
    )
    plain = {
        (r["road_from"], r["road_to"]) for r in route_edges(m).collect()
    }
    tripped = {
        (r["road_from"], r["road_to"])
        for r in route_edges(m, max_gap_us=6 * H).collect()
    }
    assert plain == {("A", "B"), ("B", "C"), ("C", "A")}
    assert tripped == {("A", "B"), ("C", "A")}
