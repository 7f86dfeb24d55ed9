"""Seeded randomized net: the mobility metrics (radius_of_gyration,
visit_profile, flow_matrix) vs pure-python references over random
walks — the highest-yield test form for grid/aggregate operators."""

import random

from osmquadtree_rust_spark.operators.trajectory import (
    flow_matrix,
    radius_of_gyration,
    visit_profile,
)
from tests.test_idw import cell_of

SCHEMA = "user_id long, event_id long, ts long, lon long, lat long"
DAY = 86_400_000_000


def _walk(seed, users=5, steps=(5, 40)):
    rng = random.Random(seed)
    rows, eid = [], 0
    for u in range(users):
        t = rng.randrange(10**6)
        x = rng.randint(-500_000, 500_000)
        y = rng.randint(-400_000, 400_000)
        for _ in range(rng.randrange(*steps)):
            t += rng.randrange(1, 2 * DAY)
            x += rng.randint(-120_000, 120_000)
            y += rng.randint(-100_000, 100_000)
            rows.append((u, eid, t, x, y))
            eid += 1
    return rows


def test_radius_of_gyration_net(spark):
    for seed in range(3):
        rows = _walk(seed)
        df = spark.createDataFrame(rows, SCHEMA)
        got = {
            r["user_id"]: (r["n_points"], r["cx"], r["cy"], r["rog2"])
            for r in radius_of_gyration(df).collect()
        }
        exp = {}
        by_u = {}
        for (u, _, _, x, y) in rows:
            by_u.setdefault(u, []).append((x, y))
        for u, pts in by_u.items():
            n = len(pts)
            cx = (sum(x for x, _ in pts) + n * 1_800_000_000) // n - 1_800_000_000
            cy = (sum(y for _, y in pts) + n * 900_000_000) // n - 900_000_000
            sd2 = sum((x - cx) ** 2 + (y - cy) ** 2 for x, y in pts)
            exp[u] = (n, cx, cy, sd2 // n)
        assert got == exp, f"seed {seed}"


def test_visit_profile_net(spark):
    for seed in range(3):
        rows = _walk(seed + 50)
        df = spark.createDataFrame(rows, SCHEMA)
        got = {
            r["user_id"]: (
                r["n_visits"], r["n_cells"], r["top_visits"],
                r["top_share_ppm"],
            )
            for r in visit_profile(df, chars=6, bucket_us=DAY).collect()
        }
        vis = {}
        for (u, _, t, x, y) in rows:
            vis.setdefault(u, set()).add((cell_of(x, y, 6), t // DAY))
        exp = {}
        for u, s in vis.items():
            per_cell = {}
            for c, _ in s:
                per_cell[c] = per_cell.get(c, 0) + 1
            n = len(s)
            top = max(per_cell.values())
            exp[u] = (n, len(per_cell), top, top * 1_000_000 // n)
        assert got == exp, f"seed {seed}"


def test_flow_matrix_net(spark):
    for seed in range(3):
        rows = _walk(seed + 100)
        df = spark.createDataFrame(rows, SCHEMA)
        got = {
            ((r["from_x"], r["from_y"]), (r["to_x"], r["to_y"])):
                (r["n_steps"], r["n_entities"])
            for r in flow_matrix(
                df, chars=6, max_span_fixed=200_000
            ).collect()
        }
        exp_steps = {}
        exp_users = {}
        by_u = {}
        for (u, e, t, x, y) in rows:
            by_u.setdefault(u, []).append((t, e, x, y))
        for u, pts in by_u.items():
            pts.sort()
            for (pt, _, px, py), (t, _, x, y) in zip(pts, pts[1:]):
                if abs(x - px) > 200_000 or abs(y - py) > 200_000:
                    continue
                fc, tc = cell_of(px, py, 6), cell_of(x, y, 6)
                if fc == tc:
                    continue
                k = (fc, tc)
                exp_steps[k] = exp_steps.get(k, 0) + 1
                exp_users.setdefault(k, set()).add(u)
        exp = {
            k: (n, len(exp_users[k])) for k, n in exp_steps.items()
        }
        assert got == exp, f"seed {seed}"
