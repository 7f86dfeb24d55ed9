"""kNN cell-ring expansion vs brute force; similarity operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from osmquadtree_rust_spark.functions import qt_numpy as qtn
from osmquadtree_rust_spark.operators import knn as K
from osmquadtree_rust_spark.operators import similarity as SIM


def _points(spark, n=4000, seed=13, level=8):
    rng = np.random.RandomState(seed)
    lon = rng.randint(-1800000000, 1799999998, n)
    lat = rng.randint(-890000000, 889999998, n)
    # dense cluster near one spot so k fits within a ring
    lon[: n // 4] = 605000000 + rng.randint(0, 10000000, n // 4)
    lat[: n // 4] = 405000000 + rng.randint(0, 10000000, n // 4)
    cell = qtn.calculate_point(lon, lat, level, 0.0)
    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "lon": lon, "lat": lat, "cell": cell})
    )
    return df, lon, lat


@pytest.mark.parametrize(
    "qlon,qlat", [(605000000, 405000000), (0, 0), (-1799999000, 880000000)]
)
def test_knn_matches_brute_force(spark, qlon, qlat):
    df, lon, lat = _points(spark)
    k = 15
    got = K.knn_search(df, qlon, qlat, k, level=8)
    got_rows = sorted((r.id, r.dist_sq) for r in got.collect())
    d = (lon.astype(np.float64) - qlon) ** 2 + (lat.astype(np.float64) - qlat) ** 2
    order = np.lexsort((np.arange(len(d)), d))[:k]
    exp = sorted((int(i), float(d[i])) for i in order)
    assert got_rows == exp


def test_knn_includes_shallow_cells(spark):
    # a point whose 1-ulp box straddles a mercator midline gets a shallow
    # cell; it must still be findable
    df, lon, lat = _points(spark, n=500)
    shallow = df.filter(F.expr("(cell & 31) < 8")).count()
    # regardless of whether any exist in this sample, a query far from all
    # clusters still returns exactly k results
    got = K.knn_search(df, 1000, 2000, 7, level=8)
    assert got.count() == 7


def test_brute_force_topk_and_lsh(spark):
    rng = np.random.RandomState(3)
    vecs = rng.rand(300, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    top = SIM.brute_force_topk(df, q, k=10).collect()
    # numpy's fold order over contiguous float64 matches the engine's
    # left-to-right aggregate() for these inputs
    dots = np.array(
        [
            sum(float(x) * float(v) for x, v in zip(vecs[i], q))
            for i in range(300)
        ]
    )
    exp_order = np.lexsort((np.arange(300), -dots))[:10]
    got_ids = [r.vec_id for r in top]
    assert got_ids == [int(i) for i in exp_order]
    score_map = {int(i): int(np.floor(dots[i] * 1e6)) for i in range(300)}
    for r in top:
        assert score_map[r.vec_id] == r.score_ppm

    lsh = SIM.lsh_topk(df, q, k=10, n_planes=3)
    got = lsh.collect()
    assert len(got) <= 10
    # every LSH hit must also be a true scored row with matching score
    for r in got:
        assert score_map[r.vec_id] == r.score_ppm
