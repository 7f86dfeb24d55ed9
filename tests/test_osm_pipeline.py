"""OSM-shaped end-to-end tiling (calcqts + sortblocks chain) vs oracle."""

import numpy as np
import pytest

import oracle_qt as O
from osmquadtree_rust_spark.operators import tiles as T
from osmquadtree_rust_spark.plans import osm_pipeline as OP
from osmquadtree_rust_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    nodes, ways, rels = FX.elements_fixture(n_nodes=600, n_ways=120, n_rels=30)
    return (nodes, ways, rels), FX.elements_spark_dfs(spark, nodes, ways, rels)


@pytest.mark.parametrize("target", [50, 400, 40000])
def test_tile_elements_matches_oracle(spark, fixture_dfs, target):
    (nodes, ways, rels), (ndf, wdf, rdf) = fixture_dfs
    assigned, groups = OP.tile_elements(ndf, wdf, rdf, target=target)
    rows = assigned.collect()

    # oracle qts (calcinmem spec + planet-scale finalize)
    nq, wq, rq = O.calc_element_quadtrees(nodes, ways, rels)
    rq = {k: (0 if v < 0 else v) for k, v in rq.items()}

    # oracle histogram -> groups -> routing, with weight = 1/8/20
    hist = {}
    for d, wgt in ((nq, 1), (wq, 8), (rq, 20)):
        for _id, q in d.items():
            if q < 0:
                continue
            cell = O.qt_round(q, 17)
            hist[cell] = hist.get(cell, 0) + wgt
    tree = T.build_tree_from_histogram(list(hist), list(hist.values()))
    exp_groups = T.find_tree_groups(tree, target, target // 2)
    exp_cells = T.group_lookup_arrays(exp_groups)
    assert sorted(groups.tolist()) == sorted(exp_cells.tolist())

    exp_qts = {(0, k): v for k, v in nq.items()}
    exp_qts.update({(1, k): v for k, v in wq.items()})
    exp_qts.update({(2, k): v for k, v in rq.items()})
    for r in rows:
        assert exp_qts[(r.etype, r.id)] == r.qt
        i = exp_groups.find(int(r.qt))
        assert exp_groups.qt[i] == r.tile
    assert len(rows) == len(exp_qts)


def test_weight_conservation(spark, fixture_dfs):
    (nodes, ways, rels), (ndf, wdf, rdf) = fixture_dfs
    assigned, groups = OP.tile_elements(ndf, wdf, rdf, target=400)
    per_tile = assigned.groupBy("tile").count().collect()
    total = sum(r["count"] for r in per_tile)
    assert total == len(nodes) + len(ways) + len(rels)
