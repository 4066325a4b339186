"""k-truss peeling vs networkx and hand-built fixtures."""

import networkx as nx
import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import k_truss


def _edge_set(res):
    return {tuple(sorted((r["src"], r["dst"]))) for r in res.edges.collect()}


def test_ktruss_matches_networkx(spark):
    gnx = nx.gnm_random_graph(80, 400, seed=3)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(80))
    for k in (3, 4, 5):
        assert _edge_set(k_truss(g, k)) == {
            tuple(sorted(e)) for e in nx.k_truss(gnx, k).edges()
        }


def test_ktruss_peeling_cascade(spark):
    # K4 (a 4-truss) with a pendant triangle hanging off node 3: the
    # triangle's outer edges have support 1, so the 4-truss peel first
    # drops them, then the now-unsupported (3,4)/(3,5) remnants.
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pendant = [(3, 4), (3, 5), (4, 5)]
    g = Graph.from_edge_list(spark, k4 + pendant, vertices=range(6))
    res = k_truss(g, 4)
    assert _edge_set(res) == {tuple(sorted(e)) for e in k4}
    assert res.iterations_ran >= 2  # cascade, not a single pass


def test_ktruss_two_is_identity(spark):
    edges = [(0, 1), (2, 3)]
    g = Graph.from_edge_list(spark, edges, vertices=range(4))
    res = k_truss(g, 2)
    assert _edge_set(res) == {(0, 1), (2, 3)}
    assert k_truss(g, 3).edge_count == 0  # no triangles at all


def test_ktruss_rejects_bad_k(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], vertices=range(2))
    with pytest.raises(ValueError):
        k_truss(g, 1)
