"""Katz centrality: numpy-twin bit-parity + networkx convergence
cross-check + weighted/normalize semantics."""

import math

import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import katz_centrality

EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 1), (4, 2), (5, 4), (2, 5),
]
N = 6
ALPHA, BETA = 0.1, 1.0


def _katz_twin(iters: int, normalize: bool = True):
    """Pure-python replay of the engine recurrence (x0=0,
    x_k = beta + alpha*sum of in-neighbor x_{k-1}) + final L2 norm."""
    x = [0.0] * N
    for _ in range(iters):
        x = [
            BETA + ALPHA * sum(x[u] for u, v in EDGES if v == w)
            for w in range(N)
        ]
    if normalize:
        nrm = math.sqrt(sum(v * v for v in x))
        if nrm > 0:
            x = [v / nrm for v in x]
    return x


@pytest.fixture(scope="module")
def graph(spark):
    return Graph.from_edge_list(spark, EDGES, vertices=range(N))


@pytest.mark.parametrize("iters", [1, 3, 8])
def test_katz_matches_numpy_twin(spark, graph, iters):
    res = katz_centrality(
        graph, alpha=ALPHA, beta=BETA, max_iterations=iters, normalize=True
    )
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    want = _katz_twin(iters)
    for i in range(N):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_katz_matches_networkx_at_convergence(spark, graph):
    nx = pytest.importorskip("networkx")
    G = nx.DiGraph(EDGES)
    G.add_nodes_from(range(N))
    want = nx.katz_centrality(G, alpha=ALPHA, beta=BETA, tol=1e-12, normalized=True)
    res = katz_centrality(
        graph, alpha=ALPHA, beta=BETA, max_iterations=200,
        tolerance=1e-12, check_interval=4,
    )
    assert res.converged
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    for i in range(N):
        assert got[i] == pytest.approx(want[i], abs=1e-7), i


def test_katz_weighted_scales_contributions(spark):
    # doubled weight into 2 doubles 2's walk contribution
    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0)], "src long, dst long, weight double"
    )
    g = Graph(e)
    res = katz_centrality(
        g, alpha=0.2, max_iterations=6, weighted=True, normalize=False
    )
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    assert got[1] == pytest.approx(1.0 + 0.2 * 1.0, abs=1e-12)
    assert got[2] == pytest.approx(1.0 + 0.2 * 2.0, abs=1e-12)
    assert got[0] == pytest.approx(1.0, abs=1e-12)


def test_katz_isolated_vertices_get_beta(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], vertices=[0, 1, 2])
    res = katz_centrality(g, max_iterations=3, normalize=False)
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    assert got[2] == pytest.approx(1.0, abs=1e-12)  # no in-edges: beta
    assert got[0] == pytest.approx(1.0, abs=1e-12)
    assert got[1] == pytest.approx(1.0 + 0.1, abs=1e-12)
