"""k-truss peeling vs networkx and hand-built fixtures."""

import networkx as nx
import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import k_truss, k_truss_multi, truss_decomposition


def _edge_set(res):
    return {tuple(sorted((r["src"], r["dst"]))) for r in res.edges.collect()}


def test_ktruss_matches_networkx(spark):
    gnx = nx.gnm_random_graph(80, 400, seed=3)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(80))
    for k in (3, 4, 5):
        # local_finish_edges=0 keeps every peel round distributed
        assert _edge_set(k_truss(g, k, local_finish_edges=0)) == {
            tuple(sorted(e)) for e in nx.k_truss(gnx, k).edges()
        }


def test_ktruss_local_finish_matches_distributed(spark):
    # default gate: after round 1 the survivors fit the in-process
    # endgame — must return exactly the distributed fixpoint
    gnx = nx.gnm_random_graph(80, 400, seed=7)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(80))
    for k in (3, 4):
        res = k_truss(g, k)
        assert _edge_set(res) == {
            tuple(sorted(e)) for e in nx.k_truss(gnx, k).edges()
        }
    assert any(m.get("mode") == "local_finish" for m in res.metrics)


def test_ktruss_prefilter_collapses_pendant(spark):
    # K4 (a 4-truss) with a pendant triangle hanging off node 3: the
    # pendant's outer vertices have degree 2 < k-1 = 3, so the cheap
    # (k-1)-core prefilter strips them before any wedge join runs.
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pendant = [(3, 4), (3, 5), (4, 5)]
    g = Graph.from_edge_list(spark, k4 + pendant, vertices=range(6))
    res = k_truss(g, 4)
    assert _edge_set(res) == {tuple(sorted(e)) for e in k4}
    assert any("core_prefilter" in m.get("mode", "") for m in res.metrics)


def test_ktruss_peeling_cascade_delta_rounds(spark):
    # Two K8 cliques joined by a triangle strip: the strip peels away
    # over several rounds with small removal sets, so the support
    # maintenance runs in delta mode (subtract dead triangles) rather
    # than re-enumerating — and must still match networkx exactly.
    import itertools

    cl = list(itertools.combinations(range(8), 2))
    edges = set(cl) | {(a + 20, b + 20) for a, b in cl}
    for i in range(7, 21):
        edges.add((i, i + 1))
        edges.add((i, i + 2))
    gnx = nx.Graph()
    gnx.add_edges_from(edges)
    g = Graph.from_edge_list(spark, sorted(edges), vertices=sorted(gnx.nodes()))
    res = k_truss(g, 4, local_finish_edges=0)
    assert _edge_set(res) == {tuple(sorted(e)) for e in nx.k_truss(gnx, 4).edges()}
    assert res.iterations_ran >= 2  # cascade, not a single pass
    assert any(m.get("mode") == "delta" for m in res.metrics)


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


def _nx_truss_numbers(gnx):
    """Per-edge truss numbers via repeated nx.k_truss (the brute twin)."""
    truss = {tuple(sorted(e)): 2 for e in gnx.edges()}
    k = 3
    sub = nx.k_truss(gnx, k)
    while sub.number_of_edges():
        for e in sub.edges():
            truss[tuple(sorted(e))] = k
        k += 1
        sub = nx.k_truss(gnx, k)
    return truss


def _decomp_map(res):
    return {
        tuple(sorted((r["src"], r["dst"]))): r["truss"]
        for r in res.per_edge.collect()
    }


def test_truss_decomposition_matches_networkx_local(spark):
    # default gate: the whole spectrum finishes in the in-process peel
    gnx = nx.gnm_random_graph(80, 400, seed=11)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(80))
    res = truss_decomposition(g)
    assert _decomp_map(res) == _nx_truss_numbers(gnx)
    assert res.edge_count == gnx.number_of_edges()
    assert res.max_truss == max(_nx_truss_numbers(gnx).values())
    assert any(m.get("mode") == "local_finish" for m in res.metrics)


def test_truss_decomposition_matches_networkx_distributed(spark):
    # local_finish_edges=0 keeps every level round distributed —
    # exercises the jump-to-min-support, rebuild and delta paths
    gnx = nx.gnm_random_graph(60, 260, seed=5)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(60))
    res = truss_decomposition(g, local_finish_edges=0)
    assert _decomp_map(res) == _nx_truss_numbers(gnx)
    modes = {m.get("mode") for m in res.metrics}
    assert "local_finish" not in modes


def test_truss_decomposition_agrees_with_single_k(spark):
    # the spectrum IS every k_truss at once: filtering truss >= k must
    # reproduce the single-k operator's edge set
    gnx = nx.gnm_random_graph(70, 320, seed=9)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(70))
    dm = _decomp_map(truss_decomposition(g))
    for k in (3, 4, 5):
        assert {e for e, t in dm.items() if t >= k} == _edge_set(k_truss(g, k))


def test_truss_decomposition_local_finish_mid_cascade(spark):
    # Regression: the local-finish endgame can fire on a MID-CASCADE
    # residual (a prior round's removals dropped a survivor's support
    # below the current level) — that residual is NOT a truss of the
    # input, so the in-process peel must start at the distributed
    # level, not 0.  Construction: K5 (separate component, truss 5)
    # plus edge (10,11) whose only two triangles run through wing
    # vertices 12/13 via support-1 edges.  Round 1 at level 1 removes
    # the 4 wing edges (truss 3) and drops (10,11)'s support to 0;
    # the 11 survivors then fit local_finish_edges=12.  (10,11) was
    # still removed at level 1 -> truss 3; an unseeded local peel
    # would assign 2.
    import itertools

    k5 = list(itertools.combinations(range(5), 2))
    wings = [(10, 12), (11, 12), (10, 13), (11, 13)]
    edges = k5 + wings + [(10, 11)]
    gnx = nx.Graph(edges)
    expected = _nx_truss_numbers(gnx)
    assert expected[(10, 11)] == 3  # ground truth of the construction
    g = Graph.from_edge_list(spark, edges, vertices=sorted(gnx.nodes()))
    res = truss_decomposition(g, local_finish_edges=12)
    assert any(m.get("mode") == "local_finish" for m in res.metrics)
    assert _decomp_map(res) == expected
    # and the distributed continuation agrees
    assert _decomp_map(truss_decomposition(g, local_finish_edges=0)) == expected


def test_truss_decomposition_gate_sweep(spark):
    # The local-finish gate can fire at ANY point of the peel depending
    # on local_finish_edges; every cutover must land on the same
    # networkx ground truth.  Sweeps the gate across the peel depth on
    # two random graphs (the mid-cascade regression above pins the
    # known-bad construction; this pins the class).
    for seed in (13, 21):
        gnx = nx.gnm_random_graph(60, 320, seed=seed)
        expected = _nx_truss_numbers(gnx)
        g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(60))
        for gate in (100, 200, 300):
            res = truss_decomposition(g, local_finish_edges=gate)
            assert _decomp_map(res) == expected, (seed, gate)


def test_truss_decomposition_triangle_free(spark):
    # no triangles: every edge has truss 2
    path = [(i, i + 1) for i in range(10)]
    g = Graph.from_edge_list(spark, path, vertices=range(11))
    res = truss_decomposition(g)
    assert set(_decomp_map(res).values()) == {2}
    assert res.max_truss == 2


def test_k_truss_multi_matches_separate_runs(spark):
    gnx = nx.gnm_random_graph(80, 400, seed=13)
    g = Graph.from_edge_list(spark, list(gnx.edges()), vertices=range(80))
    multi = k_truss_multi(g, [5, 4, 3])  # unsorted input: sorted internally
    for k in (3, 4, 5):
        assert _edge_set(multi[k]) == {
            tuple(sorted(e)) for e in nx.k_truss(gnx, k).edges()
        }
    # an empty truss short-circuits the chain and stays empty
    big = k_truss_multi(g, [3, 50])
    assert big[50].edge_count == 0 and big[50].edges.count() == 0
