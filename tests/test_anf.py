"""ANF — deterministic FM-sketch neighborhood function.

The sketches are md5-derived (no RNG), so a pure-python replay of the
same bit arithmetic must reproduce every estimate exactly; accuracy
tests then check the estimator against true reachable-set sizes.
"""

import hashlib

import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import neighborhood_function

PHI = 0.77351


def _tz(x: int) -> int:
    # trailing zeros, matching bit_count((h & -h) - 1)
    return ((x & -x) - 1).bit_count() if x else 64


def _replay(edge_list, k, seed, max_d):
    nb = {}
    for s, d in edge_list:
        nb.setdefault(s, set()).add(d)
        nb.setdefault(d, set()).add(s)
    masks = {}
    for v in nb:
        ms = []
        for r in range(k):
            h = int(
                hashlib.md5(f"{seed}:{r}:{v}".encode()).hexdigest()[:15], 16
            )
            ms.append(1 << min(_tz(h), 62))
        masks[v] = ms
    for _ in range(max_d):
        nxt = {}
        for v in nb:
            ms = list(masks[v])
            for u in nb[v]:
                for r in range(k):
                    ms[r] |= masks[u][r]
            nxt[v] = ms
        if nxt == masks:
            break
        masks = nxt
    est = {}
    for v, ms in masks.items():
        mean_b = sum(_tz(~m & ((1 << 64) - 1)) for m in ms) / k
        est[v] = 2.0 ** mean_b / PHI
    return est


def test_estimates_match_pure_python_replay(spark):
    edge_list = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12)]
    g = Graph.from_edges(spark.createDataFrame(edge_list, "src long, dst long"))
    res = neighborhood_function(g, max_distance=10, replicas=8, seed=0)
    got = {r["id"]: r["reachable_estimate"] for r in res.per_vertex.collect()}
    want = _replay(edge_list, k=8, seed=0, max_d=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    assert res.converged
    # a 5-chain's diameter is 4; the 3-chain component converges earlier
    assert res.distances_ran == 4


def test_estimates_track_component_sizes(spark):
    # clique of 40 vs clique of 5: per-vertex reachable sets are 40 and
    # 5; with k=16 replicas the FM estimates must separate them clearly
    edges = [(i, j) for i in range(40) for j in range(i + 1, 40)] + [
        (100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)
    ]
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))
    res = neighborhood_function(g, max_distance=4, replicas=16, seed=1)
    est = {r["id"]: r["reachable_estimate"] for r in res.per_vertex.collect()}
    big = sum(est[v] for v in range(40)) / 40
    small = sum(est[100 + v] for v in range(5)) / 5
    assert big > 2.5 * small


def test_effective_diameter_on_path(spark):
    n = 30
    g = Graph.from_edges(
        spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
    )
    res = neighborhood_function(g, max_distance=40, replicas=16, seed=2)
    assert res.converged
    assert res.distances_ran == n  # path diameter
    d_eff = res.effective_diameter(0.9)
    # 90%-effective diameter of a path is below the full diameter but
    # well above half of it
    assert 0.4 * n < d_eff <= n
    # NF is monotone nondecreasing
    vals = [row["nf_estimate"] for row in res.nf]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
