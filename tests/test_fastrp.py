"""FastRP embeddings — pure-python bit-for-bit replay of the md5 init
and the propagation arithmetic, plus structural sanity (isomorphic
neighborhoods → identical embeddings; clusters separate in cosine)."""

import hashlib
import math

import numpy as np
import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import fastrp


def _init_py(node, j, d, seed=0):
    h = int(hashlib.md5(f"{seed}:{j}:{node}".encode()).hexdigest()[:15], 16)
    v = math.sqrt(3.0) / math.sqrt(d)
    b = h % 6
    return v if b == 0 else (-v if b == 1 else 0.0)


def _fastrp_py(nodes, undirected_edges, d, weights, seed=0):
    nbrs = {n: [] for n in nodes}
    for a, b in undirected_edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    x = {n: np.array([_init_py(n, j, d, seed) for j in range(d)]) for n in nodes}
    emb = {n: np.zeros(d) for n in nodes}
    for w in weights:
        g = {}
        for n in nodes:
            g[n] = (
                np.mean([x[m] for m in nbrs[n]], axis=0)
                if nbrs[n]
                else np.zeros(d)
            )
        for n in nodes:
            nrm = np.sqrt((g[n] ** 2).sum())
            xn = g[n] / nrm if nrm > 0 else np.zeros(d)
            x[n] = xn
            emb[n] = emb[n] + w * xn
    return emb


def test_fastrp_matches_python_replay(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (5, 6)]
    nodes = range(8)  # 7 isolated
    g = Graph.from_edge_list(spark, edges, vertices=nodes)
    d, weights = 4, (0.5, 1.0, 1.0)
    res = fastrp(g, embedding_dim=d, iteration_weights=weights)
    got = {
        r["id"]: np.array([r[f"e{j}"] for j in range(d)])
        for r in res.embeddings.collect()
    }
    want = _fastrp_py(list(nodes), edges, d, weights)
    assert res.iterations_ran == 3
    for n in nodes:
        np.testing.assert_allclose(got[n], want[n], atol=1e-12)


def test_fastrp_symmetric_nodes_equal_up_to_init(spark):
    # a 4-cycle: every node has the same degree-2 neighborhood shape;
    # after ONE mean+normalize round with equal weights, nodes with the
    # same neighbor multiset get the same embedding.  0 and 2 share
    # neighbors {1, 3} exactly.
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0)], vertices=range(4)
    )
    res = fastrp(g, embedding_dim=8, iteration_weights=(1.0,))
    got = {
        r["id"]: tuple(round(r[f"e{j}"], 12) for j in range(8))
        for r in res.embeddings.collect()
    }
    assert got[0] == got[2]
    assert got[1] == got[3]


def test_fastrp_clusters_separate_in_cosine(spark):
    # two disjoint near-cliques: intra-cluster cosine must exceed
    # inter-cluster cosine on average.
    import itertools

    c1 = list(itertools.combinations(range(6), 2))
    c2 = list(itertools.combinations(range(6, 12), 2))
    g = Graph.from_edge_list(spark, c1 + c2, vertices=range(12))
    res = fastrp(g, embedding_dim=16, iteration_weights=(0.0, 1.0, 1.0))
    emb = {
        r["id"]: np.array([r[f"e{j}"] for j in range(16)])
        for r in res.embeddings.collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    intra = np.mean([cos(emb[a], emb[b]) for a, b in c1])
    inter = np.mean(
        [cos(emb[a], emb[b]) for a in range(6) for b in range(6, 12)]
    )
    assert intra > inter + 0.5


def test_fastrp_as_array_shape(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], vertices=range(2))
    arr = fastrp(g, embedding_dim=4, iteration_weights=(1.0,)).as_array()
    row = arr.collect()[0]
    assert len(row["embedding"]) == 4


def test_fastrp_weighted_matches_python_replay(spark):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 4.0), (2, 3, 0.5)]
    g = Graph.from_edge_list(spark, edges, vertices=range(4))
    d, weights = 4, (1.0, 1.0)
    res = fastrp(g, embedding_dim=d, iteration_weights=weights, weighted=True)
    got = {
        r["id"]: np.array([r[f"e{j}"] for j in range(d)])
        for r in res.embeddings.collect()
    }
    # python twin with weighted means over the symmetrized edge set
    wnbrs = {n: [] for n in range(4)}
    for a, b, w in edges:
        wnbrs[a].append((b, w))
        wnbrs[b].append((a, w))
    x = {n: np.array([_init_py(n, j, d) for j in range(d)]) for n in range(4)}
    emb = {n: np.zeros(d) for n in range(4)}
    for w_l in weights:
        g_ = {}
        for n in range(4):
            tw = sum(w for _, w in wnbrs[n])
            g_[n] = (
                sum(w * x[m] for m, w in wnbrs[n]) / tw
                if tw
                else np.zeros(d)
            )
        for n in range(4):
            nrm = np.sqrt((g_[n] ** 2).sum())
            xn = g_[n] / nrm if nrm > 0 else np.zeros(d)
            x[n] = xn
            emb[n] = emb[n] + w_l * xn
    for n in range(4):
        np.testing.assert_allclose(got[n], emb[n], atol=1e-12)
