"""Property-based tests (hypothesis): random small graphs, engine vs
networkx — the distributed analogue of the reference's
RandomGraphTestCase.  Few, fat examples: each example pays a Spark
superstep loop, so the strategy space is kept tight while still
covering disconnected graphs, self-loop-free multigraphs, stars,
chains, and cliques the named fixtures would miss.
"""

import pytest

networkx = pytest.importorskip("networkx")
hypothesis = pytest.importorskip("hypothesis")

import networkx as nx  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from neo4j_graph_algorithms_spark import Graph, pagerank, wcc  # noqa: E402
from neo4j_graph_algorithms_spark.operators import shortest_paths  # noqa: E402

N_VERTS = 12

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_VERTS - 1),
        st.integers(min_value=0, max_value=N_VERTS - 1),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=24,
    unique=True,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_strategy)
@SETTINGS
def test_wcc_partition_matches_networkx(spark, edges):
    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    comp = {r["id"]: r["set_id"] for r in wcc(g).components.collect()}
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    for cc in nx.connected_components(G):
        ids = {comp[v] for v in cc}
        assert len(ids) == 1, (edges, cc)
        assert ids == {min(cc)}, (edges, cc)  # set id = min member


@given(edges=edge_strategy)
@SETTINGS
def test_pagerank_matches_reference_formula(spark, edges):
    """Engine vs a direct python evaluation of the reference's
    non-normalized delta-push recurrence (same float64 ops)."""
    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    iters = 5
    got = {
        r["id"]: r["score"]
        for r in pagerank(g, max_iterations=iters).scores.collect()
    }
    out = {v: [] for v in range(N_VERTS)}
    for s, t in edges:
        out[s].append(t)
    rank = {v: 0.15 for v in range(N_VERTS)}
    delta = dict(rank)
    for _ in range(iters):
        recv = {v: 0.0 for v in range(N_VERTS)}
        for s in range(N_VERTS):
            if delta[s] != 0.0 and out[s]:
                c = delta[s] / len(out[s])
                for t in out[s]:
                    recv[t] += c
        for v in range(N_VERTS):
            inc = 0.85 * recv[v]
            rank[v] += inc
            delta[v] = inc
    for v in range(N_VERTS):
        assert got[v] == pytest.approx(rank[v], abs=1e-9), (edges, v)


@given(edges=edge_strategy, data=st.data())
@SETTINGS
def test_sssp_matches_dijkstra_random(spark, edges, data):
    weights = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=9),
            min_size=len(edges),
            max_size=len(edges),
        )
    )
    wedges = [(s, t, float(w)) for (s, t), w in zip(edges, weights)]
    g = Graph.from_edge_list(spark, wedges, vertices=range(N_VERTS))
    got = {
        r["id"]: r["distance"]
        for r in shortest_paths(g, 0).distances.collect()
    }
    G = nx.DiGraph()
    G.add_nodes_from(range(N_VERTS))
    for s, t, w in wedges:
        # parallel edges collapse to min weight, like the engine's relax
        if G.has_edge(s, t):
            G[s][t]["weight"] = min(G[s][t]["weight"], w)
        else:
            G.add_edge(s, t, weight=w)
    want = nx.single_source_dijkstra_path_length(G, 0)
    for v in range(N_VERTS):
        if v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (wedges, v)
        else:
            assert got[v] == float("inf"), (wedges, v)


@given(edges=edge_strategy)
@SETTINGS
def test_triangle_count_matches_networkx(spark, edges):
    from neo4j_graph_algorithms_spark import Graph, triangle_count

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    res = triangle_count(g)
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    want = nx.triangles(G)
    got = {r["id"]: r["triangles"] for r in res.per_node.collect()}
    assert got == want, edges
    assert res.triangle_count == sum(want.values()) // 3


@given(edges=edge_strategy)
@SETTINGS
def test_core_numbers_match_networkx_random(spark, edges):
    from neo4j_graph_algorithms_spark import Graph
    from neo4j_graph_algorithms_spark.operators import core_numbers

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    got = {r["id"]: r["core"] for r in core_numbers(g).core.collect()}
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    assert got == nx.core_number(G), edges


def test_louvain_multilevel_deterministic_across_parallelism(spark):
    """Multi-level Louvain must produce identical assignments no matter
    the shuffle-partition count — determinism is what makes the
    unrolled SQL oracle possible, and any partition-order sensitivity
    (argmax ties, md5 schedule) would break here first."""
    from neo4j_graph_algorithms_spark.operators.louvain import louvain

    G = nx.gnm_random_graph(120, 300, seed=7)
    g = Graph.from_edge_list(spark, list(G.edges()), vertices=G.nodes).undirected()
    prev = None
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_part in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            res = louvain(g, max_iterations=8, levels=2, check_interval=4)
            got = {r["id"]: r["community"] for r in res.communities.collect()}
            if prev is not None:
                assert got == prev
            prev = got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


@given(edges=edge_strategy)
@SETTINGS
def test_eigenvector_matches_power_iteration_random(spark, edges):
    """Engine vs a direct python evaluation of the documented
    batched-normalization power iteration (operators/eigenvector.py)."""
    from neo4j_graph_algorithms_spark import eigenvector_centrality

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    iters, interval = 6, 3
    got = {
        r["id"]: r["score"]
        for r in eigenvector_centrality(
            g, max_iterations=iters, check_interval=interval
        ).scores.collect()
    }
    x = {v: 1.0 for v in range(N_VERTS)}
    for k in range(1, iters + 1):
        y = {v: 0.0 for v in range(N_VERTS)}
        for s, t in edges:
            y[t] += x[s]
        if k % interval == 0 or k == iters:
            nrm = sum(s * s for s in y.values()) ** 0.5
            y = {v: (s / nrm if nrm > 0 else 0.0) for v, s in y.items()}
        x = y
    for v in range(N_VERTS):
        assert got[v] == pytest.approx(x[v], abs=1e-9), (edges, v)


@given(edges=edge_strategy)
@SETTINGS
def test_article_rank_matches_recurrence_random(spark, edges):
    """Engine vs a direct python evaluation of the documented
    ArticleRank recurrence (push divisor outdeg + avg_outdeg)."""
    from neo4j_graph_algorithms_spark import article_rank

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    iters = 5
    got = {
        r["id"]: r["score"]
        for r in article_rank(g, max_iterations=iters).scores.collect()
    }
    out = {v: [] for v in range(N_VERTS)}
    for s, t in edges:
        out[s].append(t)
    srcs = [v for v in range(N_VERTS) if out[v]]
    off = sum(len(out[v]) for v in srcs) / len(srcs)
    rank = {v: 0.15 for v in range(N_VERTS)}
    delta = dict(rank)
    for _ in range(iters):
        recv = {v: 0.0 for v in range(N_VERTS)}
        for s in srcs:
            if delta[s] != 0.0:
                c = delta[s] / (len(out[s]) + off)
                for t in out[s]:
                    recv[t] += c
        for v in range(N_VERTS):
            inc = 0.85 * recv[v]
            rank[v] += inc
            delta[v] = inc
    for v in range(N_VERTS):
        assert got[v] == pytest.approx(rank[v], abs=1e-9), (edges, v)


@given(edges=edge_strategy)
@SETTINGS
def test_two_phase_wcc_matches_networkx(spark, edges):
    from neo4j_graph_algorithms_spark.operators import wcc_two_phase

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    comp = {r["id"]: r["set_id"] for r in wcc_two_phase(g).components.collect()}
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    for cc in nx.connected_components(G):
        assert {comp[v] for v in cc} == {min(cc)}, (edges, cc)


@given(edges=edge_strategy)
@SETTINGS
def test_k1coloring_proper_random(spark, edges):
    from neo4j_graph_algorithms_spark.operators import k1coloring

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    res = k1coloring(g, compute_color_count=True)
    colors = {r["id"]: r["color"] for r in res.colors.collect()}
    assert set(colors) == set(range(N_VERTS))
    assert all(c is not None for c in colors.values())
    for u, v in edges:
        assert colors[u] != colors[v], (edges, u, v)
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    assert res.color_count <= max(d for _, d in G.degree()) + 1, edges


@given(edges=edge_strategy)
@SETTINGS
def test_mis_independent_and_maximal_random(spark, edges):
    from neo4j_graph_algorithms_spark.operators import maximal_independent_set

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    got = {r["id"]: r["in_set"]
           for r in maximal_independent_set(g).members.collect()}
    assert set(got) == set(range(N_VERTS))
    assert all(v is not None for v in got.values())
    S = {v for v, m in got.items() if m}
    nbrs = {v: set() for v in range(N_VERTS)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    for u, v in edges:
        assert not (u in S and v in S), (edges, u, v)
    for v in range(N_VERTS):
        if v not in S:
            assert nbrs[v] & S, (edges, v)


@given(
    edges=edge_strategy,
    k=st.integers(min_value=3, max_value=5),
)
@SETTINGS
def test_k_truss_matches_networkx(spark, edges, k):
    from neo4j_graph_algorithms_spark.operators import k_truss

    g = Graph.from_edge_list(spark, edges, vertices=range(N_VERTS))
    got = {
        tuple(sorted((r["src"], r["dst"])))
        for r in k_truss(g, k).edges.collect()
    }
    G = nx.Graph()
    G.add_nodes_from(range(N_VERTS))
    G.add_edges_from(edges)
    want = {tuple(sorted(e)) for e in nx.k_truss(G, k).edges()}
    assert got == want, (edges, k)


# --- text-pipeline properties: random tiny corpora, engine vs plain python ---

word_strategy = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_strategy = st.lists(word_strategy, min_size=0, max_size=12).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


@given(texts=corpus_strategy)
@SETTINGS
def test_lm_perplexity_matches_brute_force(spark, texts):
    import math

    from neo4j_graph_algorithms_spark.functions import textstats as ts

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in ts.lm_perplexity(df).collect()}
    toks = {i: t.split() for i, t in enumerate(texts)}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for p in zip(t, t[1:]):
            big[p] = big.get(p, 0) + 1
    V = len(uni)
    expect_ids = {i for i, t in toks.items() if len(t) >= 2}
    assert set(got) == expect_ids, texts
    for i in expect_ids:
        bs = list(zip(toks[i], toks[i][1:]))
        h = -sum(math.log((big[p] + 1.0) / (uni[p[0]] + V)) for p in bs) / len(bs)
        assert got[i]["n_bigrams"] == len(bs)
        assert abs(got[i]["cross_entropy"] - h) < 1e-6, (texts, i)


@given(texts=corpus_strategy)
@SETTINGS
def test_repetition_stats_matches_brute_force(spark, texts):
    from collections import Counter

    from neo4j_graph_algorithms_spark.functions import textstats as ts

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in ts.repetition_stats(df).collect()}
    toks = {i: t.split() for i, t in enumerate(texts)}
    assert set(got) == {i for i, t in toks.items() if len(t) >= 2}, texts
    for i, r in got.items():
        for n in (2, 3, 4):
            grams = [" ".join(toks[i][j:j + n]) for j in range(len(toks[i]) - n + 1)]
            top = r[f"top{n}gram_frac"]
            dup = r[f"dup{n}gram_frac"]
            if not grams:
                assert top is None and dup is None, (texts, i, n)
                continue
            c = Counter(grams)
            tot = sum(c.values())
            assert abs(top - max(c.values()) / tot) < 1e-6, (texts, i, n)
            assert abs(dup - sum(v for v in c.values() if v > 1) / tot) < 1e-6


@given(texts=corpus_strategy, budget=st.integers(min_value=1, max_value=20))
@SETTINGS
def test_pack_sequences_stream_reconstruction(spark, texts, budget):
    from neo4j_graph_algorithms_spark.functions import sampling as smp

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = smp.pack_sequences(df, budget=budget, n_shards=3).collect()
    assert len(rows) == len(texts)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        # (seq, offset) admits ties only between zero-token docs and the
        # one advancing doc at that offset — sorting the zero-token docs
        # first reconstructs a valid stream regardless of engine order
        rs = sorted(
            rs, key=lambda r: (r["seq"], r["tok_offset"], r["n_tokens"], r["doc_id"])
        )
        stream = 0
        for r in rs:
            assert r["seq"] == stream // budget, (texts, budget)
            assert r["tok_offset"] == stream % budget
            stream += r["n_tokens"]
