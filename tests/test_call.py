"""`call()` — runnable CALL algo.* dispatch (reference migration path).

A reference user's `CALL algo.pageRank.stream('L','T', {iterations:20,
dampingFactor:0.85, concurrency:4})` must run here as
`call("algo.pageRank.stream", graph, iterations=20, dampingFactor=0.85,
concurrency=4)` and produce the engine's own pagerank() result.
"""

import pytest
from pyspark.sql import DataFrame

from neo4j_graph_algorithms_spark import Graph, call, pagerank, wcc


@pytest.fixture(scope="module")
def g(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 2.0), (3, 4, 0.5), (5, 6, 1.0)],
        "src long, dst long, weight double",
    )
    return Graph.from_edges(edges)


def test_stream_matches_direct_pagerank(g):
    got = call("algo.pageRank.stream", g,
               iterations=7, dampingFactor=0.9, concurrency=4)
    assert isinstance(got, DataFrame)
    want = pagerank(g, damping=0.9, max_iterations=7).scores
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_write_mode_returns_result_with_stats(g):
    res = call("algo.unionFind", g, threshold=0.9,
               write=True, partitionProperty="partition")
    want = wcc(g, threshold=0.9)
    assert sorted(map(tuple, res.components.collect())) == \
        sorted(map(tuple, want.components.collect()))
    assert res.stats().columns == want.stats().columns


def test_weight_property_selects_weighted_mode(g):
    got = call("algo.pageRank.stream", g, iterations=5, weightProperty="weight")
    want = pagerank(g, max_iterations=5, weighted=True).scores
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_graph_method_proc(g):
    got = call("algo.degree.stream", g)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, g.out_degrees().collect()))


def test_shortest_path_stream_yields_nodes(g):
    rows = call("algo.shortestPath.stream", g,
                startNode=1, endNode=4).collect()
    assert [r["node_id"] for r in sorted(rows, key=lambda r: r["step"])] == [1, 2, 3, 4]


def test_unknown_config_key_raises(g):
    with pytest.raises(ValueError, match="unsupported config key"):
        call("algo.pageRank.stream", g, iterations=3, bogusKnob=1)


def test_unknown_name_suggests(g):
    with pytest.raises(KeyError, match="did you mean"):
        call("algo.pagerank", g)


def test_function_kind_points_at_column_fn(g):
    with pytest.raises(TypeError, match="scalar column function"):
        call("algo.isFinite", g)


def test_call_gds_config_names_fastrp(spark, g):
    from neo4j_graph_algorithms_spark.functions import call
    from neo4j_graph_algorithms_spark.operators import fastrp

    via_call = call(
        "algo.fastRP",
        g,
        embeddingDimension=4,
        iterationWeights=(1.0,),
        randomSeed=7,
    )
    direct = fastrp(
        g, embedding_dim=4, iteration_weights=(1.0,), seed=7
    )
    a = {r["id"]: tuple(r[f"e{j}"] for j in range(4))
         for r in via_call.embeddings.collect()}
    b = {r["id"]: tuple(r[f"e{j}"] for j in range(4))
         for r in direct.embeddings.collect()}
    assert a == b


def test_call_algo_list_returns_catalog(g):
    df = call("algo.list", g)
    names = {r["name"] for r in df.collect()}
    assert "algo.list" in names and "algo.pageRank" in names
    filtered = call("algo.list", g, query="unionFind")
    assert all("unionFind" in r["name"] for r in filtered.collect())
