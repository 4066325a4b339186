"""Walk-based subgraph sampling: determinism, seed containment,
induced-edge correctness."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark.operators import random_walks, sample_subgraph


def _graph(spark):
    # two near-cliques joined by one bridge + an unreachable pair
    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    bridge = [(4, 10)]
    far = [(20, 21)]
    return Graph.from_edge_list(
        spark, c1 + c2 + bridge + far, vertices=list(range(15)) + [20, 21]
    )


def test_sample_contains_seeds_and_only_induced_edges(spark):
    g = _graph(spark)
    seeds = spark.createDataFrame([(0,)], "id long")
    sub = sample_subgraph(g, seeds, walk_length=4, walks_per_node=2)
    vs = {r["id"] for r in sub.vertices.collect()}
    assert 0 in vs                      # seed always present
    assert not vs & {20, 21}           # unreachable pair never sampled
    edges = {(r["src"], r["dst"]) for r in sub.edges.select("src", "dst").collect()}
    full = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    assert edges <= full
    for s, d in edges:                 # strictly induced
        assert s in vs and d in vs


def test_sample_is_deterministic(spark):
    g = _graph(spark)
    seeds = spark.createDataFrame([(0,), (12,)], "id long")
    a = {(r["src"], r["dst"])
         for r in sample_subgraph(g, seeds, walk_length=5).edges.collect()}
    b = {(r["src"], r["dst"])
         for r in sample_subgraph(g, seeds, walk_length=5).edges.collect()}
    assert a == b and len(a) > 0


def test_seeded_walks_start_only_at_seeds(spark):
    g = _graph(spark)
    seeds = spark.createDataFrame([(12,)], "id long")
    res = random_walks(g, walk_length=3, walks_per_node=2, start_vertices=seeds)
    starts = {r["vertex"] for r in res.steps.filter(F.col("step") == 0).collect()}
    assert starts == {12}
