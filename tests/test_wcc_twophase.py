"""Two-phase (large-star/small-star) WCC — parity with the min-label
operator, networkx cross-check, and the O(log n)-rounds property that
motivates it (a path graph converges in ~log2 rounds, where min-label
needs one superstep per hop)."""

import networkx as nx
import pytest

from neo4j_graph_algorithms_spark import Graph
from neo4j_graph_algorithms_spark import fixtures as FX
from neo4j_graph_algorithms_spark.operators import wcc, wcc_two_phase


@pytest.fixture(scope="module")
def f3_graph(spark):
    return Graph.from_edge_list(
        spark,
        FX.named_edges_to_ids(FX.WCC_EDGES, FX.WCC_IDS),
        vertices=FX.WCC_IDS.values(),
    )


def test_two_phase_matches_min_label_fixture(spark, f3_graph):
    a = {r["id"]: r["set_id"] for r in wcc(f3_graph).components.collect()}
    b = {
        r["id"]: r["set_id"]
        for r in wcc_two_phase(f3_graph).components.collect()
    }
    assert a == b  # identical min-member-id partitions


def test_two_phase_random_graph_vs_networkx(spark):
    gnx = nx.gnm_random_graph(300, 420, seed=7)
    edges = [(u, v) for u, v in gnx.edges()]
    g = Graph.from_edge_list(spark, edges, vertices=range(300))
    got = {
        r["id"]: r["set_id"]
        for r in wcc_two_phase(g).components.collect()
    }
    for comp in nx.connected_components(gnx):
        m = min(comp)
        for v in comp:
            assert got[v] == m
    assert len(got) == 300  # isolated vertices map to themselves


def test_two_phase_path_graph_logarithmic_rounds(spark):
    # 1025-node path: min-label would need 1024 supersteps; star
    # contraction must land in O(log n) — generous cap at 20.
    n = 1025
    g = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(n - 1)], vertices=range(n)
    )
    res = wcc_two_phase(g)
    assert res.iterations_ran <= 20
    comps = res.components.select("set_id").distinct().collect()
    assert [r["set_id"] for r in comps] == [0]


def test_two_phase_threshold_semantics(spark):
    # weight >= threshold kept (GraphUnionFind.java:89-93 semantics,
    # same contract as wcc())
    edges = [(0, 1, 5.0), (1, 2, 1.0), (3, 4, 5.0)]
    g = Graph.from_edge_list(spark, edges, vertices=range(5))
    got = {
        r["id"]: r["set_id"]
        for r in wcc_two_phase(g, threshold=3.0).components.collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3}


def test_two_phase_round_plan_uses_shuffled_hash_join(spark):
    # plan-shape guard: the star-contraction round joins must stay
    # ShuffledHashJoin (the SHUFFLE_HASH hints) — an SMJ fallback would
    # re-sort the full edge set every round at scale.
    from pyspark.sql import functions as F

    e = spark.range(100).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % 100).alias("v")
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    lmins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    large = (
        sym.join(lmins.hint("SHUFFLE_HASH"), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    plan = large._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
