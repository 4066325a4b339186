"""Resume-from-checkpoint: kill after superstep k, resume, identical result."""

import pytest

from neo4j_graph_algorithms_spark import Graph, pagerank, wcc
from neo4j_graph_algorithms_spark import fixtures as FX
from neo4j_graph_algorithms_spark.plans import SuperstepCheckpointer


@pytest.fixture()
def f1_graph(spark):
    return Graph.from_edge_list(
        spark,
        FX.named_edges_to_ids(FX.PAGERANK_EDGES, FX.PAGERANK_IDS),
        vertices=FX.PAGERANK_IDS.values(),
    )


def test_pagerank_resume_matches_direct(spark, f1_graph, tmp_path):
    direct = {
        r["id"]: r["score"]
        for r in pagerank(f1_graph, max_iterations=10).scores.collect()
    }

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "pagerank", run_id="r1")
    partial = pagerank(f1_graph, max_iterations=4, checkpointer=ckpt)
    assert partial.iterations_ran == 4
    assert ckpt.latest_iteration() == 4

    # "crashed" after superstep 4; a new run resumes and finishes to 10
    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "pagerank", run_id="r1")
    resumed = pagerank(f1_graph, max_iterations=10, checkpointer=ckpt2)
    assert resumed.iterations_ran == 10
    got = {r["id"]: r["score"] for r in resumed.scores.collect()}
    for k in direct:
        assert got[k] == pytest.approx(direct[k], abs=1e-9)


def test_metrics_recorded_per_superstep(spark, f1_graph, tmp_path):
    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "pagerank", run_id="m1")
    pagerank(f1_graph, max_iterations=3, checkpointer=ckpt)
    rows = ckpt.metrics()
    assert [r["iteration"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert "max_delta" in r and "active_vertices" in r and "write_ms" in r
        # per-partition lineage record: parquet part sizes per saved state
        ps = r["partition_stats"]["state"]
        assert ps["partitions"] >= 1 and ps["bytes_total"] > 0
        assert ps["bytes_skew"] >= 1.0


def test_wcc_resume(spark, tmp_path):
    vertices, edges = FX.wcc_lines_fixture(sets=2, set_size=8)
    g = Graph.from_edge_list(spark, edges, vertices=vertices)
    direct = {r["id"]: r["set_id"] for r in wcc(g).components.collect()}

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "wcc", run_id="w1")
    wcc(g, max_iterations=2, checkpointer=ckpt)
    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "wcc", run_id="w1")
    resumed = wcc(g, checkpointer=ckpt2)
    got = {r["id"]: r["set_id"] for r in resumed.components.collect()}
    assert got == direct


def test_checkpoint_gc_keeps_last(spark, f1_graph, tmp_path):
    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "pagerank", run_id="g1", keep_last=2)
    pagerank(f1_graph, max_iterations=5, checkpointer=ckpt)
    import os

    iters = sorted(
        n for n in os.listdir(ckpt.root) if n.startswith("iter=")
    )
    assert iters == ["iter=00004", "iter=00005"]


def test_labelprop_resume(spark, tmp_path):
    from neo4j_graph_algorithms_spark import label_propagation

    vertices = spark.createDataFrame(
        FX.LP_VERTICES, "id long, cls string, partition long, weight double"
    )
    edges = spark.createDataFrame(
        [(s, t, 1.0) for s, t in FX.LP_EDGES], "src long, dst long, weight double"
    )
    g = Graph(edges, vertices=vertices)
    direct = {
        r["id"]: r["label"]
        for r in label_propagation(g, max_iterations=4).labels.collect()
    }
    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "lp", run_id="l1")
    label_propagation(g, max_iterations=2, checkpointer=ckpt)
    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "lp", run_id="l1")
    resumed = label_propagation(g, max_iterations=4, checkpointer=ckpt2)
    got = {r["id"]: r["label"] for r in resumed.labels.collect()}
    assert got == direct


def test_k1coloring_resume_matches_direct(spark, tmp_path):
    import networkx as nx

    from neo4j_graph_algorithms_spark.operators import k1coloring

    G = nx.gnm_random_graph(60, 180, seed=5)
    g = Graph.from_edge_list(spark, list(G.edges()), vertices=range(60))
    direct = {r["id"]: r["color"] for r in k1coloring(g).colors.collect()}

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "k1c", run_id="c1")
    k1coloring(g, max_iterations=1, checkpointer=ckpt)
    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "k1c", run_id="c1")
    resumed = k1coloring(g, checkpointer=ckpt2)
    got = {r["id"]: r["color"] for r in resumed.colors.collect()}
    assert got == direct


def test_topological_levels_resume_matches_direct(spark, tmp_path):
    import networkx as nx

    from neo4j_graph_algorithms_spark.operators import topological_levels

    G = nx.gnm_random_graph(60, 180, seed=6, directed=True)
    dag = [(u, v) for u, v in G.edges() if u < v]
    g = Graph.from_edge_list(spark, dag, vertices=range(60))
    direct = {r["id"]: r["level"] for r in topological_levels(g).levels.collect()}

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "topo", run_id="t1")
    try:
        topological_levels(g, max_iterations=2, checkpointer=ckpt)
    except ValueError:
        pass  # not yet stabilized at the stop point — expected
    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "topo", run_id="t1")
    resumed = topological_levels(g, checkpointer=ckpt2)
    got = {r["id"]: r["level"] for r in resumed.levels.collect()}
    assert got == direct


def test_eigenvector_resume_matches_direct(spark, tmp_path):
    from neo4j_graph_algorithms_spark import eigenvector_centrality

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (2, 3)]
    g = Graph.from_edge_list(spark, edges, vertices=range(4))
    # durable mode forces check_interval=1, so compare against a direct
    # run at the same normalization schedule
    direct = {
        r["id"]: r["score"]
        for r in eigenvector_centrality(
            g, max_iterations=8, check_interval=1
        ).scores.collect()
    }

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "eigenvector", run_id="e1")
    partial = eigenvector_centrality(g, max_iterations=4, checkpointer=ckpt)
    assert partial.iterations_ran == 4
    assert ckpt.latest_iteration() == 4

    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "eigenvector", run_id="e1")
    resumed = eigenvector_centrality(g, max_iterations=8, checkpointer=ckpt2)
    assert resumed.iterations_ran == 8
    got = {r["id"]: r["score"] for r in resumed.scores.collect()}
    for k in direct:
        assert got[k] == pytest.approx(direct[k], abs=1e-12)


def test_hits_resume_matches_direct(spark, tmp_path):
    from neo4j_graph_algorithms_spark.operators import hits

    edges = [(0, 10), (0, 11), (1, 10), (2, 11), (2, 12), (1, 12)]
    g = Graph.from_edge_list(spark, edges)
    direct = {
        r["id"]: (r["hub"], r["authority"])
        for r in hits(g, max_iterations=6, check_interval=1).scores.collect()
    }

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "hits", run_id="h1")
    partial = hits(g, max_iterations=3, checkpointer=ckpt)
    assert partial.iterations_ran == 3
    assert ckpt.latest_iteration() == 3

    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "hits", run_id="h1")
    resumed = hits(g, max_iterations=6, checkpointer=ckpt2)
    assert resumed.iterations_ran == 6
    got = {
        r["id"]: (r["hub"], r["authority"]) for r in resumed.scores.collect()
    }
    for k in direct:
        assert got[k][0] == pytest.approx(direct[k][0], abs=1e-12)
        assert got[k][1] == pytest.approx(direct[k][1], abs=1e-12)


def test_article_rank_resume_matches_direct(spark, tmp_path):
    from neo4j_graph_algorithms_spark import article_rank

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (2, 3)]
    g = Graph.from_edge_list(spark, edges, vertices=range(4))
    direct = {
        r["id"]: r["score"]
        for r in article_rank(g, max_iterations=8).scores.collect()
    }

    ckpt = SuperstepCheckpointer(spark, str(tmp_path), "articlerank", run_id="a1")
    partial = article_rank(g, max_iterations=4, checkpointer=ckpt)
    assert partial.iterations_ran == 4

    ckpt2 = SuperstepCheckpointer(spark, str(tmp_path), "articlerank", run_id="a1")
    resumed = article_rank(g, max_iterations=8, checkpointer=ckpt2)
    assert resumed.iterations_ran == 8
    got = {r["id"]: r["score"] for r in resumed.scores.collect()}
    for k in direct:
        assert got[k] == pytest.approx(direct[k], abs=1e-12)


def test_checkpoint_storage_level_knob(monkeypatch):
    """Serialized checkpoint storage is the default (BENCH/BASELINE.md:
    5.2x less GC, 5x denser cache, bit-identical results); the env knob
    restores the per-row-object level or picks any StorageLevel."""
    from pyspark.storagelevel import StorageLevel

    from neo4j_graph_algorithms_spark.plans.checkpoint import (
        _checkpoint_storage_level,
    )

    monkeypatch.delenv("SPARK_GRAFT_CKPT_STORAGE", raising=False)
    lvl = _checkpoint_storage_level()
    assert lvl == StorageLevel.MEMORY_AND_DISK
    assert not lvl.deserialized  # PySpark-4 MEMORY_AND_DISK is serialized

    for name in ("deser", "default", "memory_and_disk_deser"):
        monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", name)
        assert _checkpoint_storage_level() is None  # Spark's implicit level

    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "memory_only")
    assert _checkpoint_storage_level() == StorageLevel.MEMORY_ONLY


def test_serialized_checkpoint_scores_bit_identical(spark, f1_graph, monkeypatch):
    from neo4j_graph_algorithms_spark import pagerank

    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "deser")
    rows = sorted(map(tuple, pagerank(f1_graph, max_iterations=7).scores.collect()))
    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "memory_and_disk_ser")
    ser = sorted(map(tuple, pagerank(f1_graph, max_iterations=7).scores.collect()))
    assert rows == ser
