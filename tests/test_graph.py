"""Graph-abstraction unit tests: dense-id mapping, AQE guard."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.plans.checkpoint import aqe_suspended


def test_dense_ids_rank_and_determinism(spark):
    edges = [(i * 7 % 50, (i * 7 + 13) % 50) for i in range(60)]
    g = Graph.from_edge_list(spark, edges)
    d1 = g.dense_ids(num_partitions=4)
    # executes across multiple partitions (no global single-partition sort)
    assert d1.rdd.getNumPartitions() > 1
    rows = {r["id"]: r["vid"] for r in d1.collect()}
    ids = sorted(rows)
    # vid is the dense rank in id order
    assert [rows[i] for i in ids] == list(range(len(ids)))
    # stable across runs
    d2 = {r["id"]: r["vid"] for r in g.dense_ids(num_partitions=4).collect()}
    assert rows == d2


def test_aqe_suspended_nested_restores_original(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    with aqe_suspended(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        with aqe_suspended(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        # inner exit must NOT restore yet (refcount > 0)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
