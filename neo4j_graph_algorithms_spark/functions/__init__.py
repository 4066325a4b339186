"""Scalar functions + procedure catalog (reference parity) and the
training-data pipeline function families (dedup / similarity / text).
"""

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, similarity, textstats  # noqa: F401


# --------------------------------------------------------------------- #
# algo.isFinite / isInfinite / Infinity / NaN
# (reference: algo/.../IsFiniteFunc.java:27-50 — the library's entire
# scalar-function surface)
# --------------------------------------------------------------------- #
def is_finite(col: Column) -> Column:
    return (~F.isnan(col)) & (F.abs(col) != F.lit(float("inf"))) & col.isNotNull()


def is_infinite(col: Column) -> Column:
    return F.abs(col) == F.lit(float("inf"))


def infinity() -> Column:
    return F.lit(float("inf"))


def nan() -> Column:
    return F.lit(float("nan"))


# --------------------------------------------------------------------- #
# algo.list — the procedure catalog (reference: ListProc.java:24-50)
# --------------------------------------------------------------------- #
_PROCEDURES = [
    # (name, kind, module.callable)
    ("algo.pageRank", "algorithm", "operators.pagerank.pagerank"),
    ("algo.pageRank.stream", "algorithm", "operators.pagerank.pagerank"),
    # beyond-reference GDS-era power-iteration variants
    ("algo.articleRank", "algorithm", "operators.pagerank.article_rank"),
    ("algo.articleRank.stream", "algorithm", "operators.pagerank.article_rank"),
    ("algo.eigenvector", "algorithm", "operators.eigenvector.eigenvector_centrality"),
    ("algo.eigenvector.stream", "algorithm", "operators.eigenvector.eigenvector_centrality"),
    ("algo.hits", "algorithm", "operators.hits.hits"),
    ("algo.hits.stream", "algorithm", "operators.hits.hits"),
    ("algo.degree", "algorithm", "graph.Graph.out_degrees"),
    ("algo.degree.stream", "algorithm", "graph.Graph.out_degrees"),
    # the reference's unionFind parallel variants (queue / forkJoin /
    # forkJoinMerge, UnionFindProc2/3/4.java) differ only in thread
    # scheduling and produce the same partition — here scheduling is
    # Spark's, so every alias resolves to the one min-label operator
    ("algo.unionFind", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.stream", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.queue", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.queue.stream", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.forkJoin", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.forkJoin.stream", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.forkJoinMerge", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.forkJoinMerge.stream", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.mscoloring", "algorithm", "operators.wcc.wcc"),
    ("algo.unionFind.mscoloring.stream", "algorithm", "operators.wcc.wcc"),
    ("algo.labelPropagation", "algorithm", "operators.labelprop.label_propagation"),
    ("algo.triangle.stream", "algorithm", "operators.triangles.triangle_stream"),
    ("algo.triangleCount", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.stream", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin.stream", "algorithm", "operators.triangles.triangle_count"),
    ("algo.louvain", "algorithm", "operators.louvain.louvain"),
    ("algo.louvain.stream", "algorithm", "operators.louvain.louvain"),
    ("algo.shortestPaths", "algorithm", "operators.sssp.shortest_paths"),
    ("algo.shortestPaths.stream", "algorithm", "operators.sssp.shortest_paths"),
    ("algo.shortestPath", "algorithm", "operators.sssp.shortest_path"),
    ("algo.shortestPath.stream", "algorithm", "operators.sssp.shortest_path_nodes"),
    ("algo.shortestPath.deltaStepping", "algorithm", "operators.sssp.shortest_paths"),
    ("algo.shortestPath.deltaStepping.stream", "algorithm", "operators.sssp.shortest_paths"),
    ("algo.closeness", "algorithm", "operators.msbfs.closeness_centrality"),
    ("algo.closeness.stream", "algorithm", "operators.msbfs.closeness_centrality"),
    ("algo.harmonic", "algorithm", "operators.msbfs.harmonic_centrality"),
    ("algo.harmonic.stream", "algorithm", "operators.msbfs.harmonic_centrality"),
    ("algo.allShortestPaths.stream", "algorithm", "operators.msbfs.all_shortest_paths_unweighted"),
    # the reference's SCC family (Tarjan / tunedTarjan / iterative /
    # multistep / forwardBackward) computes the identical component
    # partition via different sequential/parallel schedules; the
    # DataFrame engine has one FW-BW coloring implementation
    ("algo.scc", "algorithm", "operators.scc.scc"),
    ("algo.scc.stream", "algorithm", "operators.scc.scc"),
    ("algo.scc.recursive.tarjan", "algorithm", "operators.scc.scc"),
    ("algo.scc.recursive.tunedTarjan", "algorithm", "operators.scc.scc"),
    ("algo.scc.recursive.tunedTarjan.stream", "algorithm", "operators.scc.scc"),
    ("algo.scc.iterative", "algorithm", "operators.scc.scc"),
    ("algo.scc.iterative.stream", "algorithm", "operators.scc.scc"),
    ("algo.scc.multistep", "algorithm", "operators.scc.scc"),
    ("algo.scc.multistep.stream", "algorithm", "operators.scc.scc"),
    ("algo.scc.forwardBackward.stream", "algorithm", "operators.scc.scc"),
    ("algo.mst", "algorithm", "operators.mst.mst"),
    ("algo.betweenness", "algorithm", "operators.betweenness.betweenness_centrality"),
    ("algo.betweenness.stream", "algorithm", "operators.betweenness.betweenness_centrality"),
    ("algo.betweenness.sampled", "algorithm", "operators.betweenness.betweenness_centrality"),
    ("algo.betweenness.sampled.stream", "algorithm", "operators.betweenness.betweenness_centrality"),
    ("algo.betweenness.maxDepth", "algorithm", "operators.betweenness.betweenness_centrality"),
    # beyond-reference pipeline operators (GDS-era surfaces)
    ("algo.nodeSimilarity", "algorithm", "operators.linkpred.neighbor_similarity"),
    ("algo.pageRank.weighted", "algorithm", "operators.pagerank.pagerank"),
    ("algo.pageRank.personalized", "algorithm", "operators.pagerank.pagerank"),
    ("algo.kcore", "algorithm", "operators.kcore.k_core"),
    ("algo.coreNumbers", "algorithm", "operators.kcore.core_numbers"),
    ("algo.randomWalks", "algorithm", "operators.walks.random_walks"),
    ("algo.isFinite", "function", "functions.is_finite"),
    ("algo.isInfinite", "function", "functions.is_infinite"),
    ("algo.Infinity", "function", "functions.infinity"),
    ("algo.NaN", "function", "functions.nan"),
]


def algo_list(spark: SparkSession, query: str | None = None) -> DataFrame:
    """Catalog of implemented procedures, optionally substring-filtered
    (``CALL algo.list('search')``)."""
    rows = [
        (name, kind, impl)
        for name, kind, impl in _PROCEDURES
        if query is None or query in name
    ]
    return spark.createDataFrame(rows, "name string, type string, implementation string")


def register_procedure(name: str, kind: str, impl: str) -> None:
    _PROCEDURES.append((name, kind, impl))
