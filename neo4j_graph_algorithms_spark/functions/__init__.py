"""Scalar functions + procedure catalog (reference parity) and the
training-data pipeline function families (dedup / similarity / text).
"""

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, sampling, scaling, similarity, textstats  # noqa: F401


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
    # the catalog lists itself, as in the reference (ListProc.java:24
    # is itself a @Procedure and shows up in its own output)
    ("algo.list", "procedure", "functions.algo_list"),
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
    # beyond-reference: star-contraction CC (Kiveris et al. SoCC'14) —
    # O(log n) rounds regardless of diameter, same min-id partition
    ("algo.unionFind.twoPhase", "algorithm", "operators.wcc.wcc_two_phase"),
    ("algo.unionFind.twoPhase.stream", "algorithm", "operators.wcc.wcc_two_phase"),
    ("algo.labelPropagation", "algorithm", "operators.labelprop.label_propagation"),
    ("algo.triangle.stream", "algorithm", "operators.triangles.triangle_stream"),
    ("algo.triangleCount", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.stream", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin", "algorithm", "operators.triangles.triangle_count"),
    ("algo.triangleCount.forkJoin.stream", "algorithm", "operators.triangles.triangle_count"),
    ("algo.louvain", "algorithm", "operators.louvain.louvain"),
    ("algo.louvain.stream", "algorithm", "operators.louvain.louvain"),
    ("algo.conductance", "algorithm", "operators.louvain.conductance"),
    ("algo.modularity", "algorithm", "operators.louvain.modularity"),
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
    # the reference proc dispatches to impl/AllShortestPaths.java (multi-
    # source weighted Dijkstra) when weightProperty is configured; the
    # engine exposes that branch under an explicit name
    ("algo.allShortestPaths.weighted.stream", "algorithm", "operators.sssp.all_shortest_paths_weighted"),
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
    ("algo.scc.forwardBackward.stream", "algorithm", "operators.scc.scc_forward_backward"),
    ("algo.scc.forwardBackward", "algorithm", "operators.scc.scc_forward_backward"),
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
    ("algo.ktruss", "algorithm", "operators.ktruss.k_truss"),
    ("algo.beta.k1coloring", "algorithm", "operators.coloring.k1coloring"),
    ("algo.dag.topologicalSort", "algorithm", "operators.dag.topological_levels"),
    ("algo.katz", "algorithm", "operators.katz.katz_centrality"),
    ("algo.scc.condensation", "algorithm", "operators.scc.condensation"),
    ("algo.mis", "algorithm", "operators.mis.maximal_independent_set"),
    ("algo.transitivity", "algorithm", "operators.triangles.transitivity"),
    ("algo.mis.stream", "algorithm", "operators.mis.maximal_independent_set"),
    ("algo.graph.generate", "source", "sources.generate.random_edges"),
    ("algo.katz.stream", "algorithm", "operators.katz.katz_centrality"),
    ("algo.dag.longestPath", "algorithm", "operators.dag.topological_levels"),
    ("algo.beta.k1coloring.stream", "algorithm", "operators.coloring.k1coloring"),
    ("algo.fastRP", "algorithm", "operators.fastrp.fastrp"),
    ("algo.fastRP.stream", "algorithm", "operators.fastrp.fastrp"),
    ("algo.coreNumbers", "algorithm", "operators.kcore.core_numbers"),
    ("algo.randomWalks", "algorithm", "operators.walks.random_walks"),
    ("algo.graph.sample.rwr", "algorithm", "operators.sampling.sample_subgraph"),
    ("algo.randomWalks.node2vec", "algorithm", "operators.walks.node2vec_walks"),
    ("algo.anf", "algorithm", "operators.anf.neighborhood_function"),
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


# --------------------------------------------------------------------- #
# call — runnable `CALL algo.*` dispatch (migration entry point)
# --------------------------------------------------------------------- #
# Reference config keys (the `{...}` map of every proc, e.g.
# PageRankProc.java:69, UnionFindProc.java:53) → engine kwargs.  Keys
# already matching an engine parameter name pass through unaliased.
_CONFIG_ALIASES = {
    "iterations": "max_iterations",
    "maxIterations": "max_iterations",
    "dampingFactor": "damping",
    "maxDepth": "max_depth",
    "startNode": "start_node",
    "endNode": "end_node",
    "sourceNodes": "source_nodes",
    "walkLength": "walk_length",
    "walksPerNode": "walks_per_node",
    "similarityCutoff": "threshold",
    "checkInterval": "check_interval",
    # GDS-era config names for the beyond-reference surfaces
    "embeddingDimension": "embedding_dim",
    "iterationWeights": "iteration_weights",
    "randomSeed": "seed",
    "relationshipWeightProperty": "weighted",
}

# Reference execution/write knobs with no meaning here: thread-pool
# sizing is Spark's job (SURVEY.md §4), and write-back is an explicit
# step (`sources/writeback.py`) rather than a config side effect — the
# non-stream result objects expose the same YIELD rows via `.stats()`.
_IGNORED_CONFIG = {
    "concurrency", "readConcurrency", "writeConcurrency", "batchSize",
    "write", "writeProperty", "partitionProperty", "scoreProperty",
    "clusterProperty", "communityProperty", "graph", "defaultValue",
    "stats",
}

# Per-name kwarg presets: aliases whose reference name itself selects a
# mode (the engine exposes the mode as a parameter on one callable).
_NAME_PRESETS: dict[str, dict] = {
    "algo.pageRank.weighted": {"weighted": True},
}


def _coerce_config_value(target: str, value):
    """GDS passes relationshipWeightProperty as a property NAME; the
    engine's Graph already carries its weight column, so any non-empty
    name means "weighted mode"."""
    if target == "weighted" and isinstance(value, str):
        return bool(value)
    return value


def call(name: str, graph, **config):
    """Run a cataloged procedure by its reference name —
    ``CALL algo.pageRank.stream('L','T',{iterations:20})`` becomes
    ``call("algo.pageRank.stream", graph, iterations=20)``.

    The label/relationship projection arguments of the reference CALL
    are the ``graph`` here (build it with ``Graph.from_edges`` /
    ``sources.loader``); config keys are mapped to engine kwargs
    (``iterations``→``max_iterations``, ``dampingFactor``→``damping``,
    …), pure execution/write knobs (``concurrency``, ``write``,
    ``writeProperty``, …) are ignored as documented, and anything else
    unknown raises instead of being silently dropped.

    ``*.stream`` names return the primary result DataFrame (the
    reference's YIELD stream); other names return the full result
    object, whose ``.stats()`` mirrors the write-mode YIELD row.
    """
    import dataclasses
    import importlib
    import inspect

    by_name = {n: (kind, impl) for n, kind, impl in _PROCEDURES}
    if name not in by_name:
        near = [n for n in by_name if name.lower() in n.lower()]
        raise KeyError(f"unknown procedure {name!r}" +
                       (f"; did you mean one of {near}?" if near else ""))
    kind, impl = by_name[name]
    if kind == "function":
        raise TypeError(
            f"{name} is a scalar column function — use "
            f"neo4j_graph_algorithms_spark.{impl} on a Column directly")
    if kind == "procedure":  # algo.list — takes a session, not a graph
        spark = getattr(graph, "spark", graph)
        return algo_list(spark, config.get("query"))
    if kind == "source":  # generators — take a session, return edges
        import importlib as _il

        pkg = __name__.rsplit(".", 1)[0]
        mod_path, attr = impl.rsplit(".", 1)
        fn = getattr(_il.import_module(f"{pkg}.{mod_path}"), attr)
        spark = getattr(graph, "spark", graph)
        return fn(spark, **config)

    # resolve the impl path inside this package
    pkg = __name__.rsplit(".", 1)[0]  # neo4j_graph_algorithms_spark
    if impl.startswith("graph.Graph."):
        fn = getattr(graph, impl.rsplit(".", 1)[1])
    else:
        mod_path, attr = impl.rsplit(".", 1)
        fn = getattr(importlib.import_module(f"{pkg}.{mod_path}"), attr)

    params = inspect.signature(fn).parameters
    kwargs = dict(_NAME_PRESETS.get(name, {}))
    # weightProperty means "use the loaded weights" — the engine's
    # Graph already carries its weight column, so it maps to the
    # weighted flag where the operator has one and is moot otherwise.
    cfg = dict(config)
    if cfg.pop("weightProperty", None) is not None and "weighted" in params:
        kwargs["weighted"] = True
    for key, value in cfg.items():
        target = _CONFIG_ALIASES.get(key, key)
        if target in params:
            kwargs[target] = _coerce_config_value(target, value)
        elif key in _IGNORED_CONFIG:
            continue
        else:
            raise ValueError(
                f"{name}: unsupported config key {key!r} "
                f"(engine parameters: {sorted(params)})")

    result = fn(**kwargs) if impl.startswith("graph.Graph.") else fn(graph, **kwargs)

    if name.endswith(".stream"):
        if isinstance(result, DataFrame):
            return result
        for f in dataclasses.fields(result):
            v = getattr(result, f.name)
            if isinstance(v, DataFrame):
                return v
    return result
