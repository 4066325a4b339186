"""PySpark-native link-graph analytics engine.

From-scratch re-expression of the query semantics of
vitorhorta/neo4j-graph-algorithms (Neo4j 3.x graph-algorithms
procedures) on the Spark DataFrame API: graphs are edge DataFrames,
algorithms are superstep loops of join + aggregate, results are
DataFrames.  See SURVEY.md for the blueprint and file:line parity
citations in each module.
"""

from .graph import Graph
from .session import get_spark
from .functions import algo_list, call
from .plans import SuperstepCheckpointer, superstep_fixpoint
from .operators import (
    pagerank,
    article_rank,
    eigenvector_centrality,
    wcc,
    label_propagation,
    doulion_estimate,
    triangle_count,
    triangle_stream,
    clustering_coefficients,
    wcc_two_phase,
    k_truss,
    fastrp,
    conductance,
    k1coloring,
    condensation,
    maximal_independent_set,
    transitivity,
    katz_centrality,
    topological_levels,
    modularity,
    neighbor_sample,
    sample_subgraph,
)

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "get_spark",
    "algo_list",
    "call",
    "pagerank",
    "article_rank",
    "eigenvector_centrality",
    "wcc",
    "label_propagation",
    "doulion_estimate",
    "triangle_count",
    "triangle_stream",
    "clustering_coefficients",
    "wcc_two_phase",
    "k_truss",
    "fastrp",
    "conductance",
    "k1coloring",
    "condensation",
    "maximal_independent_set",
    "transitivity",
    "katz_centrality",
    "topological_levels",
    "modularity",
    "neighbor_sample",
    "sample_subgraph",
    "SuperstepCheckpointer",
    "superstep_fixpoint",
]
