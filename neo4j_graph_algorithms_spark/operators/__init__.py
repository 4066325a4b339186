from .pagerank import pagerank, article_rank
from .eigenvector import eigenvector_centrality
from .hits import hits
from .wcc import wcc, wcc_two_phase
from .coloring import k1coloring
from .dag import topological_levels
from .katz import katz_centrality
from .mis import maximal_independent_set
from .ktruss import k_truss, k_truss_multi, truss_decomposition
from .fastrp import fastrp
from .labelprop import label_propagation
from .triangles import (
    clustering_coefficients,
    doulion_estimate,
    transitivity,
    triangle_count,
    triangle_stream,
)
from .louvain import conductance, louvain, modularity
from .sssp import (
    all_shortest_paths_weighted,
    shortest_path,
    shortest_path_nodes,
    shortest_paths,
)
from .msbfs import (
    msbfs_levels,
    closeness_centrality,
    harmonic_centrality,
    all_shortest_paths_unweighted,
)
from .scc import condensation, scc, scc_forward_backward
from .mst import mst, minimum_spanning_forest
from .betweenness import betweenness_centrality
from .linkpred import neighbor_similarity
from .kcore import k_core, core_numbers
from .anf import neighborhood_function
from .walks import node2vec_walks, random_walks
from .butterflies import butterflies
from .sampling import neighbor_sample, sample_subgraph

__all__ = [
    "pagerank",
    "article_rank",
    "eigenvector_centrality",
    "hits",
    "wcc",
    "wcc_two_phase",
    "k_truss",
    "k_truss_multi",
    "truss_decomposition",
    "fastrp",
    "label_propagation",
    "triangle_count",
    "triangle_stream",
    "doulion_estimate",
    "clustering_coefficients",
    "louvain",
    "conductance",
    "modularity",
    "shortest_paths",
    "shortest_path",
    "shortest_path_nodes",
    "msbfs_levels",
    "closeness_centrality",
    "harmonic_centrality",
    "all_shortest_paths_unweighted",
    "all_shortest_paths_weighted",
    "scc",
    "scc_forward_backward",
    "mst",
    "minimum_spanning_forest",
    "betweenness_centrality",
    "neighbor_similarity",
    "k1coloring",
    "topological_levels",
    "katz_centrality",
    "condensation",
    "maximal_independent_set",
    "transitivity",
    "k_core",
    "core_numbers",
    "random_walks",
    "butterflies",
    "neighbor_sample",
    "sample_subgraph",
    "node2vec_walks",
    "neighborhood_function",
]
