from .extract import extract_imports, path_edges, repo_edges, with_sha256
from .generate import random_edges
from .loader import load_graph
from .repo_source import synthetic_repo_files
from .writeback import merge_node_property_sql, with_node_property, write_node_property

__all__ = [
    "synthetic_repo_files",
    "random_edges",
    "with_sha256",
    "extract_imports",
    "repo_edges",
    "path_edges",
    "load_graph",
    "with_node_property",
    "write_node_property",
    "merge_node_property_sql",
]
