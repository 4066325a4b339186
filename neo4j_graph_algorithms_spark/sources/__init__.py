from .repo_source import synthetic_repo_files
from .extract import with_sha256, extract_imports, repo_edges, path_edges
from .loader import load_graph

__all__ = [
    "synthetic_repo_files",
    "with_sha256",
    "extract_imports",
    "repo_edges",
    "path_edges",
    "load_graph",
]
