from .pagerank import pagerank
from .wcc import wcc
from .labelprop import label_propagation
from .triangles import triangle_count, triangle_stream, clustering_coefficients

__all__ = [
    "pagerank",
    "wcc",
    "label_propagation",
    "triangle_count",
    "triangle_stream",
    "clustering_coefficients",
]
