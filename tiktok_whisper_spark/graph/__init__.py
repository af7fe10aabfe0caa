"""Link-graph kernels: PageRank, connected components, LPA, triangles."""

from .cc import connected_components, connected_components_star
from .kcore import kcore
from .lpa import label_propagation
from .metrics import modularity
from .pagerank import pagerank
from .runner import GraphRun, run_supersteps
from .triangles import triangle_counts, triangle_counts_local

__all__ = [
    "GraphRun",
    "connected_components",
    "connected_components_star",
    "kcore",
    "label_propagation",
    "modularity",
    "pagerank",
    "run_supersteps",
    "triangle_counts",
    "triangle_counts_local",
]
