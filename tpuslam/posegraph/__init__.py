from tpuslam.posegraph.graph import PoseGraph
from tpuslam.posegraph.lm import (
    GraphArrays,
    bucket_size,
    edge_residual,
    graph_error,
    lm_optimize,
    pad_graph,
)

__all__ = [
    "GraphArrays",
    "PoseGraph",
    "bucket_size",
    "edge_residual",
    "graph_error",
    "lm_optimize",
    "pad_graph",
]
