from .schema import EDGE_SCHEMA, VERTEX_SCHEMA, NATURAL_KEY, vertex_id
from .build import build_graph, empty_edges, empty_vertices
from .traversal import Graph

__all__ = [
    "EDGE_SCHEMA",
    "VERTEX_SCHEMA",
    "NATURAL_KEY",
    "vertex_id",
    "build_graph",
    "empty_edges",
    "empty_vertices",
    "Graph",
]
