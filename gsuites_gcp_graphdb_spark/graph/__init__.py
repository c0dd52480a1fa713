from .schema import (
    EDGE_SCHEMA,
    VERTEX_SCHEMA,
    NATURAL_KEY,
    bucket_id,
    natural_key_col,
    vertex_id,
)
from .build import build_graph, empty_edges, empty_vertices
from .traversal import Graph
from .upsert import remove_vertices, upsert, upsert_edges, upsert_vertices

__all__ = [
    "EDGE_SCHEMA",
    "VERTEX_SCHEMA",
    "NATURAL_KEY",
    "bucket_id",
    "natural_key_col",
    "vertex_id",
    "build_graph",
    "empty_edges",
    "empty_vertices",
    "Graph",
    "remove_vertices",
    "upsert",
    "upsert_edges",
    "upsert_vertices",
]
