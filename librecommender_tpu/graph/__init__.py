from .adjacency import (
    build_edges,
    build_neighbor_table,
    pinsage_neighbor_table,
)

__all__ = ["build_edges", "build_neighbor_table", "pinsage_neighbor_table"]
