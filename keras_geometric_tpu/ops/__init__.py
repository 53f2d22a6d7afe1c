"""Core sparse/graph compute ops: segment reductions, graph structure, SpMM."""

from . import graph_ops, segment, spmm
from .precompute import precompute_propagation
from .graph_ops import (
    CSRGraph,
    add_self_loops,
    coo_to_csr,
    ensure_edge_index,
    gcn_norm,
    pad_edges,
    pad_nodes,
    round_up,
    sort_edges_by_receiver,
)
from .segment import (
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_std,
    segment_sum,
)

__all__ = [
    "graph_ops",
    "segment",
    "spmm",
    "precompute_propagation",
    "CSRGraph",
    "add_self_loops",
    "coo_to_csr",
    "ensure_edge_index",
    "gcn_norm",
    "pad_edges",
    "pad_nodes",
    "round_up",
    "sort_edges_by_receiver",
    "segment_count",
    "segment_max",
    "segment_mean",
    "segment_min",
    "segment_softmax",
    "segment_std",
    "segment_sum",
]
