"""Utility tier: host-side data containers and batching."""

from .data_utils import GraphData, batch_graphs, batch_graphs_padded

__all__ = ["GraphData", "batch_graphs", "batch_graphs_padded"]
