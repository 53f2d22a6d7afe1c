"""keras_geometric_tpu: a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas message-passing GNN framework with the
capability surface of ``keras-geometric`` (reference layer map in
/root/repo/SURVEY.md), redesigned TPU-first:

- functional message-passing core over static-shape COO/CSR graphs
  (``nn.propagate``);
- conv layers: :class:`GCNConv`, :class:`GINConv`, :class:`GATv2Conv`,
  :class:`SAGEConv`; six aggregation strategies;
- readouts: global / batched-segment / attention / Set2Set pooling;
- jit-stable padded graph batching and Planetoid/OGB-scale data tier;
- Pallas SpMM/SDDMM kernel tier and mesh-parallel execution with
  edge partitioning + halo exchange (``parallel``).
"""

from ._version import __version__
from .graph import Graph
from .nn.aggregators import PoolingAggregator, aggregate
from .nn.gatv2_conv import GATv2Conv
from .nn.gcn_conv import GCNConv
from .nn.gin_conv import GINConv
from .nn.message_passing import MessagePassing, propagate
from .nn.module import MLP, Dense, Module
from .nn.pooling.attention_pooling import AttentionPooling, Set2Set
from .nn.pooling.global_pooling import (
    BatchGlobalPooling,
    GlobalPooling,
    batch_pool,
    global_pool,
)
from .nn.sage_conv import SAGEConv
from .ops.graph_ops import add_self_loops, ensure_edge_index, gcn_norm
from .utils.data_utils import GraphData, batch_graphs


def compute_gcn_normalization(edge_index, num_nodes):
    """Reference-name alias for :func:`gcn_norm` (utils/main.py:20-33)."""
    return gcn_norm(edge_index, num_nodes)


def get_dataset_classes():
    """Lazily import dataset loaders (parity with reference __init__.py:15-22)."""
    from .data.datasets import CiteSeerDataset, CoraDataset, PubMedDataset

    return {
        "CoraDataset": CoraDataset,
        "CiteSeerDataset": CiteSeerDataset,
        "PubMedDataset": PubMedDataset,
    }


__all__ = [
    "__version__",
    # core
    "Graph",
    "Module",
    "Dense",
    "MLP",
    "propagate",
    "MessagePassing",
    "compute_gcn_normalization",
    # conv layers
    "GCNConv",
    "GINConv",
    "GATv2Conv",
    "SAGEConv",
    # aggregators
    "aggregate",
    "PoolingAggregator",
    # pooling
    "GlobalPooling",
    "BatchGlobalPooling",
    "AttentionPooling",
    "Set2Set",
    "global_pool",
    "batch_pool",
    # graph ops
    "add_self_loops",
    "gcn_norm",
    "ensure_edge_index",
    # data
    "GraphData",
    "batch_graphs",
    "get_dataset_classes",
]
