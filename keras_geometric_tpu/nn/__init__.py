"""Neural network layers: message passing core, conv layers, pooling."""

from .aggregators import (
    AGGREGATORS,
    PoolingAggregator,
    aggregate,
    available_aggregators,
)
from .gatv2_conv import GATv2Conv
from .gcn_conv import GCNConv
from .gin_conv import GINConv
from .message_passing import propagate
from .module import MLP, Dense, Module, dropout, get_activation, get_initializer
from .pooling import AttentionPooling, BatchGlobalPooling, GlobalPooling, Set2Set
from .sage_conv import SAGEConv

__all__ = [
    "AGGREGATORS",
    "aggregate",
    "available_aggregators",
    "propagate",
    "Module",
    "Dense",
    "MLP",
    "dropout",
    "get_activation",
    "get_initializer",
    "GCNConv",
    "GINConv",
    "GATv2Conv",
    "SAGEConv",
    "GlobalPooling",
    "BatchGlobalPooling",
    "AttentionPooling",
    "Set2Set",
]
