"""Dataset loaders (Planetoid citation graphs, synthetic, OGB-scale)."""

from .base import Dataset
from .citation import CiteSeerDataset, PubMedDataset
from .cora import CoraDataset
from .synthetic import synthetic_graph, synthetic_planetoid

__all__ = [
    "Dataset",
    "CoraDataset",
    "CiteSeerDataset",
    "PubMedDataset",
    "synthetic_graph",
    "synthetic_planetoid",
]
