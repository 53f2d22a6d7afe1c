"""Model compositions: multi-layer GNN encoders and task heads."""

from .gnn import GAT, GCN, GIN, GraphSAGE, GNNEncoder, GraphClassifier

__all__ = ["GNNEncoder", "GCN", "GIN", "GAT", "GraphSAGE", "GraphClassifier"]
