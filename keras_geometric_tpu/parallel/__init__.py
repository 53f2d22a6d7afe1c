"""Distribution tier: mesh construction, edge partitioning, halo exchange."""

from .distributed import (
    distributed_gcn_encoder,
    make_distributed_eval_fn,
    make_distributed_train_step,
    shard_partitioned_graph,
)
from .mesh import make_mesh
from .partition import PartitionedGraph, partition_graph

__all__ = [
    "make_mesh",
    "PartitionedGraph",
    "partition_graph",
    "shard_partitioned_graph",
    "make_distributed_train_step",
    "make_distributed_eval_fn",
    "distributed_gcn_encoder",
]
