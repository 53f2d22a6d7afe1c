"""Static-shape device graph container (pytree).

The reference keeps graphs as loose ``(x, edge_index)`` arrays and branches
on their runtime sizes (message_passing.py:180-188). Under XLA every shape
must be static, so this container carries *padded* arrays plus validity
masks and true counts; a padded ``Graph`` traces once per bucket shape and
all padded slots are exactly neutral in every aggregation.

``Graph`` is registered as a JAX pytree: it can flow through ``jit``,
``grad``, ``shard_map`` and be sharded with ``jax.sharding`` directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Graph"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A (possibly padded, possibly batched) graph on device.

    Attributes:
        x: ``[N_pad, F]`` node features.
        senders: ``[E_pad]`` int32 source node ids.
        receivers: ``[E_pad]`` int32 target node ids.
        edge_attr: optional ``[E_pad, D]`` edge features.
        y: optional labels (node-level ``[N_pad, ...]`` or graph-level).
        node_mask: optional ``[N_pad]`` bool; None means all valid.
        edge_mask: optional ``[E_pad]`` bool; None means all valid.
        batch: optional ``[N_pad]`` int32 graph-id per node (disjoint-union
            batches); None for single graphs.
        n_node: scalar int32 — true node count (or per-graph counts).
        n_edge: scalar int32 — true edge count.
    """

    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    edge_attr: jax.Array | None = None
    y: jax.Array | None = None
    node_mask: jax.Array | None = None
    edge_mask: jax.Array | None = None
    batch: jax.Array | None = None
    n_node: jax.Array | None = None
    n_edge: jax.Array | None = None

    # -- static (trace-time) sizes ------------------------------------------
    @property
    def num_nodes(self) -> int:
        """Padded node count (static)."""
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        """Padded edge count (static)."""
        return self.senders.shape[0]

    @property
    def num_node_features(self) -> int:
        return self.x.shape[1] if self.x.ndim > 1 else 0

    @property
    def edge_index(self) -> jax.Array:
        """``[2, E]`` COO view."""
        return jnp.stack([self.senders, self.receivers], axis=0)

    @classmethod
    def from_edge_index(
        cls,
        x: Any,
        edge_index: Any,
        *,
        edge_attr: Any = None,
        y: Any = None,
        **kwargs,
    ) -> "Graph":
        """Build from reference-style ``(x, edge_index[2,E] or [E,2])``."""
        edge_index = np.asarray(edge_index)
        if edge_index.ndim != 2:
            raise ValueError(f"edge_index must be rank-2, got {edge_index.shape}")
        if edge_index.shape[0] != 2:
            if edge_index.shape[1] == 2:
                edge_index = edge_index.T
            else:
                raise ValueError(
                    f"edge_index must be [2, E] or [E, 2], got {edge_index.shape}"
                )
        return cls(
            x=jnp.asarray(x),
            senders=jnp.asarray(edge_index[0], jnp.int32),
            receivers=jnp.asarray(edge_index[1], jnp.int32),
            edge_attr=None if edge_attr is None else jnp.asarray(edge_attr),
            y=None if y is None else jnp.asarray(y),
            **kwargs,
        )
