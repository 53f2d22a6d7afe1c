"""Graph-level readout: single-graph and batched-segment global pooling.

Parity contracts with the reference
(/root/reference/src/keras_geometric/layers/pooling/global_pooling.py):

- ``GlobalPooling``: mean/max/sum over the node axis -> ``[1, F]``
  (global_pooling.py:66-91);
- ``BatchGlobalPooling``: per-graph segment reduction keyed by a ``batch``
  assignment vector; mean divides by counts clamped at 1
  (global_pooling.py:228-246); ``num_graphs`` defaults to ``max(batch)+1``
  (global_pooling.py:225) but should be passed statically under jit.

TPU-first: ``num_graphs`` is a static argument (the reference derives it
from data at runtime, which cannot compile), and an optional ``node_mask``
makes padded nodes exactly neutral.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.segment import segment_count, segment_max, segment_sum
from ..module import Module

__all__ = ["GlobalPooling", "BatchGlobalPooling", "global_pool", "batch_pool"]

_POOLING = ("mean", "max", "sum")


def global_pool(
    x: jax.Array,
    pooling: str = "mean",
    *,
    node_mask: jax.Array | None = None,
) -> jax.Array:
    """Reduce ``[N, F]`` node features to a ``[1, F]`` graph representation."""
    if pooling not in _POOLING:
        raise ValueError(f"pooling must be one of {list(_POOLING)}, got {pooling}")
    if node_mask is None:
        if pooling == "mean":
            return jnp.mean(x, axis=0, keepdims=True)
        if pooling == "max":
            return jnp.max(x, axis=0, keepdims=True)
        return jnp.sum(x, axis=0, keepdims=True)
    m = node_mask[:, None]
    if pooling == "sum":
        return jnp.sum(jnp.where(m, x, 0), axis=0, keepdims=True)
    if pooling == "mean":
        count = jnp.maximum(jnp.sum(node_mask), 1).astype(x.dtype)
        return jnp.sum(jnp.where(m, x, 0), axis=0, keepdims=True) / count
    neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
    out = jnp.max(jnp.where(m, x, neg), axis=0, keepdims=True)
    return jnp.where(jnp.isinf(out), jnp.zeros_like(out), out)


def batch_pool(
    x: jax.Array,
    batch: jax.Array,
    num_graphs: int,
    pooling: str = "mean",
    *,
    node_mask: jax.Array | None = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Reduce ``[N_total, F]`` stacked node features to ``[num_graphs, F]``.

    ``batch[i]`` gives the graph id of node ``i`` (non-decreasing for
    disjoint-union batches, hence sorted indices by default).
    """
    if pooling not in _POOLING:
        raise ValueError(f"pooling must be one of {list(_POOLING)}, got {pooling}")
    if pooling == "sum":
        return segment_sum(
            x, batch, num_graphs, mask=node_mask,
            indices_are_sorted=indices_are_sorted,
        )
    if pooling == "max":
        return segment_max(
            x, batch, num_graphs, mask=node_mask,
            indices_are_sorted=indices_are_sorted,
        )
    total = segment_sum(
        x, batch, num_graphs, mask=node_mask,
        indices_are_sorted=indices_are_sorted,
    )
    counts = segment_count(
        batch, num_graphs, mask=node_mask, dtype=x.dtype,
        indices_are_sorted=indices_are_sorted,
    )
    # Reference clamps counts at 1 (global_pooling.py:237), unlike the
    # edge-aggregator 1e-8 clamp.
    counts = jnp.maximum(counts, 1.0)
    return total / counts[:, None]


@dataclasses.dataclass(frozen=True)
class GlobalPooling(Module):
    """Parameter-free single-graph readout."""

    pooling: str = "mean"

    def __post_init__(self):
        if self.pooling not in _POOLING:
            raise ValueError(
                f"pooling must be one of {list(_POOLING)}, got {self.pooling}"
            )

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        return {}

    def apply(
        self,
        params: dict,
        x: jax.Array,
        *,
        node_mask: jax.Array | None = None,
    ) -> jax.Array:
        return global_pool(x, self.pooling, node_mask=node_mask)


@dataclasses.dataclass(frozen=True)
class BatchGlobalPooling(Module):
    """Parameter-free batched readout over a ``batch`` assignment vector."""

    pooling: str = "mean"

    def __post_init__(self):
        if self.pooling not in _POOLING:
            raise ValueError(
                f"pooling must be one of {list(_POOLING)}, got {self.pooling}"
            )

    def init(self, rng: jax.Array, input_dim: int, dtype=jnp.float32) -> dict:
        return {}

    def apply(
        self,
        params: dict,
        x: jax.Array,
        batch: jax.Array,
        num_graphs: int,
        *,
        node_mask: jax.Array | None = None,
    ) -> jax.Array:
        return batch_pool(
            x, batch, num_graphs, self.pooling, node_mask=node_mask
        )
