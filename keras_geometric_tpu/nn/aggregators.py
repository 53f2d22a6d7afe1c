"""Aggregation strategies: functional registry over segment ops.

Mirrors the reference's six aggregators + factory
(/root/reference/src/keras_geometric/layers/aggregators.py:48-343) as pure
functions ``(messages[E, F], receivers[E], num_nodes) -> [N, F]``.
``aggregate`` covers the five stateless ones; the learnable ``pooling``
strategy (elementwise max over an MLP of the messages,
aggregators.py:254-274) is the standalone :class:`PoolingAggregator`
module, reusable outside SAGEConv exactly like the reference's class.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax

from ..ops import segment
from .module import Dense, Module

__all__ = [
    "aggregate",
    "available_aggregators",
    "AGGREGATORS",
    "PoolingAggregator",
]

AGGREGATORS: dict[str, Callable] = {
    "sum": segment.segment_sum,
    "mean": segment.segment_mean,
    "max": segment.segment_max,
    "min": segment.segment_min,
    "std": segment.segment_std,
}


def available_aggregators() -> list[str]:
    return list(AGGREGATORS) + ["pooling"]


def aggregate(
    name: str,
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Reduce per-edge messages into per-node outputs by strategy ``name``."""
    if name not in AGGREGATORS:
        raise ValueError(
            f"Invalid aggregator: {name}. Available: {available_aggregators()}"
        )
    return AGGREGATORS[name](
        messages,
        receivers,
        num_nodes,
        mask=mask,
        indices_are_sorted=indices_are_sorted,
    )


@dataclasses.dataclass(frozen=True)
class PoolingAggregator(Module):
    """Learnable pooling aggregation: ``max_j Dense(units, act)(m_j)``.

    Standalone equivalent of the reference's ``PoolingAggregator``
    (aggregators.py:235-274): messages pass through a single Dense MLP,
    then reduce per receiver with the masked segment max (isolated
    receivers get 0, matching the reference's -inf fixup). SAGEConv's
    ``aggregator="pooling"`` composes the same pieces.
    """

    units: int
    activation: str | None = "relu"
    use_bias: bool = True
    kernel_initializer: str = "glorot_uniform"
    bias_initializer: str = "zeros"

    def _mlp(self) -> Dense:
        return Dense(
            self.units,
            activation=self.activation,
            use_bias=self.use_bias,
            kernel_initializer=self.kernel_initializer,
            bias_initializer=self.bias_initializer,
        )

    def init(self, rng: jax.Array, input_dim: int, dtype=None) -> dict:
        import jax.numpy as jnp

        return {
            "mlp": self._mlp().init(rng, input_dim, dtype or jnp.float32)
        }

    def apply(
        self,
        params: dict,
        messages: jax.Array,
        receivers: jax.Array,
        num_nodes: int,
        *,
        mask: jax.Array | None = None,
        indices_are_sorted: bool = False,
    ) -> jax.Array:
        pooled = self._mlp().apply(params["mlp"], messages)
        return segment.segment_max(
            pooled,
            receivers,
            num_nodes,
            mask=mask,
            indices_are_sorted=indices_are_sorted,
        )
