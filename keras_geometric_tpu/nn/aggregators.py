"""Aggregation strategies: functional registry over segment ops.

Mirrors the reference's six aggregators + factory
(/root/reference/src/keras_geometric/layers/aggregators.py:48-343) as pure
functions ``(messages[E, F], receivers[E], num_nodes) -> [N, F]``. The
learnable ``pooling`` aggregator (max over an MLP of messages,
aggregators.py:254-274) is expressed at the layer level (see SAGEConv) since
it carries parameters; ``aggregate`` covers the five stateless ones.
"""

from __future__ import annotations

from typing import Callable

import jax

from ..ops import segment

__all__ = ["aggregate", "available_aggregators", "AGGREGATORS"]

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
