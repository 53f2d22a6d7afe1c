"""Functional message-passing core.

The reference's class-with-overridable-hooks design
(/root/reference/src/keras_geometric/layers/message_passing.py:9-320:
``message``/``pre_aggregate``/``aggregate``/``update``/``post_update``)
becomes a single pure function with hook *closures* — the idiomatic JAX
shape: no hidden state, fully traceable, trivially shardable.

Semantics preserved from the reference ``propagate``
(message_passing.py:147-220):

- bipartite input as a ``(x_target, x_source)`` tuple;
- gather ``x_j`` from senders, ``x_i`` from receivers;
- default message is ``x_j``; default update is identity on the aggregate;
- empty-graph / no-edge graphs return zeros of the target shape. Under jit
  these sizes are static, so the branches resolve at trace time (the
  reference instead branches on runtime sizes, which cannot compile).

TPU-first: an optional ``edge_mask`` makes padded edges exactly neutral, and
``indices_are_sorted=True`` (receiver-sorted edges from
``ops.graph_ops.coo_to_csr``) lets XLA use the fast segmented-reduce path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .aggregators import aggregate as _aggregate

__all__ = ["propagate", "MessagePassing"]


def propagate(
    x: jax.Array | tuple[jax.Array, jax.Array],
    edge_index: jax.Array,
    *,
    aggregator: str = "mean",
    message_fn: Callable | None = None,
    update_fn: Callable | None = None,
    pre_aggregate_fn: Callable | None = None,
    post_update_fn: Callable | None = None,
    aggregate_fn: Callable | None = None,
    edge_attr: jax.Array | None = None,
    edge_mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Run gather -> message -> aggregate -> update over a COO edge list.

    Args:
        x: ``[N, F]`` node features, or ``(x_target, x_source)`` for
            bipartite graphs (reference ordering, message_passing.py:170-172).
        edge_index: ``[2, E]`` int array; row 0 = senders (source j),
            row 1 = receivers (target i).
        aggregator: one of sum/mean/max/min/std (ignored if ``aggregate_fn``).
        message_fn: ``(x_i, x_j, edge_attr) -> [E, F']``; default ``x_j``.
        update_fn: ``(aggregated, x_target) -> [N, F'']``; default identity.
        pre_aggregate_fn: ``messages -> messages`` hook.
        post_update_fn: ``(x_target, updated) -> updated`` hook.
        aggregate_fn: full custom ``(messages, receivers, num_nodes) -> [N, F']``.
        edge_attr: optional ``[E, D]`` per-edge features.
        edge_mask: optional ``[E]`` bool; False edges are exactly neutral.
        indices_are_sorted: edges are receiver-sorted (enables fast scatter).

    Returns:
        ``[N_target, F_out]`` updated node features.
    """
    if isinstance(x, (tuple, list)):
        x_target, x_source = x[0], x[1]
    else:
        x_target = x_source = x
    num_nodes = x_target.shape[0]

    # Static-size degenerate cases (reference: message_passing.py:179-188).
    if num_nodes == 0:
        return jnp.zeros((0, x_target.shape[1]), dtype=x_target.dtype)
    if edge_index.shape[1] == 0:
        # Reference returns zeros of the *input* feature shape without
        # invoking update (message_passing.py:185-188); conv layers handle
        # their own no-edge fast paths above this level.
        return jnp.zeros((num_nodes, x_target.shape[1]), dtype=x_target.dtype)

    senders = edge_index[0]
    receivers = edge_index[1]

    x_j = jnp.take(x_source, senders, axis=0)
    x_i = jnp.take(x_target, receivers, axis=0)

    if message_fn is not None:
        messages = message_fn(x_i, x_j, edge_attr)
    else:
        messages = x_j

    if pre_aggregate_fn is not None:
        messages = pre_aggregate_fn(messages)

    if aggregate_fn is not None:
        aggregated = aggregate_fn(messages, receivers, num_nodes)
    else:
        aggregated = _aggregate(
            aggregator,
            messages,
            receivers,
            num_nodes,
            mask=edge_mask,
            indices_are_sorted=indices_are_sorted,
        )

    if update_fn is not None:
        aggregated = update_fn(aggregated, x_target)
    if post_update_fn is not None:
        aggregated = post_update_fn(x_target, aggregated)
    return aggregated


class MessagePassing:
    """Subclassable hook-style API (reference-compatible surface).

    Migration aid for users of the reference's class hierarchy
    (message_passing.py:9-145): subclass and override ``message`` /
    ``aggregate`` / ``update`` / ``pre_aggregate`` / ``post_update``; call
    the instance with ``(x, edge_index, edge_attr=None)``. Overrides must
    be pure functions of their inputs (no hidden state) — the instance
    itself carries only the aggregator name, so calls are jit-safe.

    New code should prefer the functional :func:`propagate` with closures.
    """

    def __init__(self, aggregator: str = "mean") -> None:
        self.aggregator = aggregator

    # -- overridable hooks (reference signatures, self-free semantics) -----
    def message(self, x_i, x_j, edge_attr=None):
        return x_j

    def pre_aggregate(self, messages):
        return messages

    def aggregate(self, messages, receivers, num_nodes):
        return _aggregate(self.aggregator, messages, receivers, num_nodes)

    def update(self, aggregated, x=None):
        return aggregated

    def post_update(self, x, updated):
        return updated

    def propagate(self, x, edge_index, edge_attr=None, **kwargs):
        return propagate(
            x,
            edge_index,
            aggregator=self.aggregator,
            message_fn=lambda x_i, x_j, ea: self.message(x_i, x_j, ea),
            pre_aggregate_fn=self.pre_aggregate,
            aggregate_fn=lambda m, r, n: self.aggregate(m, r, n),
            update_fn=lambda agg, x_t: self.update(agg, x_t),
            post_update_fn=self.post_update,
            edge_attr=edge_attr,
            **kwargs,
        )

    def __call__(self, inputs, edge_attr=None, **kwargs):
        """Reference call convention: ``[x, edge_index(, edge_attr)]``
        (message_passing.py:240-254)."""
        if not isinstance(inputs, (list, tuple)) or len(inputs) < 2:
            raise ValueError(
                "Inputs must be a list or tuple containing [x, edge_index]"
            )
        x, edge_index = inputs[0], inputs[1]
        if len(inputs) >= 3 and inputs[2] is not None:
            edge_attr = inputs[2]
        import jax.numpy as _jnp

        edge_index = _jnp.asarray(edge_index).astype(_jnp.int32)
        return self.propagate(x, edge_index, edge_attr=edge_attr, **kwargs)

    def get_config(self) -> dict:
        return {"aggregator": self.aggregator}

    @classmethod
    def from_config(cls, config: dict) -> "MessagePassing":
        return cls(**config)
