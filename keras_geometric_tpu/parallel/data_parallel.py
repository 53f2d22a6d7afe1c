"""Graph-minibatch data parallelism (SURVEY.md §2.4 item 1).

Shards a batch of padded graphs across a ``data`` mesh axis: each chip
holds ``B / P`` padded graphs and runs the full model locally; gradients
are combined by the jit-inserted all-reduce (params replicated, batch
sharded — GSPMD derives the ``psum``).

Works with :func:`keras_geometric_tpu.utils.data_utils.batch_graphs_padded`
buckets stacked along a leading batch axis.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..training.train import TrainState, label_nll

__all__ = ["stack_padded_batches", "make_dp_graph_classifier_step"]


def stack_padded_batches(graphs: list, mesh: Mesh, *, axis: str = "data"):
    """Stack per-chip padded Graph buckets into sharded ``[P, ...]`` arrays.

    ``graphs`` is a list of ``P`` equal-shape padded Graphs (from
    ``batch_graphs_padded``); element ``i`` lands on mesh position ``i``.
    Returns a dict of device arrays sharded on the leading axis.
    """
    if not graphs:
        raise ValueError("need at least one padded graph bucket")
    shard = NamedSharding(mesh, P(axis))

    def stack(field):
        vals = [getattr(g, field) for g in graphs]
        if any(v is None for v in vals):
            return None
        return jax.device_put(jnp.stack([jnp.asarray(v) for v in vals]), shard)

    out = {
        f: stack(f)
        for f in (
            "x", "senders", "receivers", "edge_mask", "node_mask", "batch", "y"
        )
    }
    return {k: v for k, v in out.items() if v is not None}


def make_dp_graph_classifier_step(
    model: Any,
    tx: Any,
    mesh: Mesh,
    num_graphs_per_shard: int,
    *,
    axis: str = "data",
    donate: bool = True,
) -> Callable:
    """Jitted DP train step for a GraphClassifier over sharded buckets.

    ``data`` must contain x/senders/receivers/edge_mask/node_mask/batch
    (each ``[P, ...]`` sharded) and ``y`` ``[P, G]`` with -1 for padded
    graph slots. Parameters stay replicated; XLA inserts the gradient
    all-reduce.
    """
    import optax

    replicated = NamedSharding(mesh, P())

    def loss_one_shard(params, x, senders, receivers, emask, nmask, batch, y):
        logits = model.apply(
            params,
            x,
            jnp.stack([senders, receivers]),
            batch,
            num_graphs_per_shard,
            edge_mask=emask,
            node_mask=nmask,
        )
        valid = y >= 0
        logp = jax.nn.log_softmax(logits)
        safe_y = jnp.maximum(y, 0)
        nll = label_nll(logp, safe_y)
        return jnp.sum(nll * valid), jnp.sum(valid)

    def step(state: TrainState, data: dict):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            sums, counts = jax.vmap(
                lambda x, s, r, em, nm, b, y: loss_one_shard(
                    params, x, s, r, em, nm, b, y
                )
            )(
                data["x"], data["senders"], data["receivers"],
                data["edge_mask"], data["node_mask"], data["batch"],
                data["y"],
            )
            return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1, rng=rng),
            loss,
        )

    del replicated
    return jax.jit(step, donate_argnums=(0,) if donate else ())
