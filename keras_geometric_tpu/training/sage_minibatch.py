"""SAGE minibatch training over sampled subgraphs.

Implements the BASELINE.json config-4 workload (SAGE, fanout 25/10,
minibatch node classification): a jitted step over the fixed-shape buckets
produced by ``data.sampling.NeighborSampler``. Layer ``k`` of the model
consumes the sampled edge set ``layers[k]`` (output-side first), computing
representations for progressively smaller frontiers — but with static
bucket shapes we simply run each conv over the full node bucket with that
layer's edge mask; masked nodes/edges are neutral so the result equals the
exact layered computation on the sampled subgraph.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..data.sampling import SampledSubgraph
from ..nn.sage_conv import SAGEConv
from .train import TrainState, masked_softmax_cross_entropy

__all__ = ["make_sage_minibatch_step", "subgraph_to_arrays"]


def subgraph_to_arrays(sub: SampledSubgraph, x_global, y_global) -> dict:
    """Slice global features/labels into the bucket's local id space."""
    import numpy as np

    safe = np.maximum(sub.node_map, 0)
    return {
        "x": jnp.asarray(np.asarray(x_global)[safe] * sub.node_mask[:, None]),
        "y_seed": jnp.asarray(np.asarray(y_global)[sub.seed_ids]),
        "seed_mask": jnp.asarray(sub.seed_mask),
        "layers": tuple(
            (jnp.asarray(s), jnp.asarray(r), jnp.asarray(m))
            for s, r, m in sub.layers
        ),
    }


def make_sage_minibatch_step(
    layers: tuple[SAGEConv, ...],
    head_dim: int,
    tx: Any,
    *,
    activation: Callable = jax.nn.relu,
    donate: bool = True,
) -> Callable:
    """Jitted minibatch step for a stack of SAGEConv layers.

    The conv stack runs deepest-first: model layer ``i`` (0-based from the
    input side) uses sampled edge set ``layers[n-1-i]``. The loss reads the
    first ``B`` bucket rows (the seed nodes).
    """
    import optax

    n = len(layers)

    def forward(params, data, training, rng):
        h = data["x"]
        keys = (
            list(jax.random.split(rng, n)) if rng is not None else [None] * n
        )
        for i, layer in enumerate(layers):
            senders, receivers, emask = data["layers"][n - 1 - i]
            ei = jnp.stack([senders, receivers])
            h = layer.apply(
                params[f"layer_{i}"], h, ei, edge_mask=emask,
                training=training, rng=keys[i], indices_are_sorted=True,
            )
            if i < n - 1:
                h = activation(h)
        return h

    def step(state: TrainState, data: dict):
        rng, sub = jax.random.split(state.rng)
        b = data["y_seed"].shape[0]

        def loss_fn(params):
            h = forward(params, data, True, sub)
            logits = h[:b]
            return masked_softmax_cross_entropy(
                logits, data["y_seed"], data["seed_mask"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1, rng=rng),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ()), jax.jit(
        lambda params, data: forward(params, data, False, None)
    )
