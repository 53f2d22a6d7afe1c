"""Minimal GCN forward + one training step on a tiny graph.

Mirror of the reference's simple_gcn_example.py: build one GCNConv, run a
forward pass, take a single gradient step — the smallest end-to-end use of
the functional init/apply API. Runs anywhere (no dataset download).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import keras_geometric_tpu as kgt


def main():
    rng = np.random.default_rng(0)
    num_nodes, num_feats, num_classes = 12, 8, 3
    x = jnp.asarray(rng.standard_normal((num_nodes, num_feats)), jnp.float32)
    edge_index = jnp.asarray(
        np.stack([rng.integers(0, num_nodes, 40),
                  rng.integers(0, num_nodes, 40)]).astype(np.int32)
    )
    y = jnp.asarray(rng.integers(0, num_classes, num_nodes))

    layer = kgt.GCNConv(output_dim=num_classes)
    params = layer.init(jax.random.PRNGKey(0), num_feats)
    out = layer.apply(params, x, edge_index)
    print(f"forward: {out.shape} (expected ({num_nodes}, {num_classes}))")

    def loss_fn(p):
        logits = layer.apply(p, x, edge_index)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(num_nodes), y])

    tx = optax.adam(0.05)
    opt_state = tx.init(params)
    loss0 = float(loss_fn(params))
    for _ in range(20):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    print(f"loss: {loss0:.4f} -> {float(loss_fn(params)):.4f}")
    assert float(loss_fn(params)) < loss0


if __name__ == "__main__":
    main()
