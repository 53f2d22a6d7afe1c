"""GATv2 multi-head attention on a citation graph (BASELINE config 2 shape).

Trains an 8-head GATv2 encoder on (synthetic) CiteSeer and inspects the
learned attention distribution — the reference ships a GATv2 demo script in
examples/ (SURVEY.md §2.2); this is its TPU-native analog.

Usage: python examples/gatv2_attention.py [--epochs 50]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import keras_geometric_tpu as kgt
from keras_geometric_tpu.data.datasets import synthetic_planetoid
from keras_geometric_tpu.models import GAT
from keras_geometric_tpu.training import (
    TrainState,
    make_eval_fn,
    make_node_classification_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=8)
    args = ap.parse_args()

    g = synthetic_planetoid("citeseer")
    x = jnp.asarray(g.x)
    ei = jnp.asarray(g.edge_index)
    y = jnp.asarray(g.y)
    num_classes = int(g.y.max()) + 1
    print(f"citeseer: {x.shape[0]} nodes, {ei.shape[1]} edges")

    # 8-head hidden layer (concat), mean-headed output layer.
    encoder = GAT(
        hidden_dims=(args.hidden, num_classes),
        heads=args.heads,
        dropout_rate=0.3,
    )
    # Output layer averages heads (like the GAT paper's final layer).
    params = encoder.init(jax.random.PRNGKey(0), x.shape[1])
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_node_classification_step(encoder, tx)
    evaluate = make_eval_fn(encoder)

    train_mask = jnp.asarray(g.train_mask)
    val_mask = jnp.asarray(g.val_mask)
    for epoch in range(args.epochs):
        state, loss = step(state, x, ei, y, train_mask)
        if (epoch + 1) % 10 == 0:
            acc = evaluate(state.params, x, ei, y, val_mask)
            print(f"epoch {epoch+1:3d}  loss {float(loss):.4f}  val {float(acc):.3f}")

    # Inspect attention of the first layer on a few edges.
    layer = kgt.GATv2Conv(
        output_dim=args.hidden, heads=args.heads, add_self_loops=True
    )
    _, alpha = layer.apply(
        state.params["layer_0"], x, ei, return_attention=True
    )
    alpha = np.asarray(alpha)
    print(
        f"attention: shape {alpha.shape}, head-0 stats "
        f"min {alpha[:,0].min():.4f} max {alpha[:,0].max():.4f} "
        f"mean {alpha[:,0].mean():.4f}"
    )
    print(f"test accuracy: {float(evaluate(state.params, x, ei, y, jnp.asarray(g.test_mask))):.3f}")


if __name__ == "__main__":
    main()
