"""Graph classification with GIN + batched pooling (BASELINE.json config 3).

TPU-native analog of the reference's GIN graph-classification integration
test (tests/integration/test_model_integration.py:124-161): batches of
small synthetic graphs, disjoint-union-batched into *padded static-shape*
buckets (one jit compile for the whole run), 5-layer GIN encoder, sum
readout, dense head.

Usage: python examples/graph_classification.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_geometric_tpu.data.datasets import synthetic_graph
from keras_geometric_tpu.models import GIN, GraphClassifier
from keras_geometric_tpu.training import TrainState
from keras_geometric_tpu.utils.data_utils import batch_graphs_padded


def make_dataset(num_graphs=200, num_classes=3, seed=0):
    """Graphs whose class is encoded in edge density + a feature motif."""
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for i in range(num_graphs):
        c = int(rng.integers(num_classes))
        n = int(rng.integers(10, 24))
        e = n * (2 + 2 * c)  # class-dependent density
        g = synthetic_graph(n, e, 8, seed=int(rng.integers(1 << 31)))
        g.x[:, c] += 1.5  # class-dependent feature motif
        graphs.append(g)
        labels.append(c)
    for g, c in zip(graphs, labels):
        g.y = np.array([c], np.int32)
    return graphs, np.array(labels, np.int32), num_classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=32)
    args = ap.parse_args()

    graphs, labels, num_classes = make_dataset()
    n_train = 160
    model = GraphClassifier(
        encoder=GIN(
            hidden_dims=(args.hidden,) * 5, mlp_hidden=(args.hidden,)
        ),
        num_classes=num_classes,
        readout="sum",
    )
    params = model.init(jax.random.PRNGKey(0), 8)
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))

    # Fixed bucket sizes -> every batch compiles to the same program.
    node_bucket = 24 * args.batch_size
    edge_bucket = 24 * 8 * args.batch_size

    def batch_to_arrays(batch_graph_list):
        g = batch_graphs_padded(
            batch_graph_list, node_bucket=node_bucket, edge_bucket=edge_bucket
        )
        num_graphs = args.batch_size + 1  # +1 dummy graph for padded nodes
        y = np.full(num_graphs, -1, np.int32)
        for i, bg in enumerate(batch_graph_list):
            y[i] = int(bg.y[0])
        return g, jnp.asarray(y), num_graphs

    @jax.jit
    def train_step(state, x, senders, receivers, batch_vec, edge_mask,
                   node_mask, y):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(p):
            logits = model.apply(
                p, x, jnp.stack([senders, receivers]), batch_vec,
                args.batch_size + 1, edge_mask=edge_mask,
                node_mask=node_mask, training=True, rng=sub,
            )
            valid = y >= 0
            logp = jax.nn.log_softmax(logits)
            safe_y = jnp.maximum(y, 0)
            nll = -jnp.take_along_axis(logp, safe_y[:, None], axis=-1)[:, 0]
            return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(optax.apply_updates(state.params, updates), opt_state,
                       state.step + 1, rng),
            loss,
        )

    @jax.jit
    def predict(params, x, senders, receivers, batch_vec, edge_mask, node_mask):
        logits = model.apply(
            params, x, jnp.stack([senders, receivers]), batch_vec,
            args.batch_size + 1, edge_mask=edge_mask, node_mask=node_mask,
        )
        return jnp.argmax(logits, axis=-1)

    rng = np.random.default_rng(0)
    order = np.arange(n_train)
    start = time.time()
    for epoch in range(args.epochs):
        rng.shuffle(order)
        losses = []
        for i in range(0, n_train - args.batch_size + 1, args.batch_size):
            chunk = [graphs[j] for j in order[i : i + args.batch_size]]
            g, y, _ = batch_to_arrays(chunk)
            state, loss = train_step(
                state, g.x, g.senders, g.receivers, g.batch, g.edge_mask,
                g.node_mask, y,
            )
            losses.append(float(loss))
        if (epoch + 1) % 10 == 0:
            print(f"epoch {epoch+1:3d}  loss {np.mean(losses):.4f}")

    # Test accuracy.
    correct = total = 0
    for i in range(n_train, len(graphs) - args.batch_size + 1, args.batch_size):
        chunk = graphs[i : i + args.batch_size]
        g, y, _ = batch_to_arrays(chunk)
        pred = predict(
            state.params, g.x, g.senders, g.receivers, g.batch, g.edge_mask,
            g.node_mask,
        )
        valid = np.asarray(y) >= 0
        correct += int(((np.asarray(pred) == np.asarray(y)) & valid).sum())
        total += int(valid.sum())
    print(f"training took {time.time()-start:.1f}s")
    print(f"test accuracy: {correct / max(total,1):.3f}")


if __name__ == "__main__":
    main()
