"""Node classification with a 2-layer GCN — the framework's canonical flow.

TPU-native analog of the reference tutorial
(/root/reference/docs/tutorials/node_classification.md:95-183): build a
2-layer GCN, train with masked softmax cross-entropy on the train split,
report val/test accuracy. Runs on the real Planetoid Cora when network is
available, otherwise on a synthetic stand-in with the same shape profile.

Usage:  python examples/node_classification.py [--dataset cora] [--epochs 100]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import keras_geometric_tpu as kgt
from keras_geometric_tpu.data.datasets import synthetic_planetoid


def load_graph(name: str):
    try:
        classes = kgt.get_dataset_classes()
        cls = {
            "cora": classes["CoraDataset"],
            "citeseer": classes["CiteSeerDataset"],
            "pubmed": classes["PubMedDataset"],
        }[name]
        ds = cls(root="data")
        g = ds[0]
        if not hasattr(g, "train_mask"):
            raise AttributeError
        return g, ds.num_classes
    except Exception:
        print(f"[offline] using synthetic {name} stand-in")
        g = synthetic_planetoid(name)
        return g, int(g.y.max()) + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--dropout", type=float, default=0.5)
    args = ap.parse_args()

    graph, num_classes = load_graph(args.dataset)
    x = jnp.asarray(graph.x)
    edge_index = jnp.asarray(graph.edge_index)
    y = jnp.asarray(graph.y)
    train_mask = jnp.asarray(graph.train_mask)
    val_mask = jnp.asarray(graph.val_mask)
    test_mask = jnp.asarray(graph.test_mask)
    print(
        f"{args.dataset}: {x.shape[0]} nodes, {edge_index.shape[1]} edges, "
        f"{x.shape[1]} features, {num_classes} classes"
    )

    # Preprocess once (self-loops + GCN norm + dual CSR orientations); on
    # TPU this routes aggregation through the Pallas SpMM kernels.
    use_context = jax.default_backend() not in ("cpu", "gpu")
    context = None
    if use_context:
        from keras_geometric_tpu.ops.csr import prepare_graph

        context = prepare_graph(
            np.asarray(edge_index), x.shape[0],
            add_self_loops=True, gcn_normalize=True,
        )
        # for_context sets add_self_loops=False, normalize=False —
        # those are folded into prepare_graph above.
        conv1 = kgt.GCNConv.for_context(
            output_dim=args.hidden, dropout_rate=args.dropout
        )
        conv2 = kgt.GCNConv.for_context(output_dim=num_classes)
    else:
        conv1 = kgt.GCNConv(
            output_dim=args.hidden, dropout_rate=args.dropout
        )
        conv2 = kgt.GCNConv(output_dim=num_classes)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "conv1": conv1.init(k1, x.shape[1]),
        "conv2": conv2.init(k2, args.hidden),
    }

    def forward(params, x, training=False, rng=None):
        h = conv1.apply(params["conv1"], x, edge_index, training=training,
                        rng=rng, context=context)
        h = jax.nn.relu(h)
        return conv2.apply(params["conv2"], h, edge_index, context=context)

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    def loss_fn(params, rng):
        logits = forward(params, x, training=True, rng=rng)
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.sum(losses * train_mask) / jnp.sum(train_mask)

    @jax.jit
    def train_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, mask):
        pred = jnp.argmax(forward(params, x), axis=-1)
        return jnp.sum((pred == y) * mask) / jnp.sum(mask)

    start = time.time()
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if (epoch + 1) % 20 == 0:
            print(
                f"epoch {epoch + 1:3d}  loss {float(loss):.4f}  "
                f"train {float(accuracy(params, train_mask)):.3f}  "
                f"val {float(accuracy(params, val_mask)):.3f}"
            )
    print(f"training took {time.time() - start:.1f}s")
    print(f"test accuracy: {float(accuracy(params, test_mask)):.3f}")


if __name__ == "__main__":
    main()
