"""GraphSAGE minibatch training with neighbor sampling (BASELINE config 4).

SAGE fanout-(25, 10) minibatch node classification on (synthetic)
ogbn-arxiv: host-side fixed-shape neighbor sampling overlapped with device
steps via a prefetch thread; one jit compile for the whole run.

Usage: python examples/sage_minibatch.py [--epochs 3] [--batch-size 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np
import optax

from keras_geometric_tpu.data.datasets import OGBNodeDataset
from keras_geometric_tpu.data.sampling import NeighborSampler, prefetch
from keras_geometric_tpu.nn.sage_conv import SAGEConv
from keras_geometric_tpu.training import TrainState
from keras_geometric_tpu.training.sage_minibatch import (
    make_sage_minibatch_step,
    subgraph_to_arrays,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--fanouts", type=int, nargs="+", default=[25, 10])
    args = ap.parse_args()

    ds = OGBNodeDataset("ogbn-arxiv", synthetic=True)
    x = np.asarray(ds.x)
    y = np.asarray(ds.y)
    senders, receivers = ds.edges()
    edge_index = np.stack([np.asarray(senders), np.asarray(receivers)])
    split = ds.split_idx()
    print(
        f"ogbn-arxiv: {ds.num_nodes} nodes, {ds.num_edges} edges, "
        f"{ds.num_feats} feats, {ds.num_classes} classes "
        f"(train {len(split['train'])})"
    )

    sampler = NeighborSampler(
        edge_index, ds.num_nodes, tuple(args.fanouts), seed=0
    )
    layers = (
        SAGEConv(output_dim=args.hidden),
        SAGEConv(output_dim=ds.num_classes, activation=None),
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "layer_0": layers[0].init(k1, ds.num_feats),
        "layer_1": layers[1].init(k2, args.hidden),
    }
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx, key)
    step, infer = make_sage_minibatch_step(layers, ds.num_classes, tx)

    train_nodes = split["train"]
    for epoch in range(args.epochs):
        t0 = time.time()
        losses, n_batches = [], 0
        it = prefetch(
            (
                subgraph_to_arrays(sub, x, y)
                for sub in sampler.epoch(train_nodes, args.batch_size)
            ),
            depth=2,
        )
        for data in it:
            state, loss = step(state, data)
            losses.append(loss)
            n_batches += 1
        losses = [float(l) for l in losses]
        print(
            f"epoch {epoch + 1}: loss {np.mean(losses):.4f} "
            f"({n_batches} batches, {time.time() - t0:.1f}s)"
        )

    # Eval on a sampled subset of validation nodes.
    correct = total = 0
    for sub in sampler.epoch(split["valid"][:4096], args.batch_size):
        data = subgraph_to_arrays(sub, x, y)
        logits = infer(state.params, data)[: args.batch_size]
        pred = np.argmax(np.asarray(logits), axis=-1)
        valid = np.asarray(data["seed_mask"])
        correct += int(((pred == np.asarray(data["y_seed"])) & valid).sum())
        total += int(valid.sum())
    print(f"valid accuracy (sampled): {correct / max(total, 1):.3f}")


if __name__ == "__main__":
    main()
