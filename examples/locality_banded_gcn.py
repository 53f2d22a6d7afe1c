"""Locality pipeline demo: reorder + banded-dense SpMM on a community graph.

Real citation/social graphs have community structure; this example shows
the round-3 preprocessing that exploits it (docs/kernels.md):

1. generate a scrambled community power-law graph (a stand-in for a
   real-world edge list with arbitrary node ids);
2. recover the latent locality with LPA cluster reordering;
3. prepare a banded GraphContext — the majority of edges become dense
   MXU matmuls with no gather at all — and train a 2-layer GCN on it.

Usage: python examples/locality_banded_gcn.py [--nodes 20000]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_geometric_tpu.data.datasets.synthetic import community_graph
from keras_geometric_tpu.models import GNNEncoder
from keras_geometric_tpu.nn.module import get_activation
from keras_geometric_tpu.ops import reorder
from keras_geometric_tpu.ops.csr import prepare_graph
from keras_geometric_tpu.training import TrainState


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20_000)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    n = args.nodes
    e = 12 * n
    classes = 16
    ei = community_graph(n, e, community_size=256, seed=0)
    s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)

    # Labels follow the latent communities — learnable signal.
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 64)).astype(np.float32)

    t0 = time.time()
    order = reorder.cluster_order(s, r, n)
    inv = reorder.invert_order(order)
    print(f"cluster_order: {time.time() - t0:.1f}s  "
          f"band coverage (|s-r| <= 512): "
          f"{reorder.band_coverage(inv[s], inv[r], windows=(1024,))[1024]:.2f}")

    ctx = prepare_graph(
        np.stack([inv[s], inv[r]]), n,
        add_self_loops=True, gcn_normalize=True, symmetric=True,
        densify_self_loops=True, pad_nodes=True, attend_full_stream=False,  # GCN-only demo
        band_window=1024,
    )
    print(f"band edges: {ctx.num_band_edges} "
          f"({ctx.num_band_edges / ctx.num_edges:.1%}); "
          f"residual: {ctx.num_real_edges}")

    # Node features/labels follow the SAME relabeling as the edges.
    x = np.pad(x[order], ((0, ctx.num_nodes - n), (0, 0)))
    labels = np.zeros(ctx.num_nodes, np.int32)
    lpa = reorder.lpa_labels(inv[s], inv[r], n)
    labels[:n] = (np.unique(lpa, return_inverse=True)[1] % classes)
    y = jnp.asarray(labels)
    mask = jnp.asarray(np.arange(ctx.num_nodes) < n)

    # for_context folds the GraphContext flag requirements in
    # (add_self_loops=False, normalize=False) — see GCNConv.for_context.
    enc = GNNEncoder.for_context(conv="gcn", hidden_dims=(64, classes))
    params = enc.init(jax.random.PRNGKey(0), 64)
    tx = optax.adam(1e-2)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    xj = jnp.asarray(x)
    band_arr = ctx.band.band
    ctx = ctx._replace(band=ctx.band._replace(band=None))

    def forward(p, x, band):
        c = ctx._replace(band=ctx.band._replace(band=band))
        h = x
        for i, layer in enumerate(enc._layers()):
            h = layer.apply(p[f"layer_{i}"], h, context=c)
            if i < len(enc._layers()) - 1:
                h = get_activation(enc.activation)(h)
        return h

    @jax.jit
    def step(state, x, band):
        def loss_fn(p):
            logp = jax.nn.log_softmax(forward(p, x, band))
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = mask.astype(nll.dtype)
            return jnp.sum(nll * m) / jnp.sum(m)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state, step=state.step + 1, rng=state.rng,
            ),
            loss,
        )

    for epoch in range(args.epochs):
        state, loss = step(state, xj, band_arr)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}")
    pred = jnp.argmax(forward(state.params, xj, band_arr), axis=-1)
    acc = float(
        jnp.sum((pred == y) & mask) / jnp.maximum(jnp.sum(mask), 1)
    )
    print(f"train accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
