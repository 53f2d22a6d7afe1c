"""Minimal GINConv usage: MLP depth, trainable epsilon, aggregators.

Mirror of the reference's simple_gin_example.py on the functional API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import keras_geometric_tpu as kgt


def main():
    rng = np.random.default_rng(1)
    n, f = 10, 6
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    ei = jnp.asarray(
        np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)])
        .astype(np.int32)
    )

    for kwargs in (
        {"mlp_hidden": ()},
        {"mlp_hidden": (32,), "aggregator": "mean"},
        {"mlp_hidden": (32, 32), "train_eps": True, "eps_init": 0.1},
    ):
        layer = kgt.GINConv(output_dim=4, **kwargs)
        params = layer.init(jax.random.PRNGKey(0), f)
        out = layer.apply(params, x, ei)
        grads = jax.grad(
            lambda p: jnp.sum(layer.apply(p, x, ei) ** 2)
        )(params)
        n_params = sum(
            g.size for g in jax.tree_util.tree_leaves(grads)
        )
        print(f"GINConv({kwargs}): out {out.shape}, {n_params} params, "
              f"grads finite={all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads))}")

    # Config round-trip (parity with Keras get_config/from_config).
    layer = kgt.GINConv(output_dim=4, mlp_hidden=(16,), train_eps=True)
    clone = kgt.GINConv.from_config(layer.get_config())
    assert clone == layer
    print("config round-trip ok")


if __name__ == "__main__":
    main()
