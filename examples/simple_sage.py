"""Minimal SAGEConv usage: all six aggregators, root weight, L2 normalize.

Mirror of the reference's simple_sage_example.py on the functional API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import keras_geometric_tpu as kgt


def main():
    rng = np.random.default_rng(2)
    n, f = 14, 5
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    ei = jnp.asarray(
        np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
        .astype(np.int32)
    )

    for agg in ("mean", "max", "sum", "min", "std", "pooling"):
        layer = kgt.SAGEConv(output_dim=8, aggregator=agg)
        params = layer.init(jax.random.PRNGKey(0), f)
        out = layer.apply(params, x, ei)
        print(f"SAGEConv(aggregator={agg!r}): {out.shape}")

    normed = kgt.SAGEConv(output_dim=8, normalize=True)
    params = normed.init(jax.random.PRNGKey(1), f)
    out = normed.apply(params, x, ei)
    norms = jnp.linalg.norm(out, axis=-1)
    print(f"L2-normalized row norms: min={float(norms.min()):.3f} "
          f"max={float(norms.max()):.3f}")

    no_root = kgt.SAGEConv(output_dim=8, root_weight=False)
    params = no_root.init(jax.random.PRNGKey(2), f)
    assert "lin_self" not in params
    print("root_weight=False drops lin_self as expected")


if __name__ == "__main__":
    main()
