"""Minimal GATv2Conv usage: heads, concat vs mean, attention weights.

Mirror of the reference's simple_gatv2_example.py on the functional API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import keras_geometric_tpu as kgt


def main():
    rng = np.random.default_rng(3)
    n, f = 10, 6
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    ei = jnp.asarray(
        np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)])
        .astype(np.int32)
    )

    concat = kgt.GATv2Conv(output_dim=8, heads=4, concat=True)
    params = concat.init(jax.random.PRNGKey(0), f)
    out = concat.apply(params, x, ei)
    print(f"heads=4 concat: {out.shape} (H*F = 32)")

    mean = kgt.GATv2Conv(output_dim=8, heads=4, concat=False)
    params_m = mean.init(jax.random.PRNGKey(0), f)
    out_m = mean.apply(params_m, x, ei)
    print(f"heads=4 mean:   {out_m.shape} (F = 8)")

    # Attention weights sum to 1 over each receiver's incoming edges.
    out, alpha = concat.apply(params, x, ei, return_attention=True)
    ei_sl, _ = kgt.add_self_loops(ei, n)
    recv = np.asarray(ei_sl[1])
    sums = np.zeros((n, 4), np.float32)
    np.add.at(sums, recv, np.asarray(alpha))
    print(f"attention column sums ~1: max dev "
          f"{float(np.abs(sums - 1).max()):.2e}")


if __name__ == "__main__":
    main()
