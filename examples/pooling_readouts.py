"""Graph-level readouts: Global, BatchGlobal, Attention, Set2Set, and the
standalone PoolingAggregator.

Mirror of the reference's pooling_example.py: one script exercising every
readout family on a small batch of graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import keras_geometric_tpu as kgt


def main():
    rng = np.random.default_rng(4)
    f = 6

    # --- single-graph readouts -------------------------------------------
    x = jnp.asarray(rng.standard_normal((9, f)), jnp.float32)
    for pooling in ("mean", "max", "sum"):
        out = kgt.GlobalPooling(pooling=pooling).apply({}, x)
        print(f"GlobalPooling({pooling}): {out.shape}")

    attn = kgt.AttentionPooling(attention_dim=16)
    p = attn.init(jax.random.PRNGKey(0), f)
    print(f"AttentionPooling: {attn.apply(p, x).shape}")

    s2s = kgt.Set2Set(output_dim=8, processing_steps=3)
    p = s2s.init(jax.random.PRNGKey(1), f)
    out = s2s.apply(p, x)
    print(f"Set2Set: {out.shape} (lstm_units + F = {8 + f})")

    # --- batched readout over a disjoint-union batch ----------------------
    graphs = []
    for i in range(4):
        n_i = int(rng.integers(3, 8))
        e_i = int(rng.integers(2, 12))
        graphs.append(kgt.GraphData(
            x=rng.standard_normal((n_i, f)).astype(np.float32),
            edge_index=np.stack([
                rng.integers(0, n_i, e_i), rng.integers(0, n_i, e_i)
            ]).astype(np.int32),
            y=np.array([i % 2], np.int32),
        ))
    batch = kgt.batch_graphs(graphs)
    pooled = kgt.BatchGlobalPooling(pooling="mean").apply(
        {}, jnp.asarray(batch.x), jnp.asarray(batch.batch), len(graphs)
    )
    print(f"BatchGlobalPooling over {len(graphs)} graphs: {pooled.shape}")

    # --- standalone learnable pooling aggregation -------------------------
    e = 30
    msgs = jnp.asarray(rng.standard_normal((e, f)), jnp.float32)
    recv = jnp.asarray(np.sort(rng.integers(0, 9, e)).astype(np.int32))
    agg = kgt.PoolingAggregator(units=12)
    p = agg.init(jax.random.PRNGKey(2), f)
    out = agg.apply(p, msgs, recv, 9)
    print(f"PoolingAggregator: {out.shape}")


if __name__ == "__main__":
    main()
