"""Does row_block=512 help the r4 one-pass attention kernels?

The fused stats+agg forward and the recv backward are per-grid-item
bound; rb=512 halves the block count (fewer boundary chunks, fewer
items) at the cost of bigger block-resident tables. r3 swept rb for the
OLD kernels (256 optimal); the r4 kernels have different scratch
shapes, so re-measure.
"""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import attend_pallas as AP
    from keras_geometric_tpu.kernels import sddmm_pallas as SD
    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    ei = np.stack([
        rng.integers(0, N, 2 * E_HALF), rng.integers(0, N, 2 * E_HALF)
    ]).astype(np.int32)
    d = HEADS * FDIM

    ht = jnp.asarray(
        rng.standard_normal((N, d)).astype(np.float32), jnp.bfloat16
    )
    att = jnp.asarray(
        rng.standard_normal((HEADS, FDIM)).astype(np.float32), jnp.bfloat16
    )
    g = jnp.asarray(
        rng.standard_normal((N, d)).astype(np.float32), jnp.bfloat16
    )

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:40s} {sec*1e3:8.2f} ms", flush=True)

    for rb in (256, 512):
        ctx = prepare_graph(
            ei, N, add_self_loops=True, scatter_row_block=rb,
        )
        e_pad = int(ctx.senders.shape[0])
        hj = jnp.asarray(
            rng.standard_normal((e_pad, d)).astype(np.float32),
            jnp.bfloat16,
        )
        scores = jnp.asarray(
            rng.standard_normal((e_pad, HEADS)).astype(np.float32)
        )
        m = jnp.asarray(
            rng.standard_normal((ctx.num_nodes, HEADS)), jnp.float32
        )
        l = jnp.asarray(
            1.0 + rng.random((ctx.num_nodes, HEADS)), jnp.float32
        )
        nb = ctx.fwd_tables.bounds.shape[0]
        rho = jnp.asarray(
            rng.standard_normal((nb * rb, HEADS)), jnp.float32
        )
        t(f"rb={rb} stats+agg fused fwd",
          lambda h, j, c=ctx: SD.sddmm_stats_agg_sorted(
              h, j, att, tables=c.fwd_tables, num_nodes=c.num_nodes,
              edge_valid=c.edge_mask), ht, hj)
        t(f"rb={rb} rho pass",
          lambda gg, j, c=ctx: AP.attend_rho_sorted(
              gg, scores, m, l, j, tables=c.fwd_tables), g, hj)
        t(f"rb={rb} recv_bwd_full",
          lambda gg, j, c=ctx, r=rho: AP.attend_recv_bwd_full_sorted(
              ht, gg, j, att, scores, m, l, r, tables=c.fwd_tables),
          g, hj)


if __name__ == "__main__":
    main()
