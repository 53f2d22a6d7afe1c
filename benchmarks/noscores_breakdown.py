"""r5: piece-wise timing of the no-score-cache attention pipeline at
ec=512 vs 1024 (the e2e probe showed 51.7 vs 66.8 ms — find the ec=1024
regression; r4 cached-mode pieces for reference: fwd 13.3, rho 4.4,
recv 11.4, permute ~15.9, scatter 2.2)."""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import attend_pallas as AP
    from keras_geometric_tpu.kernels import sddmm_pallas as SD
    from keras_geometric_tpu.kernels import spmm_pallas as K
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
        print(f"{name:56s} {sec*1e3:8.2f} ms", flush=True)

    for ec in (512, 1024):
        ctx = prepare_graph(ei, N, add_self_loops=True, edge_chunk=ec)
        e_pad = int(ctx.senders.shape[0])
        hj = jnp.asarray(
            rng.standard_normal((e_pad, d)).astype(np.float32),
            jnp.bfloat16,
        )
        m = jnp.asarray(
            rng.standard_normal((ctx.num_nodes, HEADS)), jnp.float32
        )
        l = jnp.asarray(
            1.0 + rng.random((ctx.num_nodes, HEADS)), jnp.float32
        )
        nb = ctx.fwd_tables.bounds.shape[0]
        rho = jnp.asarray(
            rng.standard_normal(
                (nb * ctx.fwd_tables.row_block, HEADS)
            ),
            jnp.float32,
        )
        mask = ctx.edge_mask.astype(jnp.float32)

        t(f"[ec={ec}] fwd fused NO scores",
          lambda h, j, c=ctx: SD.sddmm_stats_agg_sorted(
              h, j, att, tables=c.fwd_tables, num_nodes=c.num_nodes,
              edge_valid=c.edge_mask, emit_scores=False), ht, hj)
        t(f"[ec={ec}] rho recompute",
          lambda gg, j, c=ctx, mk=mask: AP.attend_rho_sorted(
              gg, None, m, l, j, tables=c.fwd_tables, rows=ht, att=att,
              edge_valid=mk), g, hj)
        t(f"[ec={ec}] recv recompute (emit_v)",
          lambda gg, j, c=ctx, r=rho, mk=mask:
          AP.attend_recv_bwd_full_sorted(
              ht, gg, j, att, None, m, l, r, tables=c.fwd_tables,
              edge_valid=mk), g, hj)
        v = jnp.asarray(
            rng.standard_normal((e_pad, d)).astype(np.float32),
            jnp.bfloat16,
        )
        t(f"[ec={ec}] permute v", lambda vv, c=ctx:
          jnp.take(vv, c.bwd_perm, axis=0), v)
        t(f"[ec={ec}] sorted scatter", lambda vv, c=ctx:
          K.scatter_sum_sorted(vv, c.senders_sorted, c.num_nodes,
                               tables=c.bwd_tables), v)


if __name__ == "__main__":
    main()
