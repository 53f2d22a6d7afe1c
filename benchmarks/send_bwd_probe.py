"""r5 probe: sender-grid recompute backward vs the r3/r4 single-permute.

The r4 synthesis (benchmarks/RESULTS.md) showed the "multi-gather
lottery" that justified deleting the r2 sender-grid path was really XLA
co-scheduling of independent gathers; chained same-index N-row gathers
are ~free after the first (~4.7 ms for three), while the [E, 256]
permute's source sits beyond the ~128 MB cliff (~15.9 ms). This probe
times the r5 pieces and both end-to-end backward chains at arxiv scale.
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
    from keras_geometric_tpu.kernels import spmm_pallas as K
    from keras_geometric_tpu.ops.csr import dep_zero, prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    ei = np.stack([
        rng.integers(0, N, 2 * E_HALF), rng.integers(0, N, 2 * E_HALF)
    ]).astype(np.int32)
    ctx = prepare_graph(ei, N, add_self_loops=True)
    e_pad = int(ctx.senders.shape[0])
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
    hj = jnp.asarray(
        rng.standard_normal((e_pad, d)).astype(np.float32), jnp.bfloat16
    )
    scores = jnp.asarray(
        rng.standard_normal((e_pad, HEADS)).astype(np.float32)
    )
    m = jnp.asarray(rng.standard_normal((ctx.num_nodes, HEADS)), jnp.float32)
    l = jnp.asarray(
        1.0 + rng.random((ctx.num_nodes, HEADS)), jnp.float32
    )
    nb = ctx.fwd_tables.bounds.shape[0]
    rho = jnp.asarray(
        rng.standard_normal((nb * ctx.fwd_tables.row_block, HEADS)),
        jnp.float32,
    )

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:46s} {sec*1e3:8.2f} ms", flush=True)

    # New pieces in isolation.
    t("recv_bwd slim (dht, datt; no v)",
      lambda gg, j: AP.attend_recv_bwd_full_sorted(
          ht, gg, j, att, scores, m, l, rho, tables=ctx.fwd_tables,
          emit_v=False),
      g, hj)

    def chained_gathers(gg, h, mm, ll, rr):
        g_r = jnp.take(gg, ctx.receivers_ss, axis=0)
        idx2 = ctx.receivers_ss + dep_zero(g_r)
        ht_r = jnp.take(h, idx2, axis=0)
        stats = jnp.concatenate([mm, ll, rr[: mm.shape[0]]], axis=1)
        idx3 = idx2 + dep_zero(ht_r)
        stats_r = jnp.take(stats, idx3, axis=0)
        return g_r, ht_r, stats_r

    t("three chained gathers (g, ht, stats)", chained_gathers,
      g, ht, m, l, rho)

    g_r, ht_r, stats_r = jax.jit(chained_gathers)(g, ht, m, l, rho)
    g_r, ht_r, stats_r = map(jax.device_put, (g_r, ht_r, stats_r))

    t("send pass (recompute + scatter)",
      lambda a, b, c: AP.attend_send_bwd_sorted(
          ht, a, b, c, att, tables=ctx.bwd_tables,
          valid_ss=ctx.edge_mask_ss),
      g_r, ht_r, stats_r)

    # Full backward chains (one jit each).
    def bwd_new(gg, h, j):
        rr = AP.attend_rho_sorted(gg, scores, m, l, j,
                                  tables=ctx.fwd_tables)
        dht, datt = AP.attend_recv_bwd_full_sorted(
            h, gg, j, att, scores, m, l, rr, tables=ctx.fwd_tables,
            emit_v=False)
        a, b, c = chained_gathers(gg, h, m, l, rr)
        dsend = AP.attend_send_bwd_sorted(
            h, a, b, c, att, tables=ctx.bwd_tables,
            valid_ss=ctx.edge_mask_ss)
        return dht[:N] + dsend[:N], datt

    def bwd_old(gg, h, j):
        rr = AP.attend_rho_sorted(gg, scores, m, l, j,
                                  tables=ctx.fwd_tables)
        dht, datt, v = AP.attend_recv_bwd_full_sorted(
            h, gg, j, att, scores, m, l, rr, tables=ctx.fwd_tables)
        dsend = K.scatter_sum_sorted(
            jnp.take(v, ctx.bwd_perm, axis=0), ctx.senders_sorted,
            ctx.num_nodes, tables=ctx.bwd_tables)
        return dht[:N] + dsend[:N], datt

    t("FULL bwd chain NEW (rho+recv_slim+gath+send)", bwd_new, g, ht, hj)
    t("FULL bwd chain OLD (rho+recv_full+perm+scat)", bwd_old, g, ht, hj)

    # End-to-end fused attend grad through the public API (new path).
    def loss(h, a):
        return jnp.sum(ctx.attend(h, a) ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gfn(ht, att)[0].block_until_ready()
    sec = timed_steps(lambda: gfn(ht, att), k_lo=2, k_hi=8)
    print(f"{'END-TO-END attend fwd+bwd (new path)':46s} "
          f"{sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
