"""Decompose the v2 permutation-free attend backward at arxiv scale."""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import attend_pallas as AP
    from keras_geometric_tpu.kernels import sddmm_pallas as SD
    from keras_geometric_tpu.kernels import softmax_pallas as SM
    from keras_geometric_tpu.ops.csr import prepare_graph
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
    da = jnp.asarray(rng.standard_normal((e_pad, HEADS)), jnp.float32)

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:44s} {sec*1e3:8.2f} ms", flush=True)

    t("sddmm fwd", lambda h, j: SD.sddmm_scores_sorted(
        h, j, att, tables=ctx.expand_tables), ht, hj)
    t("softmax stats", lambda s: SM.softmax_stats_sorted(
        s, ctx.num_nodes, tables=ctx.fwd_tables), scores)
    t("agg fwd", lambda s, j: AP.attend_aggregate_sorted(
        s, m, l, j, tables=ctx.fwd_tables), scores, hj)
    t("alpha_bwd (da, rho)", lambda gg, j: AP.attend_alpha_bwd_sorted(
        gg, scores, m, l, j, tables=ctx.fwd_tables), g, hj)
    t("recv_bwd (dht, datt)", lambda gg, j: AP.attend_recv_bwd_sorted(
        ht, j, att, scores, m, l, rho, da, tables=ctx.fwd_tables),
      g, hj)

    def pack_take3(gg):
        tail, packed = AP.pack_node_sidecar(m, l, rho, ctx.num_nodes,
                                            ht.dtype)
        return (
            jnp.take(gg, ctx.receivers_ss, axis=0),
            jnp.take(ht, ctx.receivers_ss, axis=0),
            jnp.take(tail, ctx.receivers_ss, axis=0),
        )

    t("pack+take x3 (256+256+128)", pack_take3, g)
    g_ss, ht_ss, tail_ss = jax.jit(pack_take3)(g)
    t("sender_bwd kernel", lambda a, b, c: AP.attend_sender_bwd_sorted(
        ht, a, b, c, att, tables=ctx.bwd_tables, packed=True,
        mask_ss=ctx.edge_mask_ss), g_ss, ht_ss, tail_ss)
    t("take [E,256] anchor",
      lambda h: jnp.take(h, ctx.receivers_ss, axis=0), ht)

    # old-path anchors
    t("agg_bwd v1 (da, dhj, rho)", lambda gg, j: AP.attend_agg_bwd_sorted(
        gg, scores, m, l, j, tables=ctx.fwd_tables), g, hj)
    t("score_bwd v1 (dpre, datt)",
      lambda j: AP.attend_score_bwd_sorted(
          ht, j, att, scores, m, l, rho, da, tables=ctx.expand_tables),
      hj)


if __name__ == "__main__":
    main()
