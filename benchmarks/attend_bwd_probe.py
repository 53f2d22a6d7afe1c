"""Decompose the single-permute attend backward at arxiv scale (r3).

History: the r2 sender-grid backward recomputed everything from THREE
random node-table gathers; r3 probes found each additional random gather
in one program costs an allocation-dependent +10-15 ms ("gather
lottery", benchmarks/RESULTS.md), so the backward was restructured to
ONE wide edge permute (this probe's rows time each piece).
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
    v = jnp.asarray(
        rng.standard_normal((e_pad, d)).astype(np.float32), jnp.bfloat16
    )

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:44s} {sec*1e3:8.2f} ms", flush=True)

    # Forward pieces.
    t("take hj [E,256]", lambda h: jnp.take(h, ctx.senders, axis=0), ht)
    t("sddmm+stats fused (r3 two-pass piece)",
      lambda h, j: SD.sddmm_stats_sorted(
        h, j, att, tables=ctx.fwd_tables, num_nodes=ctx.num_nodes,
        edge_valid=ctx.edge_mask), ht, hj)
    t("agg fwd (r3 two-pass piece)",
      lambda s, j: AP.attend_aggregate_sorted(
        s, m, l, j, tables=ctx.fwd_tables), scores, hj)
    t("stats+agg fused (r4 one-pass fwd)",
      lambda h, j: SD.sddmm_stats_agg_sorted(
        h, j, att, tables=ctx.fwd_tables, num_nodes=ctx.num_nodes,
        edge_valid=ctx.edge_mask), ht, hj)

    # Backward pieces.
    t("rho pass (r4)", lambda gg, j: AP.attend_rho_sorted(
        gg, scores, m, l, j, tables=ctx.fwd_tables), g, hj)
    t("recv_bwd_full (dht, datt, v)",
      lambda gg, j: AP.attend_recv_bwd_full_sorted(
          ht, gg, j, att, scores, m, l, rho, tables=ctx.fwd_tables),
      g, hj)
    t("permute v [E,256]", lambda vv: jnp.take(vv, ctx.bwd_perm, axis=0),
      v)
    t("sorted scatter v", lambda vv: K.scatter_sum_sorted(
        vv, ctx.senders_sorted, ctx.num_nodes, tables=ctx.bwd_tables), v)


if __name__ == "__main__":
    main()
