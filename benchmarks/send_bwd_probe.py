"""r5 probe: sender-grid recompute backward vs the r3/r4 single-permute.

Round-5 findings (this probe, real TPU):

- Probe v1: the ADVICE-r4 "NaN-safe" dependency zero
  (``nan_to_num(t)*0``) is provably finite, so XLA folds it and DELETES
  the chain — the three "chained" gathers co-scheduled at ~9.3 ms each
  (27.9 total). chain_after (optimization_barrier) restores a real
  dependency.
- The r4 lottery probe's ~0.1 ms marginal takes were scalar-REDUCED
  gathers that XLA fused into one loop; materializing [E, D] takes do
  not fuse that way. Probe v2 times the fusion-shaped alternative: ONE
  concat-of-takes with the same index vector (three gathers inside one
  output fusion), plus a source-width cliff sweep.
"""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import attend_pallas as AP
    from keras_geometric_tpu.kernels import spmm_pallas as K
    from keras_geometric_tpu.ops.csr import chain_after, prepare_graph
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
    stats = jnp.concatenate([m, l, rho[:N]], axis=1)  # [N, 3K] f32

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:52s} {sec*1e3:8.2f} ms", flush=True)

    idx = ctx.receivers_ss

    t("solo take g [N,256]bf16", lambda a: jnp.take(a, idx, axis=0), g)

    def barrier_chain(a, b, c):
        g_r = jnp.take(a, idx, axis=0)
        i2 = chain_after(idx, g_r)
        ht_r = jnp.take(b, i2, axis=0)
        i3 = chain_after(idx, ht_r)
        st_r = jnp.take(c, i3, axis=0)
        return g_r, ht_r, st_r

    t("three takes, barrier-chained", barrier_chain, g, ht, stats)

    # One concat-of-takes, same index: can XLA fuse them into one loop?
    st_hi = stats.astype(jnp.bfloat16)
    st_lo = (stats - st_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    st2 = jnp.concatenate([st_hi, st_lo], axis=1)  # [N, 6K] bf16 split2

    def concat_take(a, b, c):
        return jnp.concatenate(
            [jnp.take(a, idx, axis=0), jnp.take(b, idx, axis=0),
             jnp.take(c, idx, axis=0)], axis=1,
        )

    t("concat of three takes (one [E,536] out)", concat_take, g, ht, st2)

    # Pre-packed single-source take: width/cliff sweep.
    for lanes in (256, 320, 384, 512):
        src = jnp.asarray(
            rng.standard_normal((ctx.num_nodes, lanes)).astype(np.float32),
            jnp.bfloat16,
        )
        mb = ctx.num_nodes * lanes * 2 / 1e6
        t(f"packed take [N,{lanes}]bf16 src={mb:.0f}MB",
          lambda s: jnp.take(s, idx, axis=0), src)

    # Full new backward with everything strictly serialized.
    def bwd_new(gg, h, j):
        rr = AP.attend_rho_sorted(gg, scores, m, l, j,
                                  tables=ctx.fwd_tables)
        dht, datt = AP.attend_recv_bwd_full_sorted(
            h, gg, j, att, scores, m, l, rr, tables=ctx.fwd_tables,
            emit_v=False)
        st = jnp.concatenate([m, l, rr[:N]], axis=1)
        i1 = chain_after(idx, dht)
        g_r = jnp.take(gg, i1, axis=0)
        i2 = chain_after(idx, g_r)
        ht_r = jnp.take(h, i2, axis=0)
        i3 = chain_after(idx, ht_r)
        st_r = jnp.take(st, i3, axis=0)
        dsend = AP.attend_send_bwd_sorted(
            h, g_r, ht_r, st_r, att, tables=ctx.bwd_tables,
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

    t("FULL bwd NEW (barrier-serialized)", bwd_new, g, ht, hj)
    t("FULL bwd OLD (rho+recv_full+perm+scat)", bwd_old, g, ht, hj)

    def loss(h, a):
        return jnp.sum(ctx.attend(h, a) ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gfn(ht, att)[0].block_until_ready()
    sec = timed_steps(lambda: gfn(ht, att), k_lo=2, k_hi=8)
    print(f"{'END-TO-END attend fwd+bwd (new path)':52s} "
          f"{sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
