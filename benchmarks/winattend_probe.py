"""r5: banded-attention backward — windowed scatter vs single permute.

Three measurements at ogbn-arxiv scale on the community power-law graph
(LPA-reordered, the skewed perf_suite workload):

1. Take-cost vs INDEX COUNT from a fixed over-cliff [E, 256] bf16
   source — the residual-permute pricing assumption (the r4 cliff table
   varied the SOURCE at fixed indices; this is the complement).
2. The windowed finish in isolation (window_scatter_sum + residual take
   + residual sorted scatter) vs the old permute + full sorted scatter.
3. End-to-end GATv2 4h fwd+bwd: ctx without vs with attend_window=1024.

Canary first: a solo take whose r4/r5 baseline is ~4.3 ms — if it reads
3x that, the relay is in its degraded mode and the numbers are void.
"""

from __future__ import annotations

import numpy as np

N, E = 169_343, 1_166_242
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu import GATv2Conv
    from keras_geometric_tpu.data.datasets.synthetic import community_graph
    from keras_geometric_tpu.kernels import band_pallas, spmm_pallas
    from keras_geometric_tpu.ops import reorder
    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    d = HEADS * FDIM

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:58s} {sec*1e3:8.2f} ms", flush=True)
        return sec * 1e3

    ht = jnp.asarray(
        rng.standard_normal((N, d)).astype(np.float32), jnp.bfloat16
    )
    idx_full = jnp.asarray(rng.integers(0, N, 1_343_488).astype(np.int32))
    canary = t("CANARY solo take [N,256] source (baseline ~4.3)",
               lambda a: jnp.take(a, idx_full, axis=0), ht)
    if canary > 8.0:
        print("DEGRADED RELAY MODE — numbers void", flush=True)

    # --- 1. take cost vs index count, fixed over-cliff source --------
    e_pad = ((E + N + 1023) // 1024) * 1024
    v_src = jnp.asarray(
        rng.standard_normal((e_pad, d)).astype(np.float32), jnp.bfloat16
    )
    for k in (280_576, 389_120, 681_984, e_pad):
        idx = jnp.asarray(rng.integers(0, e_pad, k).astype(np.int32))
        t(f"take {k/1e3:.0f}k rows from [E,256] bf16 (686 MB source)",
          lambda a, i: jnp.take(a, i, axis=0), v_src, idx)

    # --- community graph, LPA-reordered ------------------------------
    ei = community_graph(N, E, seed=0)
    s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
    order = reorder.cluster_order(s, r, N)
    inv = reorder.invert_order(order)
    ei_sorted = np.stack([inv[s], inv[r]])

    ctx_p = prepare_graph(ei_sorted, N, add_self_loops=True)
    ctx_w = prepare_graph(
        ei_sorted, N, add_self_loops=True, pad_nodes=True,
        attend_window=1024,
    )
    plan = ctx_w.attw_plan
    print(
        f"windowed plan: {plan.num_band_edges}/{ctx_w.num_real_edges} "
        f"band edges ({plan.num_band_edges/ctx_w.num_real_edges:.3f}), "
        f"{plan.num_work} work items, window={plan.window}",
        flush=True,
    )

    # --- 2. finishes in isolation ------------------------------------
    e_pad_p = int(ctx_p.senders.shape[0])
    v = jnp.asarray(
        rng.standard_normal((e_pad_p, d)).astype(np.float32), jnp.bfloat16
    )

    def old_finish(v):
        return spmm_pallas.scatter_sum_sorted(
            jnp.take(v, ctx_p.bwd_perm, axis=0),
            ctx_p.senders_sorted, ctx_p.num_nodes,
            tables=ctx_p.bwd_tables,
        )

    t("old finish: [E,256] permute + sorted scatter", old_finish, v)

    e_pad_w = int(ctx_w.senders.shape[0])
    vw = jnp.asarray(
        rng.standard_normal((e_pad_w, d)).astype(np.float32), jnp.bfloat16
    )

    def win_kernel_only(v):
        return band_pallas.window_scatter_sum(v, ctx_w.attw_sender, plan)

    t("windowed kernel alone", win_kernel_only, vw)

    def res_only(v):
        vr = jnp.take(v, ctx_w.attw_perm_res, axis=0)
        return spmm_pallas.scatter_sum_sorted(
            vr, ctx_w.attw_senders_res, ctx_w.num_nodes,
            tables=ctx_w.attw_res_tables, weights=ctx_w.attw_res_weight,
        )

    t("residual take + sorted scatter alone", res_only, vw)

    def new_finish(v):
        a = band_pallas.window_scatter_sum(v, ctx_w.attw_sender, plan)
        vr = jnp.take(v, ctx_w.attw_perm_res, axis=0)
        b = spmm_pallas.scatter_sum_sorted(
            vr, ctx_w.attw_senders_res, ctx_w.num_nodes,
            tables=ctx_w.attw_res_tables, weights=ctx_w.attw_res_weight,
        )
        return a[: ctx_w.num_nodes] + b

    t("new finish: windowed + residual", new_finish, vw)

    # --- 3. end-to-end GATv2 -----------------------------------------
    x = jnp.asarray(
        rng.standard_normal((N, 128)).astype(np.float32), jnp.bfloat16
    )
    layer = GATv2Conv.for_context(output_dim=FDIM, heads=HEADS)
    params = layer.init(jax.random.PRNGKey(0), 128)

    for name, ctx, xv in (
        ("gatv2 e2e PLAIN (single permute)", ctx_p, x),
        ("gatv2 e2e WINDOWED (attend_window=1024)", ctx_w,
         jnp.pad(x, ((0, ctx_w.num_nodes - N), (0, 0)))),
    ):
        def loss(p, c=ctx, xl=xv):
            pc = jax.tree_util.tree_map(lambda a: a.astype(xl.dtype), p)
            out = layer.apply(pc, xl, context=c).astype(jnp.float32)
            return jnp.sum(out * out) / N

        grad_fn = jax.jit(jax.value_and_grad(loss))
        jax.tree_util.tree_leaves(grad_fn(params))[0].block_until_ready()
        sec = timed_steps(lambda: grad_fn(params)[0], k_lo=2, k_hi=8)
        print(
            f"{name:58s} {sec*1e3:8.2f} ms "
            f"({ctx.num_edges/sec/1e6:.1f}M edges/s)", flush=True,
        )


if __name__ == "__main__":
    main()
