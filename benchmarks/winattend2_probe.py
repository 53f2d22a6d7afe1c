"""r5: banded-attention geometry — pipeline ec x windowed-kernel chunk.

The no-score-cache pipeline prefers edge_chunk=512 end-to-end (r5,
noscores_probe) while the windowed scatter wants coarser chunks (fewer
work items; host calc: ec_win 1024 -> 1293 items / absorption .707,
2048 -> 650 / .692). This probe prices the composition on the
community (skewed perf_suite) workload.
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
    from keras_geometric_tpu.kernels import band_pallas
    from keras_geometric_tpu.ops import reorder
    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    d = HEADS * FDIM

    ht = jnp.asarray(
        rng.standard_normal((N, d)).astype(np.float32), jnp.bfloat16
    )
    idx_full = jnp.asarray(rng.integers(0, N, 1_343_488).astype(np.int32))
    jfn = jax.jit(lambda a: jnp.take(a, idx_full, axis=0))
    jfn(ht).block_until_ready()
    canary = timed_steps(lambda: jfn(ht), k_lo=2, k_hi=8) * 1e3
    print(f"CANARY solo take (baseline ~4.3): {canary:.2f} ms", flush=True)
    if canary > 8.0:
        print("DEGRADED RELAY MODE — numbers void", flush=True)

    ei = community_graph(N, E, seed=0)
    s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
    order = reorder.cluster_order(s, r, N)
    inv = reorder.invert_order(order)
    ei_sorted = np.stack([inv[s], inv[r]])

    x = jnp.asarray(
        rng.standard_normal((N, 128)).astype(np.float32), jnp.bfloat16
    )
    layer = GATv2Conv.for_context(output_dim=FDIM, heads=HEADS)
    params = layer.init(jax.random.PRNGKey(0), 128)

    def e2e(name, ctx):
        xl = x if ctx.num_nodes == N else jnp.pad(
            x, ((0, ctx.num_nodes - N), (0, 0))
        )

        def loss(p):
            pc = jax.tree_util.tree_map(lambda a: a.astype(xl.dtype), p)
            out = layer.apply(pc, xl, context=ctx).astype(jnp.float32)
            return jnp.sum(out * out) / N

        grad_fn = jax.jit(jax.value_and_grad(loss))
        jax.tree_util.tree_leaves(grad_fn(params))[0].block_until_ready()
        sec = timed_steps(lambda: grad_fn(params)[0], k_lo=2, k_hi=8)
        print(
            f"{name:58s} {sec*1e3:8.2f} ms "
            f"({ctx.num_edges/sec/1e6:.1f}M edges/s)", flush=True,
        )
        return sec

    for ec in (512, 1024):
        ctx_p = prepare_graph(ei_sorted, N, add_self_loops=True,
                              edge_chunk=ec)
        e2e(f"gatv2 PLAIN ec={ec}", ctx_p)
        for ecw in (1024, 2048):
            ctx_w = prepare_graph(
                ei_sorted, N, add_self_loops=True, edge_chunk=ec,
                pad_nodes=True, attend_window=1024,
                attend_window_chunk=ecw,
            )
            plan = ctx_w.attw_plan
            # isolated kernel
            e_pad_w = int(ctx_w.senders.shape[0])
            vw = jnp.asarray(
                rng.standard_normal((e_pad_w, d)).astype(np.float32),
                jnp.bfloat16,
            )
            kfn = jax.jit(lambda v: band_pallas.window_scatter_sum(
                v, ctx_w.attw_sender, plan))
            kfn(vw).block_until_ready()
            kt = timed_steps(lambda: kfn(vw), k_lo=2, k_hi=8) * 1e3
            print(
                f"  win kernel ec_win={ecw}: {kt:.2f} ms "
                f"(absorb {plan.num_band_edges/ctx_w.num_real_edges:.3f},"
                f" {plan.num_work} items)", flush=True,
            )
            e2e(f"gatv2 WINDOWED ec={ec} ec_win={ecw}", ctx_w)


if __name__ == "__main__":
    main()
