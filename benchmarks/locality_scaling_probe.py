"""Locality-aware partitioning: comm_fraction with vs without reordering.

VERDICT r2 item 4: receiver-range partitioning of an UNORDERED graph
moves more halo bytes than a full all-gather at P=2 (comm_fraction
1.94). The fix is the same LPA cluster ordering that powers the banded
tier: after reordering, the contiguous receiver ranges align with
communities, so most senders are chip-local and the halo shrinks.

Host-side accounting over three graphs at ogbn-arxiv scale:
uniform random (no locality exists), scrambled community power-law,
and the same community graph after cluster_order.
"""

from __future__ import annotations

import time

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_166_243


def main():
    from keras_geometric_tpu.data.datasets.synthetic import community_graph
    from keras_geometric_tpu.ops import reorder
    from keras_geometric_tpu.parallel import build_halo_plan, partition_graph

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    uniform = np.stack([np.concatenate([a, b]), np.concatenate([b, a])])

    comm = community_graph(ARXIV_NODES, 2 * half, seed=0)
    s, r = comm[0].astype(np.int64), comm[1].astype(np.int64)
    t0 = time.perf_counter()
    order = reorder.cluster_order(s, r, ARXIV_NODES)
    inv = reorder.invert_order(order)
    t_order = time.perf_counter() - t0
    comm_sorted = np.stack([inv[s], inv[r]])
    print(f"# cluster_order: {t_order:.1f}s")

    graphs = [
        ("uniform", uniform),
        ("community/scrambled", comm),
        ("community/reordered", comm_sorted),
    ]
    print("# graph | P | halo H | comm_fraction (halo / all-gather)")
    for name, ei in graphs:
        for p in (2, 4, 8):
            pg = partition_graph(
                ei, ARXIV_NODES, p, gcn_normalize=True,
                add_self_loops=True,
            )
            plan = build_halo_plan(pg)
            print(
                f"{name:22s} P={p}  H={plan.halo_size:7d}  "
                f"comm_frac={plan.comm_fraction:.3f}"
            )


if __name__ == "__main__":
    main()
