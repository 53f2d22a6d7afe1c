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
    from keras_geometric_tpu.parallel.partition import (
        community_partition_order,
    )

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int64)
    uniform = np.stack([np.concatenate([a, b]), np.concatenate([b, a])])

    comm = community_graph(ARXIV_NODES, 2 * half, seed=0)
    comm_loc = community_graph(
        ARXIV_NODES, 2 * half, seed=0, inter_locality=0.35
    )

    def frac(ei, p):
        pg = partition_graph(
            ei, ARXIV_NODES, p, gcn_normalize=True, add_self_loops=True
        )
        plan = build_halo_plan(pg)
        return plan.halo_size, plan.comm_fraction

    print("# graph | P | halo H | comm_frac (halo / all-gather)")
    for name, ei in (
        ("uniform", uniform),
        ("community flat", comm),
        ("community local", comm_loc),
    ):
        s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
        t0 = time.perf_counter()
        order = reorder.cluster_order(s, r, ARXIV_NODES)
        inv = reorder.invert_order(order)
        reordered = np.stack([inv[s], inv[r]])
        t_order = time.perf_counter() - t0
        t0 = time.perf_counter()
        labels = reorder.lpa_labels(s, r, ARXIV_NODES, iters=25, tol=0.002)
        t_lpa = time.perf_counter() - t0
        print(f"# {name}: cluster_order {t_order:.1f}s")
        for p in (2, 4, 8):
            h0, f0 = frac(ei, p)
            h1, f1 = frac(reordered, p)
            o2 = community_partition_order(
                s, r, ARXIV_NODES, p, labels=labels
            )
            inv2 = reorder.invert_order(o2)
            h2, f2 = frac(np.stack([inv2[s], inv2[r]]), p)
            print(
                f"{name:16s} P={p}  scrambled {f0:.3f} (H={h0})  "
                f"cluster_order {f1:.3f} (H={h1})  "
                f"min-cut binpack {f2:.3f} (H={h2})"
            )


if __name__ == "__main__":
    main()
