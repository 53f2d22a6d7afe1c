"""Synthetic graph generators for tests and benchmarks.

No reference analog (the reference downloads real Planetoid data,
cora.py:59-72); these generators produce deterministic random graphs with
the same *shape profile* (node/edge/feature/class counts) so the full
train/eval path runs in zero-egress environments.
"""

from __future__ import annotations

import numpy as np

from ...utils.data_utils import GraphData

__all__ = ["synthetic_graph", "synthetic_planetoid", "PLANETOID_STATS"]

# (num_nodes, num_directed_edges, num_features, num_classes) — reference
# dataset statistics (cora.py:28-32, citation.py:202-219, 239-257).
PLANETOID_STATS = {
    "cora": (2708, 10858, 1433, 7),
    "citeseer": (3327, 9464, 3703, 6),
    "pubmed": (19717, 88676, 500, 3),
}


def synthetic_graph(
    num_nodes: int,
    num_edges: int,
    num_features: int,
    *,
    num_classes: int | None = None,
    seed: int = 0,
    symmetric: bool = True,
    dtype=np.float32,
) -> GraphData:
    """Uniform random graph with optional symmetric (undirected) edges."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((num_nodes, num_features)).astype(dtype)
    e = num_edges // 2 if symmetric else num_edges
    senders = rng.integers(0, num_nodes, size=e, dtype=np.int64)
    receivers = rng.integers(0, num_nodes, size=e, dtype=np.int64)
    if symmetric:
        s = np.concatenate([senders, receivers])
        r = np.concatenate([receivers, senders])
    else:
        s, r = senders, receivers
    edge_index = np.stack([s, r]).astype(np.int32)
    y = None
    if num_classes is not None:
        y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    return GraphData(x=x, edge_index=edge_index, y=y)


def synthetic_planetoid(name: str = "cora", seed: int = 0) -> GraphData:
    """A synthetic stand-in matching a Planetoid dataset's shape profile.

    Adds the standard Planetoid split masks (train/val/test) as extras:
    20 per class train, 500 val, 1000 test.
    """
    name = name.lower()
    if name not in PLANETOID_STATS:
        raise ValueError(f"Unknown planetoid dataset: {name}")
    n, e, f, c = PLANETOID_STATS[name]
    rng = np.random.default_rng(seed)
    y = rng.integers(0, c, size=n).astype(np.int32)
    # Homophilous edges (like real citation graphs): 80% of edges connect
    # same-label nodes, so neighbor aggregation reinforces the signal.
    n_undirected = e // 2
    senders = rng.integers(0, n, size=n_undirected)
    receivers = np.empty(n_undirected, np.int64)
    same = rng.random(n_undirected) < 0.8
    by_label = [np.where(y == cls)[0] for cls in range(c)]
    receivers[~same] = rng.integers(0, n, size=int((~same).sum()))
    for cls in range(c):
        sel = same & (y[senders] == cls)
        receivers[sel] = rng.choice(by_label[cls], size=int(sel.sum()))
    edge_index = np.stack(
        [np.concatenate([senders, receivers]), np.concatenate([receivers, senders])]
    ).astype(np.int32)
    # Weak per-class feature signal on top of noise.
    x = rng.standard_normal((n, f)).astype(np.float32)
    x[np.arange(n), y % f] += 2.0
    g = GraphData(x=x, edge_index=edge_index, y=y)
    train_mask = np.zeros(n, bool)
    for cls in range(c):
        ids = np.where(g.y == cls)[0]
        train_mask[rng.choice(ids, size=min(20, len(ids)), replace=False)] = True
    rest = np.where(~train_mask)[0]
    rng.shuffle(rest)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:500]] = True
    test_mask[rest[500:1500]] = True
    return GraphData(
        x=x,
        edge_index=g.edge_index,
        y=g.y,
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
    )
