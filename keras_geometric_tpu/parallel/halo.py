"""Halo (boundary-node) feature exchange for edge-partitioned execution.

The baseline SPMD path (parallel.spmd) all-gathers the full transformed
feature table over ICI — ``N * F`` bytes per chip per layer. For
partitioned graphs with locality, each chip only *needs* the features of
its boundary senders. This module implements the indexed exchange
(BASELINE.json north-star: "halo/boundary node features exchanged
all-to-all over ICI"):

- :func:`build_halo_plan` (host, once): for every chip pair ``(p, q)``,
  the local row ids ``p`` must send to ``q``, padded to the max halo size
  ``H``; plus each chip's edge senders remapped into a local table layout
  ``[own rows | halo slot (q, j)]``.
- :func:`exchange` (device): gather send rows ``[P, H, F]`` ->
  ``lax.all_to_all`` over the graph axis -> concat with the local shard
  into the per-chip feature table. Comm volume ``P*H*F`` instead of
  ``N*F`` — a win whenever the cut fraction is below ~1 (always, after
  locality-aware partitioning).

Autodiff: ``all_to_all`` is its own transpose (a permutation), so
gradients ride the same collective in reverse; the gather transposes to a
scatter-add into the local shard — all inserted by shard_map autodiff.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph_ops import round_up
from .partition import PartitionedGraph

__all__ = ["HaloPlan", "build_halo_plan", "exchange"]


class HaloPlan(NamedTuple):
    """Static halo-exchange tables; leading axis = chip id."""

    send_idx: np.ndarray  # [P, P, H] int32: rows chip p sends to chip q
    senders_local: np.ndarray  # [P, E] int32 into [L + P*H] local table
    halo_size: int  # H
    comm_fraction: float  # halo volume / full-gather volume (diagnostic)


def build_halo_plan(pg: PartitionedGraph, *, halo_multiple: int = 8) -> HaloPlan:
    """Derive the per-pair send tables and sender remap from a partition."""
    P = pg.num_parts
    L = pg.nodes_per_part

    # need[p][q]: sorted unique global sender ids chip p needs from chip q.
    need: list[list[np.ndarray]] = []
    for p in range(P):
        senders = pg.senders_global[p][pg.edge_mask[p]]
        owners = senders // L
        row = []
        for q in range(P):
            if q == p:
                row.append(np.zeros(0, np.int64))
            else:
                row.append(np.unique(senders[owners == q]).astype(np.int64))
        need.append(row)

    h = max(
        (len(need[p][q]) for p in range(P) for q in range(P)), default=0
    )
    h = max(round_up(max(h, 1), halo_multiple), halo_multiple)

    send_idx = np.zeros((P, P, h), np.int32)
    for p in range(P):
        for q in range(P):
            if p == q:
                continue
            # Chip p sends to chip q the rows q needs from p.
            ids = need[q][p]
            send_idx[p, q, : len(ids)] = (ids - p * L).astype(np.int32)

    # Remap each chip's edge senders into its local table layout.
    senders_local = np.zeros_like(pg.senders_global)
    for p in range(P):
        lookup = {}
        for q in range(P):
            for j, g in enumerate(need[p][q]):
                lookup[int(g)] = L + q * h + j
        s = pg.senders_global[p]
        out = np.zeros_like(s)
        owners = s // L
        local = owners == p
        out[local] = s[local] - p * L
        remote_pos = np.nonzero(~local & pg.edge_mask[p])[0]
        for i in remote_pos:
            out[i] = lookup[int(s[i])]
        senders_local[p] = out

    full = (P - 1) * L  # rows a full all-gather moves per chip (others' shards)
    comm_fraction = (P * h) / max(full, 1)
    return HaloPlan(
        send_idx=send_idx,
        senders_local=senders_local,
        halo_size=h,
        comm_fraction=comm_fraction,
    )


def exchange(
    h_local: jax.Array,
    send_idx_local: jax.Array,
    *,
    axis: str = "graph",
) -> jax.Array:
    """Per-chip (inside shard_map): build the ``[L + P*H, F]`` feature table.

    ``send_idx_local``: this chip's ``[P, H]`` send-row table.
    """
    send_buf = jnp.take(h_local, send_idx_local.reshape(-1), axis=0)
    p, h = send_idx_local.shape
    send_buf = send_buf.reshape(p, h, -1)  # [P, H, F]
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    # recv[q] = rows chip q sent to us == the ids in need[self][q] order.
    table = jnp.concatenate(
        [h_local, recv.reshape(p * h, h_local.shape[-1])], axis=0
    )
    return table
