"""Host-side graph partitioning for multi-chip execution.

No reference analog (the reference is strictly single-device, SURVEY.md
§2.4); this implements the graph/edge-partition parallelism the TPU build
requires: the node set is split into ``num_parts`` equal contiguous ranges
(the "sequence-parallel" axis of a GNN), and every edge is assigned to the
partition that owns its **receiver**. Consequences:

- all segment reductions (sum/mean/max, GATv2 edge softmax) are purely
  local to a chip — no cross-chip combining pass is ever needed;
- only *sender features* are remote; the device program gathers them from
  an all-gathered (or halo-exchanged) feature table;
- per-partition arrays are padded to identical static shapes, so one SPMD
  program serves every partition (shard_map over the leading axis).

``partition_graph`` also precomputes GCN normalization weights globally
(degree is a global property) so the distributed forward needs no extra
communication for them.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..ops.graph_ops import round_up

__all__ = ["PartitionedGraph", "partition_graph"]


class PartitionedGraph(NamedTuple):
    """Per-partition padded arrays; leading axis = partition id.

    Shapes: ``P`` parts, ``L = nodes_per_part``, ``E = edges_per_part``.
    """

    senders_global: np.ndarray  # [P, E] int32, global sender node ids
    receivers_local: np.ndarray  # [P, E] int32, receiver ids local to part
    edge_mask: np.ndarray  # [P, E] bool
    edge_weight: np.ndarray | None  # [P, E] float32 (e.g. GCN norm) or None
    edge_perm: np.ndarray  # [P, E] int32 original edge id (pad = num_edges)
    node_mask: np.ndarray  # [P, L] bool — True for real (unpadded) nodes
    num_nodes: int  # true global node count
    num_edges: int  # true global edge count
    nodes_per_part: int  # L (padded, equal across parts)
    num_parts: int

    @property
    def padded_num_nodes(self) -> int:
        return self.num_parts * self.nodes_per_part


def partition_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    num_parts: int,
    *,
    edge_weight: np.ndarray | None = None,
    gcn_normalize: bool = False,
    add_self_loops: bool = False,
    edge_multiple: int = 128,
) -> PartitionedGraph:
    """Partition a COO graph by receiver range into ``num_parts`` shards.

    Args:
        edge_index: ``[2, E]`` (or ``[E, 2]``) global COO edges.
        num_nodes: global node count.
        num_parts: number of chips/shards.
        edge_weight: optional per-edge weights carried through the permute.
        gcn_normalize: precompute symmetric GCN weights globally
            (matching ops.graph_ops.gcn_norm semantics) and fold them into
            ``edge_weight``.
        add_self_loops: append one self-loop per real node before
            partitioning (GCN-style preprocessing).
        edge_multiple: pad per-part edge counts to this multiple.
    """
    edge_index = np.asarray(edge_index)
    if edge_index.shape[0] != 2:
        edge_index = edge_index.T
    # int32 throughout: node ids fit, and int64 passes over 100M+-edge
    # arrays dominated host preprocessing time at ogbn-products scale.
    senders = np.ascontiguousarray(edge_index[0], np.int32)
    receivers = np.ascontiguousarray(edge_index[1], np.int32)

    if add_self_loops:
        loops = np.arange(num_nodes, dtype=np.int32)
        senders = np.concatenate([senders, loops])
        receivers = np.concatenate([receivers, loops])
        if edge_weight is not None:
            edge_weight = np.concatenate(
                [np.asarray(edge_weight), np.ones(num_nodes, np.float32)]
            )

    num_edges = senders.shape[0]

    if gcn_normalize:
        from .. import native

        # Native C++ routine (same reference-exact semantics as
        # ops.graph_ops.gcn_norm: receiver in-degree, (d+1e-12)^-1/2,
        # inf -> 0) — the numpy float64 path cost ~29 s at products scale.
        norm = np.asarray(
            native.gcn_norm_weights(senders, receivers, num_nodes),
            np.float32,
        )
        edge_weight = norm if edge_weight is None else edge_weight * norm

    nodes_per_part = round_up(max(num_nodes, 1), num_parts) // num_parts

    # ONE global stable receiver sort (native counting sort when built):
    # contiguous receiver ranges mean globally-sorted == grouped by part
    # AND receiver-sorted within each part — the per-part argsort loop of
    # round 1 was O(P·E log E) host time at ogbn-products scale.
    from .. import native

    perm = native.coo_to_csr_perm(receivers, num_nodes)[0].astype(np.int32)
    s_sorted = senders[perm]
    r_sorted = receivers[perm]
    ids_sorted = perm  # arange(E)[perm] == perm
    w_sorted = (
        np.asarray(edge_weight, np.float32)[perm]
        if edge_weight is not None
        else None
    )
    bounds = np.searchsorted(
        r_sorted, np.arange(num_parts + 1, dtype=np.int64) * nodes_per_part
    )
    counts = np.diff(bounds)
    edges_per_part = round_up(max(int(counts.max()), 1), edge_multiple)

    s_out = np.zeros((num_parts, edges_per_part), np.int32)
    r_out = np.zeros((num_parts, edges_per_part), np.int32)
    m_out = np.zeros((num_parts, edges_per_part), bool)
    p_out = np.full((num_parts, edges_per_part), num_edges, np.int32)
    w_out = (
        np.zeros((num_parts, edges_per_part), np.float32)
        if edge_weight is not None
        else None
    )

    for p in range(num_parts):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        k = hi - lo
        s_out[p, :k] = s_sorted[lo:hi]
        r_out[p, :k] = r_sorted[lo:hi] - p * nodes_per_part
        m_out[p, :k] = True
        p_out[p, :k] = ids_sorted[lo:hi]
        if w_out is not None:
            w_out[p, :k] = w_sorted[lo:hi]
        # Padded edges point at local node 0 with mask False.

    node_ids = np.arange(num_parts * nodes_per_part).reshape(
        num_parts, nodes_per_part
    )
    node_mask = node_ids < num_nodes

    return PartitionedGraph(
        senders_global=s_out,
        receivers_local=r_out,
        edge_mask=m_out,
        edge_weight=w_out,
        edge_perm=p_out,
        node_mask=node_mask,
        num_nodes=num_nodes,
        num_edges=num_edges,
        nodes_per_part=nodes_per_part,
        num_parts=num_parts,
    )
