"""Kernelized distributed GATv2 attention: per-shard attend tables.

VERDICT r2 item 3: the fused single-chip attention kernels
(kernels/sddmm_pallas + softmax_pallas + attend_pallas) never ran under
shard_map — distributed GATv2 fell back to XLA segment ops. This module
closes that: receiver-range partitioning (parallel/partition.py) keeps
every receiver's softmax chip-local, so the whole single-chip fused
attend pipeline runs unchanged per shard; the only distributed part is
extending the sender feature table with the halo rows
(parallel.halo.exchange — differentiable, its transpose routes the
sender-side cotangents back over the same ``all_to_all``).

Per-shard state (stacked ``[P, ...]``, built once on host):

- the partition's receiver-sorted edges with **table-local** sender ids
  (into ``[L + P*H]`` = local rows + halo slots);
- receiver-grid scatter/expand tables over the ``L`` local rows;
- the sender-sorted orientation (perm, sorted senders, receivers-in-
  sender-order, bwd tables over ``L + P*H`` source rows) for the
  permutation-free sender backward (ops/csr._gatv2_attend design).

Reference semantics distributed here:
/root/reference/src/keras_geometric/layers/gatv2_conv.py:268-352.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import attend_pallas, sddmm_pallas, spmm_pallas
from ..ops.graph_ops import round_up
from .halo import HaloPlan, build_halo_plan, exchange
from .kernel_plan import TableStack, _stack_tables
from .partition import PartitionedGraph

__all__ = ["AttendPlan", "build_attend_plan", "attend_local"]


class AttendPlan(NamedTuple):
    """Host-side stacked attend tables (leading axis = chip)."""

    senders: np.ndarray  # [P, E] table-local ids in [0, L + P*H)
    receivers: np.ndarray  # [P, E] local receiver rows, non-decreasing
    edge_valid: np.ndarray  # [P, E] f32 1/0 (receiver order)
    perm: np.ndarray  # [P, E] receiver-order edge -> sender-sorted pos
    senders_sorted: np.ndarray  # [P, E]
    receivers_ss: np.ndarray  # [P, E]
    edge_valid_ss: np.ndarray  # [P, E] f32 (sender order)
    fwd: TableStack  # receiver scatter tables (row_block=256 class)
    exp: TableStack  # receiver expand tables (row_block=128)
    bwd: TableStack  # sender-sorted scatter tables over L + P*H rows
    send_idx: np.ndarray  # [P, P, H]
    halo_size: int
    nodes_per_part: int
    num_source_rows: int  # L + P*H


def build_attend_plan(
    pg: PartitionedGraph,
    *,
    halo_plan: HaloPlan | None = None,
    edge_chunk: int = 512,
    scatter_row_block: int = 256,
    expand_row_block: int = 128,
    halo_multiple: int = 8,
) -> AttendPlan:
    """Host-side, once: halo remap + per-part dual-orientation tables."""
    if halo_plan is None:
        halo_plan = build_halo_plan(pg, halo_multiple=halo_multiple)
    P, L = pg.num_parts, pg.nodes_per_part
    h = halo_plan.halo_size
    n_src = L + P * h

    e_real = [int(m.sum()) for m in pg.edge_mask]
    e_pad = max(round_up(max(max(e_real), 1), edge_chunk), edge_chunk)
    last = L - 1
    s_out = np.zeros((P, e_pad), np.int32)
    r_out = np.full((P, e_pad), last, np.int32)
    v_out = np.zeros((P, e_pad), np.float32)
    perm_out = np.zeros((P, e_pad), np.int32)
    ss_out = np.zeros((P, e_pad), np.int32)
    fwd_t, exp_t, bwd_t = [], [], []
    for p in range(P):
        mask = pg.edge_mask[p]
        k = e_real[p]
        # Boolean selection preserves the partition's receiver sort.
        s_out[p, :k] = halo_plan.senders_local[p][mask]
        r_out[p, :k] = pg.receivers_local[p][mask]
        v_out[p, :k] = 1.0
        fwd_t.append(
            spmm_pallas.build_row_tables(
                r_out[p], L, edge_chunk=edge_chunk,
                row_block=scatter_row_block,
            )
        )
        exp_t.append(
            spmm_pallas.build_row_tables(
                r_out[p], L, edge_chunk=edge_chunk,
                row_block=expand_row_block,
            )
        )
        order = np.argsort(s_out[p], kind="stable").astype(np.int32)
        perm_out[p] = order
        ss_out[p] = s_out[p][order]
        bwd_t.append(
            spmm_pallas.build_row_tables(
                ss_out[p], n_src, edge_chunk=edge_chunk,
                row_block=scatter_row_block,
            )
        )
    r_ss = np.take_along_axis(r_out, perm_out, axis=1)
    v_ss = np.take_along_axis(v_out, perm_out, axis=1)
    return AttendPlan(
        senders=s_out, receivers=r_out, edge_valid=v_out,
        perm=perm_out, senders_sorted=ss_out,
        receivers_ss=r_ss, edge_valid_ss=v_ss,
        fwd=_stack_tables(fwd_t), exp=_stack_tables(exp_t),
        bwd=_stack_tables(bwd_t),
        send_idx=halo_plan.send_idx, halo_size=h, nodes_per_part=L,
        num_source_rows=n_src,
    )


def plan_device_data(ap: AttendPlan) -> dict:
    """Flatten into stackable ``[P, ...]`` arrays for shard_map."""
    out = {
        "send_idx": ap.send_idx,
        "senders": ap.senders,
        "receivers": ap.receivers,
        "edge_valid": ap.edge_valid,
        "perm": ap.perm,
        "senders_sorted": ap.senders_sorted,
        "receivers_ss": ap.receivers_ss,
        "edge_valid_ss": ap.edge_valid_ss,
    }
    for name, ts in (("fwd", ap.fwd), ("exp", ap.exp), ("bwd", ap.bwd)):
        out[f"{name}_bounds"] = ts.bounds
        out[f"{name}_work_block"] = ts.work_block
        out[f"{name}_work_chunk"] = ts.work_chunk
        out[f"{name}_work_first"] = ts.work_first
        out[f"{name}_work_cfirst"] = ts.work_cfirst
    return out


def _unflat_tables(flat, edge_chunk, row_block):
    return spmm_pallas.RowTables(
        bounds=flat[0], work_block=flat[1], work_chunk=flat[2],
        work_first=flat[3], work_cfirst=flat[4],
        edge_chunk=edge_chunk, row_block=row_block,
    )


def _attend_fwd_compute(ht_src, ht_recv, att, arrays, meta):
    (senders, _receivers, edge_valid, _perm, _ss, _rss, _valid_ss,
     drop_mask, fwd_flat, exp_flat, _bwd_flat) = arrays
    num_local, negative_slope, eps, ec, rb_fwd, rb_exp, _rb_bwd = meta
    fwd_tables = _unflat_tables(fwd_flat, ec, rb_fwd)
    del exp_flat  # expand tables only serve the (unused) separate sddmm
    hj = jnp.take(ht_src, senders, axis=0)
    # No-score-cache mode (r5, same as ops/csr): the backward passes
    # recompute s in-register, so the per-shard [E, H] f32 score stream
    # is never materialized.
    out, m, l = sddmm_pallas.sddmm_stats_agg_sorted(
        ht_recv, hj, att, tables=fwd_tables, num_nodes=num_local,
        edge_valid=edge_valid, negative_slope=negative_slope, eps=eps,
        drop_mask=drop_mask, emit_scores=False,
    )
    return out[:num_local], (hj, m, l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attend_dist(ht_src, ht_recv, att, arrays, meta):
    out, _ = _attend_fwd_compute(ht_src, ht_recv, att, arrays, meta)
    return out


def _attend_dist_fwd(ht_src, ht_recv, att, arrays, meta):
    out, res = _attend_fwd_compute(ht_src, ht_recv, att, arrays, meta)
    return out, (ht_src, ht_recv, att, arrays, *res)


def _attend_dist_bwd(meta, saved, g):
    """The single-chip single-permute backward
    (ops/csr._gatv2_attend_bwd), with receiver- and sender-side feature
    tables distinct: d ht_recv comes from the receiver-grid passes; the
    per-edge sender cotangent ``v`` is permuted once and scattered into
    the full ``[L + P*H]`` source table (halo rows' cotangents return
    through exchange's transpose)."""
    (ht_src, ht_recv, att, arrays, hj, m, l) = saved
    (_senders, _receivers, edge_valid, perm, ss, _rss, _valid_ss,
     drop_mask, fwd_flat, _exp_flat, bwd_flat) = arrays
    num_local, negative_slope, eps, ec, rb_fwd, _rb_exp, rb_bwd = meta
    fwd_tables = _unflat_tables(fwd_flat, ec, rb_fwd)
    bwd_tables = _unflat_tables(bwd_flat, ec, rb_bwd)

    rho = attend_pallas.attend_rho_sorted(
        g, None, m, l, hj, tables=fwd_tables, eps=eps,
        drop_mask=drop_mask, rows=ht_recv, att=att,
        negative_slope=negative_slope, edge_valid=edge_valid,
    )
    dht_recv, datt, v = attend_pallas.attend_recv_bwd_full_sorted(
        ht_recv, g, hj, att, None, m, l, rho,
        tables=fwd_tables, eps=eps, negative_slope=negative_slope,
        drop_mask=drop_mask, edge_valid=edge_valid,
    )
    dht_recv = dht_recv[: ht_recv.shape[0]]
    dht_src = spmm_pallas.scatter_sum_sorted(
        jnp.take(v, perm, axis=0), ss, ht_src.shape[0],
        tables=bwd_tables,
    )[: ht_src.shape[0]]
    return (
        dht_src.astype(ht_src.dtype),
        dht_recv.astype(ht_recv.dtype),
        datt.astype(att.dtype),
        None,
    )


_attend_dist.defvjp(_attend_dist_fwd, _attend_dist_bwd)


def attend_local(
    ht_local: jax.Array,
    att: jax.Array,
    kp_shard: dict,
    kp_meta: AttendPlan,
    *,
    axis: str = "graph",
    negative_slope: float = 0.2,
    eps: float = 1e-10,
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Per-chip (inside shard_map) fused GATv2 attention propagate.

    ``kp_shard`` holds this chip's slices of the shard data dict;
    attend-plan arrays are the ``ap_*`` keys (plan_device_data).
    ``kp_meta`` is the host-side :class:`AttendPlan` (static geometry).
    Returns the aggregated ``[L, H*F]`` shard.
    """
    shard = {
        k[3:]: v for k, v in kp_shard.items() if k.startswith("ap_")
    }
    if "senders" not in shard:
        raise ValueError(
            "kernelized distributed GATv2 needs the data built with an "
            "attend plan (shard_partitioned_graph(attend_plan=...))"
        )
    ec = kp_meta.fwd.edge_chunk

    def flat(name):
        return tuple(
            shard[f"{name}_{k}"]
            for k in ("bounds", "work_block", "work_chunk", "work_first",
                      "work_cfirst")
        )

    table = exchange(ht_local, shard["send_idx"], axis=axis)

    drop_mask = None
    if dropout > 0.0:
        if rng is None:
            raise ValueError("attention dropout requires an rng key")
        keep = 1.0 - dropout
        heads = att.shape[0]
        drop_mask = (
            jax.random.bernoulli(
                rng, keep, shape=(shard["senders"].shape[0], heads)
            ).astype(jnp.float32)
            / keep
        )

    arrays = (
        shard["senders"], shard["receivers"],
        shard["edge_valid"].astype(jnp.float32),
        shard["perm"], shard["senders_sorted"], shard["receivers_ss"],
        shard["edge_valid_ss"].astype(jnp.float32), drop_mask,
        flat("fwd"), flat("exp"), flat("bwd"),
    )
    meta = (
        ht_local.shape[0], float(negative_slope), float(eps), ec,
        kp_meta.fwd.row_block, kp_meta.exp.row_block,
        kp_meta.bwd.row_block,
    )
    return _attend_dist(table, ht_local, att, arrays, meta)
