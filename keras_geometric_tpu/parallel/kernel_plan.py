"""Kernelized distributed execution plan: Pallas SpMM inside shard_map,
with halo exchange overlapped against local aggregation.

Round-1 gap (VERDICT #5): the distributed path used XLA ``segment_sum`` —
none of the single-chip Pallas wins survived sharding — and the halo
``all_to_all`` ran strictly BEFORE local compute. This module closes both:

- **Per-shard kernel tables.** Each partition's receiver-sorted edges get
  their own boundary/work-list tables (spmm_pallas.build_row_tables),
  stacked ``[P, ...]`` with no-op-padded work lists so one SPMD program
  serves every chip. Inside ``shard_map`` the body rebuilds a
  ``RowTables`` view over its slice and calls the SAME Pallas kernels as
  the single-chip path.
- **Local/remote edge split (the overlap).** Edges whose sender lives on
  the receiving chip are aggregated from the local shard — a computation
  with NO dependence on the collective — while edges with remote senders
  wait only on the ``all_to_all``'d halo table. Expressed as two
  independent scatters, XLA's async collective scheduler runs the
  ``all_to_all`` concurrently with the local scatter (BASELINE.json
  north star: "exchanged all-to-all over ICI and overlapped with local
  aggregation").

No-op work-list padding: padded items repeat the last real item's (block,
chunk) with first/last flags cleared — same resident windows (no extra
DMA), they accumulate into scratch that is never written out again.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import spmm_pallas
from ..ops import csr
from ..ops.graph_ops import round_up
from .halo import build_halo_plan
from .partition import PartitionedGraph

__all__ = [
    "EdgeSetShard",
    "KernelPlan",
    "build_kernel_plan",
    "plan_device_data",
    "spmm_local_overlapped",
]


class TableStack(NamedTuple):
    """Stacked per-partition RowTables arrays (leading axis = chip)."""

    bounds: np.ndarray  # [P, nb, 2, rb] int32
    work_block: np.ndarray  # [P, W] int32
    work_chunk: np.ndarray  # [P, W] int32
    work_first: np.ndarray  # [P, W] int32
    work_cfirst: np.ndarray  # [P, W] int32
    edge_chunk: int
    row_block: int


class EdgeSetShard(NamedTuple):
    """One receiver-sorted edge subset, stacked per chip.

    ``perm``/``senders_sorted``/``tables_bwd`` give the transposed
    (sender-sorted) orientation so the gather's BACKWARD runs the Pallas
    sorted scatter instead of XLA's unsorted scatter-add (the round-1
    single-chip lesson, ops/csr.py dual-CSR design).
    """

    senders: np.ndarray  # [P, E] int32 (local rows, or halo-slot ids)
    receivers: np.ndarray  # [P, E] int32 local receiver rows
    weight: np.ndarray  # [P, E] f32, 0 on padded slots
    tables: TableStack
    perm: np.ndarray  # [P, E] receiver-order edge -> sender-sorted pos
    senders_sorted: np.ndarray  # [P, E]
    tables_bwd: TableStack
    num_source_rows: int  # gather-source row count (L, or P*H)
    receivers_ss: np.ndarray  # [P, E] receivers in sender-sorted order
    weight_ss: np.ndarray  # [P, E] weights in sender-sorted order


class KernelPlan(NamedTuple):
    """Everything the kernelized overlapped SPMD body needs, host-side."""

    loc: EdgeSetShard  # senders are local row ids in [0, L)
    rem: EdgeSetShard  # senders are halo-table slots in [0, P*H)
    send_idx: np.ndarray  # [P, P, H] rows each chip sends to each peer
    halo_size: int
    nodes_per_part: int
    comm_fraction: float
    in_degree: np.ndarray | None = None  # [P, L] real-edge receiver degree


def _stack_tables(per_part: list[spmm_pallas.RowTables]) -> TableStack:
    """Stack per-partition tables, no-op-padding work lists to max length."""
    w_max = max(t.num_work for t in per_part)
    wb = np.zeros((len(per_part), w_max), np.int32)
    wc = np.zeros_like(wb)
    wf = np.zeros_like(wb)
    wcf = np.zeros_like(wb)
    for p, t in enumerate(per_part):
        w = t.num_work
        wb[p, :w] = t.work_block
        wc[p, :w] = t.work_chunk
        # Padded items: repeat the last real (block, chunk) with all flags
        # cleared — not-first => accumulate into already-flushed scratch,
        # not-last => never write out. Same windows, so no extra DMA.
        wb[p, w:] = t.work_block[-1]
        wc[p, w:] = t.work_chunk[-1]
        wf[p, :w] = t.work_first
        wcf[p, :w] = t.work_cfirst
        # Clear the last real item's "last" semantics for padding only —
        # real flags stay intact; padded flags are already 0.
    t0 = per_part[0]
    return TableStack(
        bounds=np.stack([t.bounds for t in per_part]),
        work_block=wb, work_chunk=wc, work_first=wf, work_cfirst=wcf,
        edge_chunk=t0.edge_chunk, row_block=t0.row_block,
    )


def _build_edge_set(
    senders_list, receivers_list, weight_list, num_local, *,
    edge_chunk, row_block, num_source_rows,
) -> EdgeSetShard:
    """Pad per-part edge subsets to a common chunk-aligned length and
    build stacked scatter tables for BOTH orientations. Padded edges
    point at the last local receiver row with zero weight (exactly
    neutral under the fused weights) and at source row 0 (their backward
    cotangent is zero — the expand applies the zero weight)."""
    P = len(senders_list)
    e_max = max((len(s) for s in senders_list), default=0)
    e_pad = max(round_up(max(e_max, 1), edge_chunk), edge_chunk)
    last = num_local - 1
    s_out = np.zeros((P, e_pad), np.int32)
    r_out = np.full((P, e_pad), last, np.int32)
    w_out = np.zeros((P, e_pad), np.float32)
    perm_out = np.zeros((P, e_pad), np.int32)
    ss_out = np.zeros((P, e_pad), np.int32)
    tables, tables_bwd = [], []
    for p in range(P):
        k = len(senders_list[p])
        s_out[p, :k] = senders_list[p]
        r_out[p, :k] = receivers_list[p]
        w_out[p, :k] = weight_list[p]
        tables.append(
            spmm_pallas.build_row_tables(
                r_out[p], num_local, edge_chunk=edge_chunk,
                row_block=row_block,
            )
        )
        order = np.argsort(s_out[p], kind="stable").astype(np.int32)
        ss_out[p] = s_out[p][order]
        # take(g, perm) reorders receiver-order cotangents into sender-
        # sorted order (the csr._gather_bwd convention).
        perm_out[p] = order
        tables_bwd.append(
            spmm_pallas.build_row_tables(
                ss_out[p], num_source_rows, edge_chunk=edge_chunk,
                row_block=row_block,
            )
        )
    r_ss = np.take_along_axis(r_out, perm_out, axis=1)
    w_ss = np.take_along_axis(w_out, perm_out, axis=1)
    return EdgeSetShard(
        senders=s_out, receivers=r_out, weight=w_out,
        tables=_stack_tables(tables),
        perm=perm_out, senders_sorted=ss_out,
        tables_bwd=_stack_tables(tables_bwd),
        num_source_rows=num_source_rows,
        receivers_ss=r_ss, weight_ss=w_ss,
    )


def build_kernel_plan(
    pg: PartitionedGraph,
    *,
    edge_chunk: int = 512,
    row_block: int = 128,
    halo_multiple: int = 8,
) -> KernelPlan:
    """Host-side, once: halo plan + local/remote edge split + kernel tables."""
    plan = build_halo_plan(pg, halo_multiple=halo_multiple)
    P, L = pg.num_parts, pg.nodes_per_part
    h = plan.halo_size

    loc_s, loc_r, loc_w = [], [], []
    rem_s, rem_r, rem_w = [], [], []
    weight = (
        pg.edge_weight
        if pg.edge_weight is not None
        else pg.edge_mask.astype(np.float32)
    )
    for p in range(P):
        mask = pg.edge_mask[p]
        owners = pg.senders_global[p] // L  # int32
        local = mask & (owners == p)
        remote = mask & (owners != p)
        # Boolean selection preserves the receiver-sorted order.
        loc_s.append(plan.senders_local[p][local])
        loc_r.append(pg.receivers_local[p][local])
        loc_w.append(weight[p][local])
        rem_s.append(plan.senders_local[p][remote] - L)  # halo slot ids
        rem_r.append(pg.receivers_local[p][remote])
        rem_w.append(weight[p][remote])

    loc = _build_edge_set(
        loc_s, loc_r, loc_w, L, edge_chunk=edge_chunk,
        row_block=row_block, num_source_rows=L,
    )
    rem = _build_edge_set(
        rem_s, rem_r, rem_w, L, edge_chunk=edge_chunk,
        row_block=row_block, num_source_rows=P * h,
    )
    in_degree = np.stack([
        np.bincount(
            pg.receivers_local[p][pg.edge_mask[p]], minlength=L
        ).astype(np.float32)
        for p in range(P)
    ])
    return KernelPlan(
        loc=loc, rem=rem, send_idx=plan.send_idx, halo_size=h,
        nodes_per_part=L, comm_fraction=plan.comm_fraction,
        in_degree=in_degree,
    )


def _tables_view(arrs: dict, edge_chunk: int, row_block: int, suffix=""):
    return spmm_pallas.RowTables(
        bounds=arrs[f"bounds{suffix}"],
        work_block=arrs[f"work_block{suffix}"],
        work_chunk=arrs[f"work_chunk{suffix}"],
        work_first=arrs[f"work_first{suffix}"],
        work_cfirst=arrs[f"work_cfirst{suffix}"],
        edge_chunk=edge_chunk,
        row_block=row_block,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _kp_gather(src, aux, num_source_rows, edge_chunk, row_block):
    """Edge gather whose backward is permute + Pallas sorted scatter
    (instead of XLA's unsorted scatter-add — ~10x at arxiv scale)."""
    senders = aux[0]
    return jnp.take(src, senders, axis=0)


def _kp_gather_fwd(src, aux, num_source_rows, edge_chunk, row_block):
    return _kp_gather(src, aux, num_source_rows, edge_chunk,
                      row_block), aux


def _kp_gather_bwd(num_source_rows, edge_chunk, row_block, aux, g):
    _senders, perm, ss, bounds, wb, wc, wf, wcf = aux
    tables = spmm_pallas.RowTables(
        bounds=bounds, work_block=wb, work_chunk=wc, work_first=wf,
        work_cfirst=wcf, edge_chunk=edge_chunk, row_block=row_block,
    )
    g_sorted = jnp.take(g, perm, axis=0)
    dsrc = spmm_pallas.scatter_sum_sorted(
        g_sorted, ss, num_source_rows, tables=tables
    )
    return dsrc.astype(g.dtype), None


_kp_gather.defvjp(_kp_gather_fwd, _kp_gather_bwd)


def _tables_from_flat(flat, edge_chunk, row_block):
    return spmm_pallas.RowTables(
        bounds=flat[0], work_block=flat[1], work_chunk=flat[2],
        work_first=flat[3], work_cfirst=flat[4],
        edge_chunk=edge_chunk, row_block=row_block,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _kp_spmm(source, aux, num_local, num_source_rows, edge_chunk,
             row_block):
    """Linear weighted spmm (``out = A_local @ source``) with a
    permutation-free backward: ``d source = A^T g`` gathers the NODE
    cotangent by receivers-in-sender-order and runs the sorted scatter
    over the transposed orientation (the csr._spmm_general design) —
    no [E, F] edge permute appears anywhere in fwd+bwd."""
    senders, receivers, w, fwd_flat, _r_ss, _ss, _w_ss, _bwd_flat = aux
    fwd_t = _tables_from_flat(fwd_flat, edge_chunk, row_block)
    msgs = jnp.take(source, senders, axis=0)
    return spmm_pallas.scatter_sum_sorted(
        msgs, receivers, num_local, tables=fwd_t, weights=w
    )


def _kp_spmm_fwd(source, aux, num_local, num_source_rows, edge_chunk,
                 row_block):
    return _kp_spmm(source, aux, num_local, num_source_rows, edge_chunk,
                    row_block), aux


def _kp_spmm_bwd(num_local, num_source_rows, edge_chunk, row_block,
                 aux, g):
    _s, _r, _w, _fwd_flat, r_ss, ss, w_ss, bwd_flat = aux
    bwd_t = _tables_from_flat(bwd_flat, edge_chunk, row_block)
    msgs = jnp.take(g, r_ss, axis=0)
    dsrc = spmm_pallas.scatter_sum_sorted(
        msgs, ss, num_source_rows, tables=bwd_t, weights=w_ss
    )
    return dsrc.astype(g.dtype), None


_kp_spmm.defvjp(_kp_spmm_fwd, _kp_spmm_bwd)


def plan_device_data(kp: KernelPlan) -> dict:
    """Flatten the plan into a dict of stackable arrays for shard_map
    (everything [P, ...]; static meta carried separately)."""
    out = {"send_idx": kp.send_idx}
    if kp.in_degree is not None:
        out["in_degree"] = kp.in_degree
    for name, es in (("loc", kp.loc), ("rem", kp.rem)):
        out[f"{name}_senders"] = es.senders
        out[f"{name}_receivers"] = es.receivers
        out[f"{name}_weight"] = es.weight
        out[f"{name}_perm"] = es.perm
        out[f"{name}_senders_sorted"] = es.senders_sorted
        out[f"{name}_receivers_ss"] = es.receivers_ss
        out[f"{name}_weight_ss"] = es.weight_ss
        for suffix, ts in (("", es.tables), ("_bwd", es.tables_bwd)):
            out[f"{name}_bounds{suffix}"] = ts.bounds
            out[f"{name}_work_block{suffix}"] = ts.work_block
            out[f"{name}_work_chunk{suffix}"] = ts.work_chunk
            out[f"{name}_work_first{suffix}"] = ts.work_first
            out[f"{name}_work_cfirst{suffix}"] = ts.work_cfirst
    return out


def spmm_local_overlapped(
    h_local: jax.Array,
    shard: dict,
    kp_meta: KernelPlan,
    *,
    axis: str = "graph",
    message_scale: jax.Array | None = None,
    unit_weights: bool = False,
) -> jax.Array:
    """Per-chip (inside shard_map): ``out = A_local h + A_remote halo(h)``.

    ``shard`` holds this chip's slices of :func:`plan_device_data` (leading
    partition axis already dropped). The local scatter has no data
    dependence on the ``all_to_all``, so XLA overlaps the collective with
    it. ``message_scale``: optional extra per-edge multiplier pairs
    ``(loc_scale, rem_scale)`` (e.g. dropout masks); normalization weights
    are already fused via the plan. ``unit_weights=True`` replaces the
    plan's weights with their validity indicator (1 real / 0 padded) — the
    GIN/SAGE sum semantics on a plan that may carry GCN norm weights.
    """
    L = kp_meta.nodes_per_part
    ec, rb = kp_meta.loc.tables.edge_chunk, kp_meta.loc.tables.row_block

    # Halo send rows -> all_to_all (async; overlaps the local scatter).
    p_, h_ = shard["send_idx"].shape
    send = jnp.take(h_local, shard["send_idx"].reshape(-1), axis=0)
    recv = jax.lax.all_to_all(
        send.reshape(p_, h_, -1), axis, split_axis=0, concat_axis=0
    )
    halo = recv.reshape(p_ * h_, h_local.shape[-1])

    def _scatter(table_prefix, source, num_source_rows):
        sub = {
            k[len(table_prefix) + 1:]: v
            for k, v in shard.items() if k.startswith(table_prefix + "_")
        }
        fwd_flat = tuple(
            sub[k] for k in ("bounds", "work_block", "work_chunk",
                             "work_first", "work_cfirst")
        )
        bwd_flat = tuple(
            sub[f"{k}_bwd"] for k in ("bounds", "work_block", "work_chunk",
                                      "work_first", "work_cfirst")
        )
        w = sub["weight"]
        w_ss = sub["weight_ss"]
        if unit_weights:
            w = (w != 0).astype(h_local.dtype)
            w_ss = (w_ss != 0).astype(h_local.dtype)
        else:
            w = w.astype(h_local.dtype)
            w_ss = w_ss.astype(h_local.dtype)
        if message_scale is None:
            # Linear path: permutation-free fused spmm VJP.
            aux = (
                sub["senders"], sub["receivers"], w, fwd_flat,
                sub["receivers_ss"],
                sub["senders_sorted"],
                w_ss,
                bwd_flat,
            )
            return _kp_spmm(source, aux, L, num_source_rows, ec, rb)
        # Dropout breaks linearity: gather (sorted-scatter VJP), scale,
        # weighted scatter.
        aux = (
            sub["senders"], sub["perm"], sub["senders_sorted"],
        ) + bwd_flat
        msgs = _kp_gather(source, aux, num_source_rows, ec, rb)
        msgs = msgs * message_scale[table_prefix][:, None]
        tables = _tables_view(sub, ec, rb)
        return spmm_pallas.scatter_sum_sorted(
            msgs, sub["receivers"], L, tables=tables, weights=w,
        )

    out_local = _scatter("loc", h_local, kp_meta.loc.num_source_rows)
    # Chain the remote gather BEHIND the local scatter: XLA co-schedules
    # independent random gathers and they thrash (~2.5x each,
    # benchmarks/lottery_probe.py r4 — the "three_takes_distinct" row).
    # The ideal schedule is exactly this order anyway: the all_to_all
    # runs during the local scatter, and the remote aggregation follows.
    # chain_after is an optimization_barrier — NaN-proof AND fold-proof
    # (the arithmetic +0 trick gets simplified away; ADVICE r4 + r5).
    shard = dict(shard)
    shard["rem_senders"] = csr.chain_after(
        shard["rem_senders"], out_local
    )
    out_remote = _scatter("rem", halo, kp_meta.rem.num_source_rows)
    return out_local + out_remote


def pooled_max_local(
    h_local: jax.Array,
    shard: dict,
    kp_meta: KernelPlan,
    apply_mlp,
    *,
    axis: str = "graph",
    message_scale: dict | None = None,
) -> jax.Array:
    """Per-chip kernelized SAGE *pooling* aggregation (VERDICT r4 item
    6): per-edge MLP -> per-receiver MAX over the kernel plan's loc/rem
    streams via :func:`spmm_pallas.segment_max_wide_sorted`.

    Each stream's partial max keeps empty rows at the finite sentinel
    (``empty_to_zero=False``) so the two streams combine with one
    ``jnp.maximum`` before the reference empty->0 fixup — combining
    post-fixup zeros would beat genuine negative maxes. ``apply_mlp``
    maps the gathered ``[E, F_in]`` messages to pool space (the
    reference's Dense+relu, sage_conv.py pooling aggregator);
    ``message_scale`` follows the kernelized per-EDGE dropout
    convention of :func:`spmm_local_overlapped`.
    """
    from ..kernels.spmm_pallas import _NEG_SENTINEL

    L = kp_meta.nodes_per_part
    ec, rb = kp_meta.loc.tables.edge_chunk, kp_meta.loc.tables.row_block

    p_, h_ = shard["send_idx"].shape
    send = jnp.take(h_local, shard["send_idx"].reshape(-1), axis=0)
    recv = jax.lax.all_to_all(
        send.reshape(p_, h_, -1), axis, split_axis=0, concat_axis=0
    )
    halo = recv.reshape(p_ * h_, h_local.shape[-1])

    def _stream_max(table_prefix, source, num_source_rows):
        sub = {
            k[len(table_prefix) + 1:]: v
            for k, v in shard.items() if k.startswith(table_prefix + "_")
        }
        bwd_flat = tuple(
            sub[f"{k}_bwd"] for k in ("bounds", "work_block",
                                      "work_chunk", "work_first",
                                      "work_cfirst")
        )
        aux = (
            sub["senders"], sub["perm"], sub["senders_sorted"],
        ) + bwd_flat
        msgs = _kp_gather(source, aux, num_source_rows, ec, rb)
        if message_scale is not None:
            msgs = msgs * message_scale[table_prefix][:, None]
        msgs = apply_mlp(msgs)
        valid = (sub["weight"] != 0).astype(jnp.float32)
        tables = _tables_view(sub, ec, rb)
        return spmm_pallas.segment_max_wide_sorted(
            msgs, sub["receivers"], L, tables=tables, mask=valid,
            empty_to_zero=False,
        )

    max_local = _stream_max("loc", h_local, kp_meta.loc.num_source_rows)
    shard = dict(shard)
    shard["rem_senders"] = csr.chain_after(
        shard["rem_senders"], max_local
    )
    max_remote = _stream_max("rem", halo, kp_meta.rem.num_source_rows)
    out = jnp.maximum(max_local, max_remote)
    return jnp.where(
        out <= _NEG_SENTINEL / 2, jnp.zeros_like(out), out
    ).astype(h_local.dtype)
