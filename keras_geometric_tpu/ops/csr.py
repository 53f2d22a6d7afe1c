"""Preprocessed CSR graph context: everything the hot path needs, computed once.

SURVEY.md §7.4 item 2: the backward pass of the edge gather (dL/dx_j) is an
SpMM over the *transposed* graph — so preprocessing builds **both CSR
orientations** up front:

- receiver-sorted edges + row tables: forward scatter runs the Pallas
  sorted-SpMM kernel;
- sender-sorted permutation + row tables: the gather's backward becomes
  ``permute cotangents -> Pallas sorted scatter`` instead of XLA's slow
  unsorted scatter-add.

``GraphContext.gather(h)`` is the custom-VJP edge gather wired this way;
``GraphContext.scatter(messages)`` is the forward scatter. Conv layers and
benchmarks use these through one object built by :func:`prepare_graph`.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import (
    attend_pallas,
    band_pallas,
    sddmm_pallas,
    softmax_pallas,
    spmm_pallas,
)
from .. import native

__all__ = ["GraphContext", "prepare_graph", "chain_after"]


def chain_after(value: jax.Array, *deps: jax.Array) -> jax.Array:
    """Return ``value`` unchanged but data-dependent on every ``dep``.

    Used on a gather's index vector to serialize that gather behind
    earlier work: XLA co-schedules independent random gathers and they
    thrash (~2.5x each, benchmarks/lottery_probe.py r4), so dependent
    ops must be CHAINED. Implemented with ``lax.optimization_barrier``
    — the r3/r4 arithmetic trick ``idx + (t*0).astype(int32)`` is both
    NaN-unsafe (NaN*0 -> NaN -> implementation-defined int cast
    corrupts indices, ADVICE r4) and fragile the NaN-safe way
    (``nan_to_num(t)*0`` is provably finite, so XLA's algebraic
    simplifier folds it to 0 and deletes the dependency — measured in
    the r5 send-bwd probe: the "chained" gathers co-scheduled at 2x).
    The barrier ties the returned value to the deps structurally and
    cannot be simplified away.
    """
    out = jax.lax.optimization_barrier((value, *deps))
    return out[0]


class GraphContext(NamedTuple):
    """Static per-graph device/host state for the sorted SpMM path."""

    senders: jax.Array  # [E] int32, receiver-sorted order
    receivers: jax.Array  # [E] int32, non-decreasing
    edge_weight: jax.Array | None  # [E] f32 (e.g. GCN norm) or None
    num_nodes: int
    fwd_tables: spmm_pallas.RowTables  # receiver-sorted scatter tables
    bwd_perm: jax.Array  # [E] int32: receiver-order edge -> sender-sorted pos
    senders_sorted: jax.Array  # [E] int32 sender-sorted (for bwd scatter)
    bwd_tables: spmm_pallas.RowTables  # sender-sorted scatter tables
    num_real_edges: int = -1  # unpadded edge count
    edge_mask: jax.Array | None = None  # [E] bool, False on padded slots
    in_degree: jax.Array | None = None  # [N] f32 receiver in-degree (real)
    is_symmetric: bool = False  # weighted adjacency equals its transpose
    # Densified diagonal (prepare_graph(densify_self_loops=True)): appended
    # self-loops are removed from the edge stream and applied as a dense
    # elementwise term ``self_weight[:, None] * h`` in spmm() — ~13% of
    # ogbn-arxiv's edges never touch the gather/scatter path.
    self_weight: jax.Array | None = None  # [N] f32 or None
    num_diag: int = 0  # densified self-loop count (for edge accounting)
    # pad_nodes=True: num_nodes is rounded up to the scatter row-block
    # grain so the kernel's [n_pad, F] output needs no trailing slice-copy
    # (a full [N, F] HBM pass per scatter otherwise). num_real_nodes keeps
    # the true count for reporting/loss masking.
    num_real_nodes: int = -1
    # Expand-optimal tables (row_block=128): the expand kernel streams node
    # blocks many times per chunk, so smaller row blocks win; the scatter
    # kernel prefers 256 (fewer boundary-chunk re-reads). Falls back to
    # fwd_tables when absent.
    expand_tables: spmm_pallas.RowTables | None = None
    # Sender-sorted companions for the fused general-spmm VJP: receivers
    # and weights reordered by the sender sort. The backward of a LINEAR
    # spmm is A^T @ g with g a NODE array — gather g by
    # receivers-in-sender-order (a cheap [N, F]-source take) instead of
    # permuting an [E, F] edge array (XLA's bf16 edge permutation costs
    # ~18 ms at ogbn-arxiv scale).
    receivers_ss: jax.Array | None = None  # [E] int32
    edge_weight_ss: jax.Array | None = None  # [E]
    # True when edge_weight is the all-ones vector (zero on pads): layers
    # whose reference semantics ignore edge weights (GIN/SAGE) may then
    # route sum/mean aggregation through spmm()/spmm_mean().
    has_unit_weights: bool = False
    # Static edge-validity in SENDER-sorted order (1.0 real / 0.0 padded):
    # the permutation-free attend backward folds this into the sender
    # kernel's interval indicator. None when no padded slots exist.
    edge_mask_ss: jax.Array | None = None
    # Banded-dense tier (prepare_graph(band_window=...)): locality-fitting
    # edges live in a dense [n_pad, W] band (kernels/band_pallas.py) and
    # are ABSENT from the CSR edge stream above (which holds only the
    # residual). band_bwd is the transposed orientation's plan (None when
    # is_symmetric — the band is then self-transpose). spmm()/spmm_mean()
    # sum both tiers; per-edge ops (gather/attend/edge_softmax) route to
    # the full-stream companion below (or reject when it was opted out).
    band: band_pallas.BandPlan | None = None
    band_bwd: band_pallas.BandPlan | None = None
    num_band_edges: int = 0
    # Full-stream companion (r4, VERDICT r3 item 3): contexts whose CSR
    # stream is incomplete for per-edge ops — banded (band edges leave
    # the stream) or densified (self-loops leave the stream) — carry a
    # second context holding EVERY edge, same padded node count, built
    # by prepare_graph(attend_full_stream=True) (the default). Per-edge
    # ops (gather/attend/edge_softmax/sddmm) route through it, so ONE
    # prepared object serves both linear (band-accelerated) and
    # attention layers.
    full: Any = None  # GraphContext | None
    # Banded-attention backward tables (prepare_graph(attend_window=W),
    # r5): after a locality reordering, most senders of each receiver-
    # sorted edge chunk fall in one W-aligned node window, so the fused
    # attend backward's sender finish scatters them via an equality
    # one-hot MXU contraction (kernels/band_pallas.window_scatter_sum)
    # with NO random access; only the residual minority rides the
    # [E, H*F] permute — whose take cost is proportional to its index
    # count (r5 measurement), so it shrinks with the residual. Exact
    # math, any graph; pays on community-structured ones.
    attw_plan: Any = None  # band_pallas.WindowScatterPlan | None
    attw_sender: jax.Array | None = None  # [E_pad] int32, -1 off-window
    attw_perm_res: jax.Array | None = None  # [Er_pad] int32 into v
    attw_res_weight: jax.Array | None = None  # [Er_pad] f32 1/0 validity
    attw_senders_res: jax.Array | None = None  # [Er_pad] int32 sorted
    attw_res_tables: spmm_pallas.RowTables | None = None

    @property
    def num_edges(self) -> int:
        base = (
            self.num_real_edges
            if self.num_real_edges >= 0
            else int(self.senders.shape[0])
        )
        return base + self.num_diag + self.num_band_edges

    def full_stream(self) -> "GraphContext":
        """The context to use for per-edge ops: ``self`` when the CSR
        stream already holds every edge; the attached ``full`` companion
        when band/densify moved edges out of the stream."""
        if self.band is None and self.num_diag == 0:
            return self
        if self.full is not None:
            return self.full
        raise ValueError(
            "This context's CSR stream is incomplete for per-edge ops "
            "(band_window= moves band edges out of the stream; "
            "densify_self_loops=True moves self-loops out). Prepare "
            "with attend_full_stream=True (the default) to attach a "
            "full-stream companion, or prepare without band/densify."
        )

    def _require_full_stream(self, op: str) -> None:
        del op
        self.full_stream()  # raises with the explanation when invalid

    @property
    def edge_index(self) -> jax.Array:
        return jnp.stack([self.senders, self.receivers])

    def gather(self, h: jax.Array) -> jax.Array:
        """``[N, F] -> [E, F]`` sender-row gather with a sorted-scatter
        VJP. Routes to the full-stream companion on band/densified
        contexts (per-edge semantics need every edge)."""
        ctx = self.full_stream()
        return _gather_rows(
            h,
            (ctx.senders, ctx.bwd_perm, ctx.senders_sorted),
            ctx.bwd_tables,
            ctx.num_nodes,
        )

    def _check_message_stream(self, messages: jax.Array) -> None:
        """Band/densified contexts route gather()/attend() to the
        full-stream companion but scatter over THIS context's residual
        stream — mixing the two must fail loudly, not via a downstream
        shape mismatch (or silently when the counts coincide). ADVICE r4."""
        if messages.shape[0] != self.receivers.shape[0]:
            hint = ""
            if self.band is not None or self.num_diag:
                hint = (
                    " This context is banded/densified: its CSR stream "
                    "holds only residual edges, while per-edge ops "
                    "(gather/attend/edge_softmax) route through the "
                    "full-stream companion — scatter through "
                    "ctx.full_stream() for messages produced there."
                )
            raise ValueError(
                f"scatter got {messages.shape[0]} messages but this "
                f"context's edge stream has {self.receivers.shape[0]} "
                f"slots.{hint}"
            )

    def scatter(
        self, messages: jax.Array, *, masked: bool = False
    ) -> jax.Array:
        """``[E, F] -> [N, F]`` receiver scatter-sum (Pallas sorted kernel).

        ``masked=True`` zeroes padded edge slots first — needed whenever the
        messages were not already nulled by a zero edge weight.
        """
        self._check_message_stream(messages)
        return spmm_pallas.scatter_sum_sorted(
            messages,
            self.receivers,
            self.num_nodes,
            tables=self.fwd_tables,
            mask=self.edge_mask if masked else None,
        )

    def scatter_mean(self, messages: jax.Array, *, masked: bool = True):
        """Mean aggregation with the reference 1e-8 degree clamp."""
        total = self.scatter(messages, masked=masked)
        deg = jnp.maximum(self.in_degree, 1e-8).astype(total.dtype)
        return total / deg[:, None]

    def gather_receivers(self, h: jax.Array) -> jax.Array:
        """``[N, F] -> [E, F]`` receiver-row gather (x_i) via the sorted
        expand kernel — sequential streaming both directions, and its
        backward is the sorted scatter (same tables)."""
        return spmm_pallas.expand_sorted(
            h,
            self.receivers,
            tables=self.expand_tables or self.fwd_tables,
        )

    def scatter_weighted(self, messages: jax.Array) -> jax.Array:
        """Scatter with the per-edge weights fused into the kernel (no
        separate [E, F] weighting pass; padded slots carry zero weight)."""
        self._check_message_stream(messages)
        return spmm_pallas.scatter_sum_sorted(
            messages,
            self.receivers,
            self.num_nodes,
            tables=self.fwd_tables,
            weights=self.edge_weight,
        )


    def edge_softmax(self, scores: jax.Array, *, eps: float = 1e-10):
        """Reference-exact per-receiver softmax of ``[E, K]`` edge scores.

        Max-shifted with ``+eps`` in the denominator (the reference's
        GATv2 ``_softmax_by_target``, gatv2_conv.py:291-311), computed in
        TWO fused Pallas passes (kernels/softmax_pallas.py): an online
        max+sum-exp stats pass and an expand-shaped apply pass. XLA's
        segment ops on [E, heads] data cost ~35 ms at ogbn-arxiv scale
        (16-byte rows are pure gather/scatter latency).

        The custom VJP applies the exact softmax Jacobian
        ``ds = a*(da - sum_row(a*da))`` (one scatter + one expand); the
        eps-scale subgradient through the max shift (relative magnitude
        ~eps) is dropped. Masked (padded) slots get weight 0 and zero
        gradient.
        """
        ctx = self.full_stream()
        return _edge_softmax(
            scores,
            (ctx.receivers, ctx.edge_mask),
            ctx.fwd_tables,
            ctx.expand_tables or ctx.fwd_tables,
            ctx.num_nodes,
            eps,
        )

    def sddmm_scores(
        self,
        ht: jax.Array,
        hj: jax.Array,
        att: jax.Array,
        *,
        negative_slope: float = 0.2,
    ) -> jax.Array:
        """Fused GATv2 attention scores ``[E, H]`` (f32) with a Pallas
        forward AND backward (kernels/sddmm_pallas.py).

        Replaces the XLA elementwise chain over ``[E, H, F]``
        (gatv2_conv.py:268-284 semantics) — measured ~18 ms at arxiv
        scale vs ~3 ms fused. ``hj`` must be the receiver-sorted gathered
        sender rows (``self.gather(ht)``); its cotangent flows back
        through the caller's gather. Padded edge slots return garbage —
        mask downstream (edge_softmax does).
        """
        ctx = self.full_stream()
        return _sddmm(
            ht,
            hj,
            att,
            (ctx.receivers,),
            ctx.expand_tables or ctx.fwd_tables,
            ctx.fwd_tables,
            ctx.num_nodes,
            float(negative_slope),
        )

    def attend(
        self,
        ht: jax.Array,
        att: jax.Array,
        *,
        negative_slope: float = 0.2,
        eps: float = 1e-10,
        drop_mask: jax.Array | None = None,
        drop_mask_ss: jax.Array | None = None,
    ) -> jax.Array:
        """Fused GATv2 attention propagate with a permutation-free VJP.

        Computes the reference pipeline (gatv2_conv.py:268-335) in one op:
        ``score = Σ_f att·leaky_relu(h_i+h_j)`` per head, max-shifted
        per-receiver softmax with ``+eps``, optional attention dropout
        (``drop_mask`` = pre-scaled keep mask, [E, H]), then the
        α-weighted aggregation — ``ht`` is ``[N, H·F]``, ``att`` is
        ``[H, F]``, output ``[N, H·F]``.

        The backward touches random memory exactly ONCE: the receiver-
        grid pass builds the total per-edge sender cotangent from
        block-streamed expands, and a single ``[E, H·F]`` permute +
        sorted scatter finishes the sender side — the measured optimum
        on this stack, where any program with >1 large materializing
        gather degrades every gather ~2x (see ATTEND_BWD_MODE; the r5
        sender-grid recompute alternative is kept selectable).
        ``drop_mask_ss`` (the same dropout mask in sender-sorted order,
        generated permute-free by ops/edge_dropout.attention_keep_masks)
        is only consumed by that alternative mode.
        """
        ctx = self.full_stream()
        h = int(att.shape[0])
        return _gatv2_attend(
            ht,
            att,
            (
                ctx.senders,
                ctx.receivers,
                ctx.edge_mask,
                ctx.bwd_perm,
                ctx.senders_sorted,
                ctx.receivers_ss,
                drop_mask,
                ctx.edge_mask_ss,
                drop_mask_ss,
                ctx.attw_sender,
                ctx.attw_perm_res,
                ctx.attw_res_weight,
                ctx.attw_senders_res,
            ),
            ctx.fwd_tables,
            ctx.expand_tables or ctx.fwd_tables,
            ctx.bwd_tables,
            ctx.num_nodes,
            h,
            float(negative_slope),
            float(eps),
            ctx.attw_plan,
            ctx.attw_res_tables,
        )

    def spmm(self, h: jax.Array) -> jax.Array:
        """Full ``A @ h``: gather senders, weighted-scatter to receivers
        (weights fused in-kernel).

        When the weighted adjacency is symmetric (``is_symmetric``, e.g.
        GCN normalization on an undirected graph), the VJP is the same
        operator (``Aᵀ = A``) — the backward runs the identical
        gather+scatter instead of the expand + permutation + transposed
        scatter chain, saving a full random permutation pass.

        With a banded tier (``band_window=``), ``A = B + R``: the band
        part runs as dense MXU matmuls (kernels/band_pallas.py) and the
        residual through the CSR path below; both splits are
        transpose-stable so the VJP composes additively.
        """
        if self.band is not None:
            out = band_pallas.band_spmm(
                h, self.band,
                None if self.is_symmetric else self.band_bwd,
            )
            if self.num_real_edges > 0:
                out = out + self._csr_spmm(h)
            elif self.self_weight is not None:
                out = out + h * self.self_weight[:, None].astype(h.dtype)
            return out
        return self._csr_spmm(h)

    def _csr_spmm(self, h: jax.Array) -> jax.Array:
        if self.is_symmetric:
            return _spmm_symmetric(
                h,
                (self.senders, self.receivers, self.edge_weight,
                 self.self_weight),
                self.fwd_tables,
                self.num_nodes,
            )
        if self.receivers_ss is not None and self.edge_weight is not None:
            return _spmm_general(
                h,
                (self.senders, self.receivers, self.edge_weight,
                 self.receivers_ss, self.senders_sorted,
                 self.edge_weight_ss, self.self_weight),
                self.fwd_tables,
                self.bwd_tables,
                self.num_nodes,
            )
        messages = _gather_rows(
            h,
            (self.senders, self.bwd_perm, self.senders_sorted),
            self.bwd_tables,
            self.num_nodes,
        )
        out = self.scatter_weighted(messages)
        if self.self_weight is not None:
            out = out + h * self.self_weight[:, None].astype(h.dtype)
        return out

    def spmm_mean(self, h: jax.Array) -> jax.Array:
        """Mean-aggregated spmm: ``(A @ h) / max(in_degree, 1e-8)``.

        Valid for unit edge weights (``has_unit_weights``); the division
        composes with the fused spmm VJP, so the backward is also
        permutation-free.
        """
        deg = jnp.maximum(self.in_degree, 1e-8).astype(h.dtype)
        return self.spmm(h) / deg[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows(h, idx, bwd_tables, num_nodes):
    senders, _perm, _ss = idx
    return jnp.take(h, senders, axis=0)


def _gather_fwd(h, idx, bwd_tables, num_nodes):
    return _gather_rows(h, idx, bwd_tables, num_nodes), idx


def _gather_bwd(bwd_tables, num_nodes, idx, g):
    _senders, perm, senders_sorted = idx
    # Reorder per-edge cotangents into sender-sorted order, then run the
    # sorted Pallas scatter — replaces XLA's unsorted scatter-add.
    g_sorted = jnp.take(g, perm, axis=0)
    dh = spmm_pallas.scatter_sum_sorted(
        g_sorted, senders_sorted, num_nodes, tables=bwd_tables
    )
    return dh, None


_gather_rows.defvjp(_gather_fwd, _gather_bwd)




@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _edge_softmax(scores, aux, fwd_tables, exp_tables, num_nodes, eps):
    receivers, edge_mask = aux
    dtype = scores.dtype
    # Masked (padded) slots become -inf and then exp() to exactly 0 in
    # both fused passes — no mask plumbing inside the kernels.
    if edge_mask is not None:
        scores = jnp.where(
            edge_mask[:, None], scores,
            jnp.full_like(scores, -jnp.inf),
        )
    m, l = softmax_pallas.softmax_stats_sorted(
        scores, num_nodes, tables=fwd_tables
    )
    return softmax_pallas.softmax_apply_sorted(
        scores, m, l, tables=exp_tables, eps=eps, out_dtype=dtype
    )


def _edge_softmax_fwd(scores, aux, fwd_tables, exp_tables, num_nodes, eps):
    alpha = _edge_softmax(scores, aux, fwd_tables, exp_tables, num_nodes, eps)
    return alpha, (alpha, aux)


def _edge_softmax_bwd(fwd_tables, exp_tables, num_nodes, eps, res, dalpha):
    alpha, aux = res
    receivers, _ = aux
    prod = alpha * dalpha
    rho = spmm_pallas.scatter_sum_sorted(
        prod, receivers, num_nodes, tables=fwd_tables
    )
    rho_e = spmm_pallas.expand_sorted(
        rho, receivers, alpha.shape[0], tables=exp_tables
    )
    return prod - alpha * rho_e, None


_edge_softmax.defvjp(_edge_softmax_fwd, _edge_softmax_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sddmm(ht, hj, att, aux, exp_tables, fwd_tables, num_nodes, slope):
    del aux
    return sddmm_pallas.sddmm_scores_sorted(
        ht, hj, att, tables=exp_tables, negative_slope=slope
    )


def _sddmm_fwd(ht, hj, att, aux, exp_tables, fwd_tables, num_nodes, slope):
    out = _sddmm(ht, hj, att, aux, exp_tables, fwd_tables, num_nodes, slope)
    return out, (ht, hj, att, aux)


def _sddmm_bwd(exp_tables, fwd_tables, num_nodes, slope, res, g):
    ht, hj, att, aux = res
    (receivers,) = aux
    # d_pre is the cotangent of BOTH endpoints (pre = hi + hj): the
    # receiver side scatters by the already-sorted receivers; the sender
    # side returns as d hj and flows through the caller's gather VJP.
    d_pre, datt = sddmm_pallas.sddmm_bwd_sorted(
        ht, hj, att, g, tables=exp_tables, negative_slope=slope
    )
    dht = spmm_pallas.scatter_sum_sorted(
        d_pre, receivers, num_nodes, tables=fwd_tables
    ).astype(ht.dtype)
    return dht, d_pre.astype(hj.dtype), datt, None


_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def _attend_fwd_compute(ht, att, arrays, fwd_tables, exp_tables, num_nodes,
                        heads, negative_slope, eps):
    """Kernel-complete fused attention forward: random gather + ONE
    kernel (kernels/sddmm_pallas.sddmm_stats_agg_sorted — r4 fuses the
    SDDMM scores, the online softmax stats AND the alpha-weighted
    aggregation into a single pass; the r3 two-pass layout cost ~17 ms
    at arxiv scale, benchmarks/RESULTS.md). alpha never hits HBM; padded
    slots (inside the last row's intervals) are -inf'd in-kernel."""
    senders, receivers, edge_mask, drop_mask = (
        arrays[0], arrays[1], arrays[2], arrays[6]
    )
    f = att.shape[-1]
    hj = jnp.take(ht, senders, axis=0)  # [E, H*F] random gather
    if ATTEND_SCORE_CACHE:
        out, scores, m, l = sddmm_pallas.sddmm_stats_agg_sorted(
            ht, hj, att.reshape(heads, f), tables=fwd_tables,
            num_nodes=num_nodes, edge_valid=edge_mask,
            negative_slope=negative_slope, eps=eps, drop_mask=drop_mask,
            emit_scores=True,
        )
    else:
        # No-score-cache mode (r5, selectable): the backward recomputes
        # s in-register (bit-exact), skipping the [E, H] f32 score
        # stream (686 MB physical at arxiv scale, written once + read
        # twice) — but the rho pass's recompute costs MORE than the
        # stream saves end-to-end (benchmarks/RESULTS.md r5 correction:
        # the original "-7.7%" read compared different edge counts).
        scores = None
        out, m, l = sddmm_pallas.sddmm_stats_agg_sorted(
            ht, hj, att.reshape(heads, f), tables=fwd_tables,
            num_nodes=num_nodes, edge_valid=edge_mask,
            negative_slope=negative_slope, eps=eps, drop_mask=drop_mask,
            emit_scores=False,
        )
    return out[:num_nodes], (hj, scores, m, l)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def _gatv2_attend(ht, att, arrays, fwd_tables, exp_tables, bwd_tables,
                  num_nodes, heads, negative_slope, eps,
                  attw_plan=None, attw_res_tables=None):
    out, _ = _attend_fwd_compute(
        ht, att, arrays, fwd_tables, exp_tables, num_nodes, heads,
        negative_slope, eps,
    )
    return out


def _gatv2_attend_fwd(ht, att, arrays, fwd_tables, exp_tables, bwd_tables,
                      num_nodes, heads, negative_slope, eps,
                      attw_plan=None, attw_res_tables=None):
    out, (hj, scores, m, l) = _attend_fwd_compute(
        ht, att, arrays, fwd_tables, exp_tables, num_nodes, heads,
        negative_slope, eps,
    )
    return out, (ht, att, arrays, hj, scores, m, l)


# Backward strategy for the fused attend (single-chip):
#
# - "permute" (DEFAULT): ONE [E, H*F] edge permute + sorted scatter
#   finishes the sender side. The permute's E-row source sits beyond
#   the ~128 MB gather cliff (~15.9 ms at arxiv scale), but it is the
#   program's ONLY large random access.
# - "send": the r5 sender-grid recompute (attend_send_bwd_sorted) —
#   three gathers by receivers-in-sender-order + in-register recompute.
#   BUILT AND MEASURED SLOWER (benchmarks/send_bwd_probe.py, r5): any
#   program with more than one large materializing gather degrades
#   EVERY gather to ~2x its solo cost — independent, dependency-chained
#   (optimization_barrier) and concat-fused forms all measured 27.6 to
#   44.2 ms for the three takes vs 15.9 ms for the single permute, and
#   sources wider than 256 lanes hit a second cliff (108 MB @ 320
#   lanes: 20.7 ms). The r4 lottery probe's "~0.1 ms marginal chained
#   takes" were scalar-REDUCED gathers XLA fused into one loop; the
#   discount does not exist for materializing takes. Kept selectable
#   for regression probes; the empirical law on this stack is ONE
#   random access per program.
ATTEND_BWD_MODE = "permute"

# Score cache (r5 re-adjudication): r4's fused forward emits the [E, H]
# f32 scores so the two backward passes read instead of recompute; the
# r5 session deleted it after comparing a 1.166M-edge no-cache run
# against the 1.335M-edge r4 perf row — per-edge, no-cache is ~5-8%
# SLOWER (cached 56.0/50.5 ms vs no-cache 60.4/54.1 on the uniform /
# community perf_suite rows; the rho pass's in-register recompute costs
# more than the score stream it saves). Cached is the default again;
# False keeps the no-cache pipeline selectable for probes.
ATTEND_SCORE_CACHE = True


def _gatv2_attend_bwd(fwd_tables, exp_tables, bwd_tables, num_nodes, heads,
                      negative_slope, eps, attw_plan, attw_res_tables,
                      res, g):
    """Single-permute kernel-complete backward (see ATTEND_BWD_MODE):

    1. ``attend_rho_sorted`` (receiver grid): the softmax-Jacobian row
       term rho (r4 slim: no d_alpha stream — the next pass recomputes
       it in-register from the same g expand);
    2. ``attend_recv_bwd_full_sorted`` (receiver grid): ds = alpha
       (d_alpha - rho_e), d_pre formed in-register and scattered
       straight into d ht; emits datt and (permute mode) the per-edge
       sender cotangent ``v = alpha_keep * g[recv] + d_pre``;
    3. ``take(v, perm)`` + sorted scatter over the transposed tables —
       or, with ``attend_window=`` tables present, the banded finish:
       window-eligible edges scatter via the equality one-hot MXU
       kernel (no random access) and only the residual minority rides
       a (proportionally cheaper) permute — or, in "send" mode, the
       measured-slower sender-grid recompute.
    """
    ht, att, arrays, hj, scores, m, l = res
    (_senders, receivers, mask, perm, senders_sorted, r_ss,
     drop_mask, mask_ss, drop_ss, attw_sender, attw_perm_res,
     attw_res_weight, attw_senders_res) = arrays
    f = att.shape[-1]
    att_hf = att.reshape(heads, f)

    rho = attend_pallas.attend_rho_sorted(
        g, scores, m, l, hj, tables=fwd_tables, eps=eps,
        drop_mask=drop_mask, rows=ht, att=att_hf,
        negative_slope=negative_slope, edge_valid=mask,
    )
    use_send = ATTEND_BWD_MODE == "send" and (
        drop_mask is None or drop_ss is not None
    )
    if use_send:
        dht, datt = attend_pallas.attend_recv_bwd_full_sorted(
            ht, g, hj, att_hf, scores, m, l, rho,
            tables=fwd_tables, eps=eps, negative_slope=negative_slope,
            drop_mask=drop_mask, emit_v=False, edge_valid=mask,
        )
        dht = dht[: ht.shape[0]]
        gb = g.astype(ht.dtype)
        # Serialize: gathers must not co-schedule with each other OR
        # with the Pallas passes (measured destructive overlap, r5
        # probe) — chain the first take behind the recv pass, then each
        # take behind the previous.
        idx1 = chain_after(r_ss, dht)
        g_r = jnp.take(gb, idx1, axis=0)
        idx2 = chain_after(r_ss, g_r)
        ht_r = jnp.take(ht, idx2, axis=0)
        stats = jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32),
             rho.astype(jnp.float32)[: m.shape[0]]], axis=1,
        )
        idx3 = chain_after(r_ss, ht_r)
        stats_r = jnp.take(stats, idx3, axis=0)
        dht_send = attend_pallas.attend_send_bwd_sorted(
            ht, g_r, ht_r, stats_r, att_hf, tables=bwd_tables,
            eps=eps, negative_slope=negative_slope,
            valid_ss=mask_ss, drop_ss=drop_ss,
        )
        dht = dht + dht_send[: ht.shape[0]]
    else:
        dht, datt, v = attend_pallas.attend_recv_bwd_full_sorted(
            ht, g, hj, att_hf, scores, m, l, rho,
            tables=fwd_tables, eps=eps, negative_slope=negative_slope,
            drop_mask=drop_mask, edge_valid=mask,
        )
        dht = dht[: ht.shape[0]]
        if attw_plan is not None:
            # Banded finish (r5): window-eligible edges sum into their
            # senders' rows via the equality one-hot MXU contraction —
            # receiver-sorted order is fine, no permute, no random
            # access. The residual minority is extracted by a take
            # whose cost tracks its INDEX count (benchmarks r5) and
            # runs the standard sorted scatter over residual tables.
            dht_band = band_pallas.window_scatter_sum(
                v, attw_sender, attw_plan
            )
            v_res = jnp.take(v, attw_perm_res, axis=0)
            dht_res = spmm_pallas.scatter_sum_sorted(
                v_res, attw_senders_res, num_nodes,
                tables=attw_res_tables, weights=attw_res_weight,
            )
            dht = (
                dht + dht_band[: ht.shape[0]] + dht_res[: ht.shape[0]]
            )
        else:
            dht_send = spmm_pallas.scatter_sum_sorted(
                jnp.take(v, perm, axis=0),
                senders_sorted,
                num_nodes,
                tables=bwd_tables,
            )
            dht = dht + dht_send[: ht.shape[0]]
    return dht.astype(ht.dtype), datt.reshape(att.shape), None


_gatv2_attend.defvjp(_gatv2_attend_fwd, _gatv2_attend_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _spmm_general(h, arrays, fwd_tables, bwd_tables, num_nodes):
    """Weighted spmm over a (possibly) asymmetric adjacency with a
    permutation-free backward.

    Forward: gather senders (receiver-sorted order) + weighted Pallas
    scatter. Backward: ``dh = A^T g`` built DIRECTLY in sender-sorted
    order — gather the node cotangent by receivers-in-sender-order and
    run the sorted scatter over the transposed orientation. Valid
    whenever the per-edge message is linear in h (the weights commute),
    which is exactly when callers use spmm()."""
    senders, receivers, w, _r_ss, _s_ss, _w_ss, self_weight = arrays
    messages = jnp.take(h, senders, axis=0)
    out = spmm_pallas.scatter_sum_sorted(
        messages, receivers, num_nodes, tables=fwd_tables, weights=w
    )
    if self_weight is not None:
        out = out + h * self_weight[:, None].astype(h.dtype)
    return out


def _spmm_general_fwd(h, arrays, fwd_tables, bwd_tables, num_nodes):
    return _spmm_general(h, arrays, fwd_tables, bwd_tables, num_nodes), arrays


def _spmm_general_bwd(fwd_tables, bwd_tables, num_nodes, arrays, g):
    _senders, _receivers, _w, r_ss, s_ss, w_ss, self_weight = arrays
    msgs = jnp.take(g, r_ss, axis=0)
    dh = spmm_pallas.scatter_sum_sorted(
        msgs, s_ss, num_nodes, tables=bwd_tables, weights=w_ss
    )
    if self_weight is not None:
        dh = dh + g * self_weight[:, None].astype(g.dtype)
    return dh, None


_spmm_general.defvjp(_spmm_general_fwd, _spmm_general_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spmm_symmetric(h, arrays, fwd_tables, num_nodes):
    senders, receivers, weights, self_weight = arrays
    messages = jnp.take(h, senders, axis=0)
    out = spmm_pallas.scatter_sum_sorted(
        messages, receivers, num_nodes, tables=fwd_tables, weights=weights
    )
    if self_weight is not None:
        # Densified diagonal: self-loop contribution as a dense elementwise
        # term (the diagonal of a symmetric matrix is symmetric, so the VJP
        # below stays the same operator).
        out = out + h * self_weight[:, None].astype(h.dtype)
    return out


def _spmm_sym_fwd(h, arrays, fwd_tables, num_nodes):
    return _spmm_symmetric(h, arrays, fwd_tables, num_nodes), arrays


def _spmm_sym_bwd(fwd_tables, num_nodes, arrays, g):
    # Aᵀ = A: the cotangent flows through the same gather + weighted
    # scatter (re-entering the custom VJP keeps higher-order grads valid).
    return _spmm_symmetric(g, arrays, fwd_tables, num_nodes), None


_spmm_symmetric.defvjp(_spmm_sym_fwd, _spmm_sym_bwd)


def prepare_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    add_self_loops: bool = False,
    gcn_normalize: bool = False,
    edge_weight: np.ndarray | None = None,
    edge_chunk: int = 1024,
    symmetric: bool = False,
    densify_self_loops: bool = False,
    scatter_row_block: int = 256,
    expand_row_block: int = 128,
    pad_nodes: bool = False,
    band_window: int | None = None,
    band_row_block: int = 256,
    pad_to: int | None = None,
    attend_full_stream: bool | None = None,
    attend_window: int | None = None,
    attend_window_chunk: int = 2048,
) -> GraphContext:
    """One-time host preprocessing into a :class:`GraphContext`.

    Sorts edges by receiver (native counting sort when available), builds
    both scatter orientations' tables, optionally folds in self-loops and
    reference-exact GCN normalization (utils/main.py:8-33 semantics).

    ``densify_self_loops=True`` (requires ``add_self_loops=True``) keeps
    the appended self-loops OUT of the edge stream and stores their
    (normalization) weights as a dense per-node ``self_weight`` vector
    instead; ``spmm()`` applies the diagonal as one fused elementwise op.
    Mathematically identical, but the gather/scatter path processes ~N
    fewer edges per pass (12.7% of ogbn-arxiv). Only valid for linear
    per-edge message functions (GCN-style) — do NOT use for attention
    layers, which need every edge in the stream.

    ``pad_nodes=True`` rounds ``num_nodes`` up to the scatter row-block
    grain: node arrays must then be supplied (and are returned) with
    ``n_pad`` rows, and the kernels skip the trailing slice-copy of every
    scatter output. Padded rows have no edges and zero self-weight.

    ``band_window=W`` (requires ``pad_nodes=True``) enables the
    banded-dense tier: edges fitting a W-row window in both orientations
    are stored as a dense band (kernels/band_pallas.py) and removed from
    the CSR stream. Pays off after a locality reordering
    (ops/reorder.py); on a random node numbering nearly every edge stays
    in the residual and the context behaves as without it.

    ``attend_full_stream`` (r4): band/densified contexts have an
    incomplete CSR stream, so per-edge ops (gather/attend/edge_softmax/
    sddmm) need a FULL-stream companion context (``ctx.full``), built
    here with the same padded node count. Default: True for band
    contexts (one prepared object serves GCN band-accelerated AND
    GATv2), False for densify-only contexts (GCN-style; attention on
    them raises with instructions). ``pad_to`` forces the padded node
    count (internal — keeps the companion's shapes aligned).

    ``attend_window=W`` (r5, requires ``pad_nodes=True``) builds the
    banded-attention backward tables: each receiver-sorted edge chunk
    gets the W-aligned node window capturing the most of its senders;
    those edges' sender-side attend cotangents scatter via the
    equality one-hot MXU kernel (kernels/band_pallas.py) instead of
    the [E, H*F] permute. Unlike ``band_window=`` this stores no dense
    band and works on any context; apply after ops/reorder locality
    ordering for real absorption. Exact math either way.
    """
    edge_index = np.asarray(edge_index)
    if edge_index.shape[0] != 2:
        edge_index = edge_index.T
    s = edge_index[0].astype(np.int64)
    r = edge_index[1].astype(np.int64)
    orig_s, orig_r = s.copy(), r.copy()
    orig_edge_weight = (
        None if edge_weight is None else np.asarray(edge_weight).copy()
    )
    if attend_full_stream is None:
        attend_full_stream = band_window is not None
    num_real_nodes = num_nodes
    if band_window is not None and not pad_nodes:
        raise ValueError("band_window requires pad_nodes=True")
    if attend_window is not None and not pad_nodes:
        raise ValueError("attend_window requires pad_nodes=True")
    if pad_nodes:
        grain = max(scatter_row_block, expand_row_block)
        if band_window is not None:
            grain = max(grain, band_window // 2, band_row_block)
        if attend_window is not None:
            grain = max(grain, attend_window)
        num_nodes = -(-num_nodes // grain) * grain
        if band_window is not None:
            num_nodes = max(num_nodes, band_window)
    if pad_to is not None:
        if not pad_nodes:
            raise ValueError("pad_to requires pad_nodes=True")
        if pad_to < num_nodes or pad_to % max(
            scatter_row_block, expand_row_block
        ):
            raise ValueError(
                f"pad_to={pad_to} incompatible with computed padded "
                f"node count {num_nodes}"
            )
        num_nodes = pad_to
    if symmetric:
        # Symmetry of the *weighted* adjacency lets spmm() reuse itself as
        # its own VJP. Verify the edge multiset is symmetric (GCN
        # normalization and self-loops preserve symmetry; arbitrary
        # user edge_weight would not).
        if edge_weight is not None:
            raise ValueError(
                "symmetric=True supports only structural weights "
                "(gcn_normalize); arbitrary edge_weight breaks Aᵀ=A."
            )
        fwd = np.sort(s * num_nodes + r)
        rev = np.sort(r * num_nodes + s)
        if not np.array_equal(fwd, rev):
            raise ValueError(
                "symmetric=True but the edge multiset is not symmetric"
            )
    self_weight = None
    num_diag = 0
    densified_norm = None
    if densify_self_loops:
        if not add_self_loops:
            raise ValueError(
                "densify_self_loops=True requires add_self_loops=True "
                "(it densifies the loops that would have been appended)"
            )
        num_diag = num_real_nodes
        if gcn_normalize:
            # Reference-exact weights (same native routine) computed over
            # the FULL edge list including the appended loops, then split:
            # real-edge weights stay in the stream, loop weights become the
            # dense diagonal. Loops are added for REAL nodes only; padded
            # rows keep self_weight 0 so they stay exactly zero.
            loops = np.arange(num_real_nodes, dtype=np.int64)
            s_full = np.concatenate([s, loops]).astype(np.int32)
            r_full = np.concatenate([r, loops]).astype(np.int32)
            w_full = native.gcn_norm_weights(s_full, r_full, num_nodes)
            densified_norm = np.asarray(w_full[: s.shape[0]], np.float32)
            self_weight = np.asarray(w_full[s.shape[0]:], np.float32)
        else:
            self_weight = np.ones(num_real_nodes, np.float32)
        if num_nodes > num_real_nodes:
            self_weight = np.concatenate(
                [self_weight, np.zeros(num_nodes - num_real_nodes, np.float32)]
            )
    elif add_self_loops:
        loops = np.arange(num_real_nodes, dtype=np.int64)
        s = np.concatenate([s, loops])
        r = np.concatenate([r, loops])
        if edge_weight is not None:
            edge_weight = np.concatenate(
                [np.asarray(edge_weight), np.ones(num_real_nodes, np.float32)]
            )

    # Resolve per-edge weights BEFORE any split/sort: the GCN norm is a
    # per-edge function of endpoint degrees, hence order-independent.
    w_resolved = None
    if gcn_normalize:
        if densified_norm is not None:
            w_resolved = densified_norm
        else:
            w_resolved = native.gcn_norm_weights(
                s.astype(np.int32), r.astype(np.int32), num_nodes
            )
    if edge_weight is not None:
        ew = np.asarray(edge_weight, np.float32)
        w_resolved = ew if w_resolved is None else w_resolved * ew

    # Full-stream in-degree (spmm_mean semantics), before any band split.
    full_in_degree = np.bincount(r, minlength=num_nodes).astype(np.float32)

    band_plan = band_plan_bwd = None
    if band_window is not None:
        # Keep the CSR stream non-empty (its tables assume >= 1 edge):
        # on an all-local graph the first edge (and, for symmetry of the
        # band matrix, its mirror) is re-routed to the residual.
        exclude = None
        probe, local0 = band_pallas.build_band_plan(
            s, r, w_resolved, num_nodes,
            window=band_window, row_block=band_row_block,
        )
        if local0.all():
            # All copies of the first edge and of its mirror, so the
            # band stays exactly symmetric under multi-edges.
            exclude = (s == s[0]) & (r == r[0])
            if symmetric:
                exclude |= (s == r[0]) & (r == s[0])
            band_plan, local = band_pallas.build_band_plan(
                s, r, w_resolved, num_nodes,
                window=band_window, row_block=band_row_block,
                exclude=exclude,
            )
        else:
            band_plan, local = probe, local0
        if not symmetric:
            # The fit criterion is endpoint-symmetric, so the transposed
            # orientation bands exactly the same edge subset.
            band_plan_bwd, _ = band_pallas.build_band_plan(
                r, s, w_resolved, num_nodes,
                window=band_window, row_block=band_row_block,
                exclude=exclude,
            )
        keep = ~local
        s, r = s[keep], r[keep]
        if w_resolved is not None:
            w_resolved = w_resolved[keep]

    perm_r, _ = native.coo_to_csr_perm(r.astype(np.int32), num_nodes)
    s_sorted_by_r = s[perm_r].astype(np.int32)
    r_sorted = r[perm_r].astype(np.int32)

    w = None
    if w_resolved is not None:
        w = np.asarray(w_resolved, np.float32)[perm_r]

    # Pad the edge axis to the kernel chunk grain ONCE at preparation time —
    # the scatter kernel otherwise jnp.pads its [E, F] input on every call
    # (a full extra HBM pass per scatter, fwd and bwd). Padded slots carry
    # zero weight and point at the last node in both orientations, so they
    # are exactly neutral whenever a weight is applied; weightless callers
    # still get correctness from the kernel-side bounds (padded edges fall
    # outside every row interval only when using explicit weights, so for
    # safety padded receivers/senders sit at num_nodes-1 with w=0).
    e_real = int(s_sorted_by_r.shape[0])
    # The windowed-attend kernel chunks the edge stream at its OWN
    # (coarser) grain — fewer work items than the per-edge kernels'
    # chunk, measured optimal independently (geometry is per kernel
    # SET, not per context). Pad the stream to the common grain so no
    # runtime re-pad pass appears.
    e_grain = edge_chunk
    if attend_window is not None and band_plan is None and num_diag == 0:
        e_grain = max(edge_chunk, attend_window_chunk)
    e_pad = ((e_real + e_grain - 1) // e_grain) * e_grain
    pad = e_pad - e_real
    last = max(num_nodes - 1, 0)
    s_p = np.concatenate([s_sorted_by_r, np.full(pad, last, np.int32)])
    r_p = np.concatenate([r_sorted, np.full(pad, last, np.int32)])
    if w is None:
        w = np.ones(e_real, np.float32)
    w_p = np.concatenate(
        [np.asarray(w, np.float32), np.zeros(pad, np.float32)]
    )

    fwd_tables = spmm_pallas.build_row_tables(
        r_p, num_nodes, edge_chunk=edge_chunk, row_block=scatter_row_block
    )
    expand_tables = spmm_pallas.build_row_tables(
        r_p, num_nodes, edge_chunk=edge_chunk, row_block=expand_row_block
    )

    # Transposed orientation: sort (receiver-sorted, padded) edges by sender.
    perm_s, _ = native.coo_to_csr_perm(s_p, num_nodes)
    senders_sorted = s_p[perm_s]
    receivers_ss = r_p[perm_s]
    weight_ss = w_p[perm_s]
    bwd_tables = spmm_pallas.build_row_tables(
        senders_sorted, num_nodes, edge_chunk=edge_chunk,
        row_block=scatter_row_block,
    )

    full_ctx = None
    if attend_full_stream and (band_plan is not None or num_diag > 0):
        full_ctx = prepare_graph(
            np.stack([orig_s, orig_r]),
            num_real_nodes,
            add_self_loops=add_self_loops,
            gcn_normalize=gcn_normalize,
            edge_weight=orig_edge_weight,
            edge_chunk=edge_chunk,
            symmetric=symmetric,
            densify_self_loops=False,
            scatter_row_block=scatter_row_block,
            expand_row_block=expand_row_block,
            pad_nodes=pad_nodes,
            band_window=None,
            pad_to=num_nodes if pad_nodes else None,
            attend_window=attend_window,
            attend_window_chunk=attend_window_chunk,
        )

    # Banded-attention backward tables (attend_window=): built on the
    # context whose CSR stream holds EVERY edge (per-edge ops route
    # there) — this one when no band/densify split happened, otherwise
    # the full companion above (via the recursive call).
    attw_plan = None
    attw_sender = attw_perm_res = attw_res_weight = attw_senders_res = None
    attw_res_tables = None
    if attend_window is not None and band_plan is None and num_diag == 0:
        eligible = np.arange(e_pad) < e_real
        attw_plan, _band_mask, sender_tab = (
            band_pallas.build_window_scatter_plan(
                s_p, num_nodes, eligible,
                window=attend_window, edge_chunk=attend_window_chunk,
            )
        )
        idx_res = np.nonzero(eligible & ~_band_mask)[0]
        order_res = np.argsort(s_p[idx_res], kind="stable")
        perm_res = idx_res[order_res].astype(np.int32)
        er = perm_res.shape[0]
        er_pad = max(
            ((er + edge_chunk - 1) // edge_chunk) * edge_chunk, edge_chunk
        )
        padr = er_pad - er
        # Padded residual slots point at edge 0 with weight 0 — exactly
        # neutral regardless of v's value there.
        perm_res = np.concatenate([perm_res, np.zeros(padr, np.int32)])
        res_weight = np.concatenate(
            [np.ones(er, np.float32), np.zeros(padr, np.float32)]
        )
        senders_res = np.concatenate(
            [s_p[perm_res[:er]], np.full(padr, last, np.int32)]
        )
        attw_res_tables = spmm_pallas.build_row_tables(
            senders_res, num_nodes,
            edge_chunk=edge_chunk, row_block=scatter_row_block,
        )
        attw_sender = jnp.asarray(sender_tab)
        attw_perm_res = jnp.asarray(perm_res)
        attw_res_weight = jnp.asarray(res_weight)
        attw_senders_res = jnp.asarray(senders_res)

    deg = full_in_degree
    return GraphContext(
        senders=jnp.asarray(s_p),
        receivers=jnp.asarray(r_p),
        edge_weight=jnp.asarray(w_p),
        num_nodes=num_nodes,
        fwd_tables=fwd_tables,
        bwd_perm=jnp.asarray(perm_s.astype(np.int32)),
        senders_sorted=jnp.asarray(senders_sorted),
        bwd_tables=bwd_tables,
        num_real_edges=e_real,
        edge_mask=jnp.asarray(np.arange(e_pad) < e_real),
        in_degree=jnp.asarray(deg),
        is_symmetric=symmetric,
        self_weight=None if self_weight is None else jnp.asarray(self_weight),
        num_diag=num_diag,
        expand_tables=expand_tables,
        num_real_nodes=num_real_nodes,
        receivers_ss=jnp.asarray(receivers_ss),
        edge_weight_ss=jnp.asarray(weight_ss),
        has_unit_weights=(not gcn_normalize) and edge_weight is None,
        edge_mask_ss=(
            None if pad == 0
            else jnp.asarray((perm_s < e_real).astype(np.float32))
        ),
        band=band_plan,
        band_bwd=band_plan_bwd,
        num_band_edges=0 if band_plan is None else band_plan.num_edges,
        full=full_ctx,
        attw_plan=attw_plan,
        attw_sender=attw_sender,
        attw_perm_res=attw_perm_res,
        attw_res_weight=attw_res_weight,
        attw_senders_res=attw_senders_res,
        attw_res_tables=attw_res_tables,
    )
