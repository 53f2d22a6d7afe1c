"""Fused GATv2 attention aggregation kernels (forward + both backwards).

Completes the kernel tier for attention (kernels/sddmm_pallas.py fuses
the scores with the softmax stats). Three kernels, all on the
boundary-encoded work-list grids of kernels/spmm_pallas.py:

- :func:`attend_aggregate_sorted` (scatter grid): out[r] = sum_{e in r}
  alpha(s, m, l)[e] * hj[e] — the softmax APPLY, head broadcast, message
  product and scatter in ONE pass; alpha is never materialized to HBM.
- :func:`attend_alpha_bwd_sorted` (receiver grid): d_alpha[E, K]
  (= sum_F g[recv] * hj per head, drop-scaled) and rho[N, K]
  (= sum_{e in r} alpha * d_alpha, the softmax-Jacobian row term).
- :func:`attend_recv_bwd_full_sorted` (receiver grid): ds = alpha *
  (d_alpha - rho_e) and d_pre in-register; scatters the receiver-side
  d ht and accumulates datt. With ``emit_v=True`` (the default path) it
  also EMITS the total per-edge sender cotangent ``v = alpha_keep *
  g[recv] + d_pre`` for the single-permute finish; ``emit_v=False``
  pairs with :func:`attend_send_bwd_sorted`.
- :func:`attend_send_bwd_sorted` (sender grid, r5): recomputes alpha,
  ds and d_pre in SENDER-sorted order from three gathers by
  receivers-in-sender-order plus the block-streamed sender rows, and
  scatters ``v`` straight into d ht — no [E, D] permute.

Design history (three rounds of measurement): the r2 sender-grid path
was deleted in r3 over a "12-42 ms multi-gather lottery"; the r4
fresh-process matrix reframed that as co-scheduling of independent
gathers with chained gathers ~free; r5 REBUILT the sender-grid path to
cash that in and measured it SLOWER (benchmarks/send_bwd_probe.py):
with materializing [E, D] takes the multi-gather penalty applies no
matter how the takes are serialized (independent / optimization_barrier
-chained / concat-fused: 27.6-44.2 ms for three takes vs 4.3 ms solo) —
the r4 "~0.1 ms marginal" takes were scalar-reduced gathers XLA fused
into one loop. The empirical law on this stack is ONE large random
access per program, which is exactly the single-permute design
(ops/csr.ATTEND_BWD_MODE keeps the alternative selectable).

Out-of-interval (padded) edge slots are masked by the interval one-hot
inside every kernel, so no -inf masking pass over [E, K] is needed
anywhere in the fused pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sddmm_pallas import _dots_data_lhs, head_selector
from .spmm_pallas import RowTables, _dots

__all__ = [
    "attend_aggregate_sorted",
    "attend_rho_sorted",
    "attend_recv_bwd_full_sorted",
    "attend_send_bwd_sorted",
]


def _interval_onehots(bounds_ref, base, edge_chunk, rb):
    """(onehot_t [EC, RB], hit [RB, EC]) interval indicators."""
    lo_t = bounds_ref[0, 0:1, :]  # [1, RB]
    hi_t = bounds_ref[0, 1:2, :]
    gidx_t = base + jax.lax.broadcasted_iota(
        jnp.int32, (edge_chunk, 1), 0
    )
    onehot_t = jnp.where((gidx_t >= lo_t) & (gidx_t < hi_t), 1.0, 0.0)
    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi = bounds_ref[0, 1:2, :].reshape(rb, 1)
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)
    hit = jnp.where((gidx >= lo) & (gidx < hi), 1.0, 0.0)
    return onehot_t, hit


def _alpha_from(onehot_t, ml_ref, s_ref, k, eps, precision):
    """alpha [EC, K] in-register; 0 on out-of-interval edges."""
    mle = _dots(onehot_t, ml_ref[:].astype(jnp.float32), precision,
                ((1,), (0,)))  # [EC, 2K]
    m_e, l_e = mle[:, :k], mle[:, k:2 * k]
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0  # [EC, 1]
    s = s_ref[:].astype(jnp.float32)
    alpha = jnp.exp(s - m_e) / (l_e + eps)
    return jnp.where(inblk, alpha, 0.0)


# --------------------------------------------------------------------------
# Forward: alpha + head broadcast + message product + scatter, one pass.
# --------------------------------------------------------------------------


def _agg_fwd_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    ml_ref,  # [RB, 2K] f32 (m | l)
    s_ref,  # [EC, K] f32 scores
    hj_ref,  # [EC, D]
    selt_ref,  # [K, D]
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    precision,
    dropped: bool,
):
    if dropped:
        drop_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
        drop_ref = None
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    alpha = _alpha_from(onehot_t, ml_ref, s_ref, k, eps, precision)
    if dropped:
        alpha = alpha * drop_ref[:].astype(jnp.float32)
    alpha_d = _dots_data_lhs(alpha, selt_ref[:], precision, ((1,), (0,)))
    msgs = alpha_d * hj_ref[:].astype(jnp.float32)  # [EC, D]
    contrib = _dots(hit, msgs.astype(hj_ref.dtype), precision,
                    ((1,), (0,)))

    flags = wf_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] += contrib

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def attend_aggregate_sorted(
    scores: jax.Array,  # [E, K] f32
    m: jax.Array,  # [N, K] f32
    l: jax.Array,  # [N, K] f32
    hj: jax.Array,  # [E, D]
    *,
    tables: RowTables,
    eps: float = 1e-10,
    drop_mask: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    e, d = hj.shape
    k = scores.shape[1]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    s_p = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    ml = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32)], axis=1
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    selt = head_selector(k, d // k).T  # [K, D]
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 2 * k), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), ml, s_p, hj_p, selt]
    dropped = drop_mask is not None
    if dropped:
        dm = jnp.pad(
            drop_mask.astype(jnp.float32), ((0, e_pad - e), (0, 0))
        )
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, d), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _agg_fwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            precision=precision, dropped=dropped,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), hj.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=tables.num_work * ec * d * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        *args,
    )
    return out


# --------------------------------------------------------------------------
# Backward (single-permute design, r3):
#
# - :func:`attend_alpha_bwd_sorted` (receiver scatter grid): d_alpha and
#   rho — the softmax-Jacobian row term needs a full pass over each
#   receiver's edges before ds can be formed, hence two passes.
# - :func:`attend_recv_bwd_full_sorted` (receiver scatter grid):
#   recomputes alpha and ds in-register, forms the score-branch d_pre and
#   SCATTERS it into d ht directly, accumulates datt, and writes the
#   total per-edge sender cotangent v = alpha_keep * g[recv] + d_pre
#   (receiver order). An edge's receiver block is the item that owns it,
#   so hi = onehot @ ht-rows is complete exactly where ds != 0.
# - The caller permutes v into sender order ONCE and runs the sorted
#   scatter over the transposed tables (ops/csr._gatv2_attend_bwd).
# --------------------------------------------------------------------------


def _alpha_recomputed(onehot_t, rows_ref, hjf, att_row, sel_ref, ml_ref,
                      k, eps, negative_slope, precision):
    """alpha [EC, K] with the score recomputed in-register — the SAME
    exact f32 expression as the fused forward (pre is a f32 sum of the
    same bf16 values; z and the MXU head-sum are identical), so
    s == s_fwd bitwise for valid in-interval edges and the min clamp is
    exact (s <= m by construction). Saves the [E, K] f32 score cache
    (686 MB physical at arxiv scale) that r4 wrote in the forward and
    re-read in both backward passes (r5)."""
    hi_b = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))
    pre = hi_b + hjf
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    s = _dots_data_lhs(z * att_row, sel_ref[:], precision, ((1,), (0,)))
    ml = _dots(onehot_t, ml_ref[:].astype(jnp.float32), precision,
               ((1,), (0,)))  # [EC, 2K]
    m_e, l_e = ml[:, :k], ml[:, k:2 * k]
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0
    alpha = jnp.exp(jnp.minimum(s - m_e, 0.0)) / (l_e + eps)
    return jnp.where(inblk, alpha, 0.0), pre


def _rho_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars (3 prefetch)
    bounds_ref,  # [1, 2, RB]
    g_ref,  # [RB, D] output cotangent rows
    ml_ref,  # [RB, 2K]
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    negative_slope: float,
    precision,
    dropped: bool,
    recompute: bool,
    masked: bool,
):
    refs = list(rest)
    if recompute:
        rows_ref, att_ref = refs.pop(0), refs.pop(0)
        s_ref = None
    else:
        s_ref = refs.pop(0)
        rows_ref = att_ref = None
    hj_ref, sel_ref = refs.pop(0), refs.pop(0)
    valid_ref = refs.pop(0) if masked else None
    drop_ref = refs.pop(0) if dropped else None
    rho_ref, rho_acc = refs
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    gexp = _dots(onehot_t, g_ref[:], precision, ((1,), (0,)))  # [EC, D] f32
    hjf = hj_ref[:].astype(jnp.float32)
    dalpha = _dots_data_lhs(gexp * hjf, sel_ref[:], precision,
                            ((1,), (0,)))  # [EC, K]
    if recompute:
        att_row = att_ref[0:1, :].astype(jnp.float32)
        alpha, _pre = _alpha_recomputed(
            onehot_t, rows_ref, hjf, att_row, sel_ref, ml_ref, k, eps,
            negative_slope, precision,
        )
        if masked:
            alpha = alpha * valid_ref[0, 0:1, :].reshape(edge_chunk, 1)
    else:
        alpha = _alpha_from(onehot_t, ml_ref, s_ref, k, eps, precision)
    if dropped:
        dalpha = dalpha * drop_ref[:].astype(jnp.float32)
    rho_contrib = _dots(hit, alpha * dalpha, precision, ((1,), (0,)))

    bf = wf_ref[w]
    b_first = (bf & 1) == 1
    b_last = (bf & 2) == 2

    @pl.when(b_first)
    def _():
        rho_acc[:] = rho_contrib

    @pl.when(jnp.logical_not(b_first))
    def _():
        rho_acc[:] += rho_contrib

    @pl.when(b_last)
    def _():
        rho_ref[:] = rho_acc[:].astype(rho_ref.dtype)


def attend_rho_sorted(
    g: jax.Array,  # [N, D] output cotangent
    scores: jax.Array | None,  # [E, K] f32, or None to recompute (r5)
    m: jax.Array,
    l: jax.Array,
    hj: jax.Array,  # [E, D]
    *,
    tables: RowTables,
    eps: float = 1e-10,
    drop_mask: jax.Array | None = None,
    precision=None,
    rows: jax.Array | None = None,  # [N, D] ht — required if scores=None
    att: jax.Array | None = None,  # [K, F] — required if scores=None
    negative_slope: float = 0.2,
    edge_valid: jax.Array | None = None,  # [E] 1/0 (recompute mode)
) -> jax.Array:
    """Softmax-Jacobian row term ``rho [N_pad, K] f32`` only (r4 slim:
    the r3 version also wrote d_alpha [E, K] to HBM, but the recv-grid
    kernel recomputes d_alpha in-register from the same g expand it
    already performs — the extra stream bought nothing).

    ``scores=None`` (r5): the score is recomputed in-register from the
    ``rows`` expand + the hj stream this kernel already reads — the
    forward then skips emitting the [E, K] f32 score cache entirely
    (686 MB physical at arxiv scale, written once + read twice).
    ``edge_valid`` masks padded edge slots (the cached-score mode
    inherits -inf scores for them instead)."""
    e, d = hj.shape
    k = m.shape[1]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    recompute = scores is None
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    g_p = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0)))
    ml = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32)], axis=1
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    sel = head_selector(k, d // k)
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 2 * k), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), g_p, ml]
    if recompute:
        if rows is None or att is None:
            raise ValueError("scores=None needs rows= and att=")
        in_specs += [
            pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [
            jnp.pad(rows, ((0, n_pad - rows.shape[0]), (0, 0))),
            att.reshape(1, d),
        ]
    else:
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(
            jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
        )
    in_specs += [
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [hj_p, sel]
    masked = recompute and edge_valid is not None
    if masked:
        vm = jnp.pad(edge_valid.astype(jnp.float32), (0, e_pad - e))
        in_specs.append(
            pl.BlockSpec((1, 1, ec), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(vm.reshape(e_pad // ec, 1, ec))
    dropped = drop_mask is not None
    if dropped:
        dm = jnp.pad(
            drop_mask.astype(jnp.float32), ((0, e_pad - e), (0, 0))
        )
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, k), jnp.float32)],
    )
    rho = pl.pallas_call(
        functools.partial(
            _rho_kernel, edge_chunk=ec, k=k, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
            dropped=dropped, recompute=recompute, masked=masked,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        # rho-only accounting (ADVICE r4): one g expand (2*ec*rb*d), one
        # d_alpha contraction (2*ec*d*k), the alpha ml-expand and the rho
        # reduction — no d_alpha output stream or accumulator anymore.
        cost_estimate=pl.CostEstimate(
            flops=2 * tables.num_work * ec * (rb + 2 * k) * d,
            bytes_accessed=tables.num_work * ec * d * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        *args,
    )
    return rho


def _recv_bwd_full_kernel(
    wb_ref, wc_ref, wf_ref, wcf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    rows_ref,  # [RB, D] ht rows (receiver blocks)
    g_ref,  # [RB, D] output-cotangent rows (receiver blocks)
    mlr_ref,  # [RB, 3K] (m | l | rho)
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    negative_slope: float,
    precision,
    dropped: bool,
    emit_v: bool,
    recompute: bool,
    masked: bool,
):
    refs = list(rest)
    s_ref = None if recompute else refs.pop(0)
    hj_ref, att_ref, selt_ref, sel_ref = (
        refs.pop(0), refs.pop(0), refs.pop(0), refs.pop(0)
    )
    valid_ref = refs.pop(0) if masked else None
    drop_ref = refs.pop(0) if dropped else None
    if emit_v:
        out_ref, datt_ref, v_ref, acc_ref, datt_acc, v_acc = refs
    else:
        out_ref, datt_ref, acc_ref, datt_acc = refs
        v_ref = v_acc = None
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    @pl.when(w == 0)
    def _():
        datt_acc[:] = jnp.zeros_like(datt_acc)

    mlr = _dots(onehot_t, mlr_ref[:].astype(jnp.float32), precision,
                ((1,), (0,)))  # [EC, 3K]
    m_e, l_e, rho_e = mlr[:, :k], mlr[:, k:2 * k], mlr[:, 2 * k:]
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0
    hjf = hj_ref[:].astype(jnp.float32)
    hi_b = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))
    pre = hi_b + hjf
    att_row = att_ref[0:1, :].astype(jnp.float32)
    if recompute:
        # In-register score recompute (r5, see _alpha_recomputed): this
        # kernel already expands the receiver rows for pre, so s costs
        # one extra MXU head-sum and the [E, K] f32 score cache dies.
        z0 = jnp.where(pre > 0, pre, negative_slope * pre)
        s = _dots_data_lhs(z0 * att_row, sel_ref[:], precision,
                           ((1,), (0,)))
        alpha = jnp.where(
            inblk,
            jnp.exp(jnp.minimum(s - m_e, 0.0)) / (l_e + eps), 0.0,
        )
        if masked:
            alpha = alpha * valid_ref[0, 0:1, :].reshape(edge_chunk, 1)
    else:
        s = s_ref[:].astype(jnp.float32)
        alpha = jnp.where(inblk, jnp.exp(s - m_e) / (l_e + eps), 0.0)
    # d_alpha in-register from the g expand this kernel performs anyway
    # (r4: the separate [E, K] d_alpha stream from the rho pass bought
    # nothing — same g_b, one extra MXU op here).
    g_b = _dots(onehot_t, g_ref[:], precision, ((1,), (0,)))  # [EC, D]
    da = _dots_data_lhs(g_b * hjf, sel_ref[:], precision, ((1,), (0,)))
    if dropped:
        da = da * drop_ref[:].astype(jnp.float32)
    ds = alpha * (da - rho_e)  # 0 out-of-block

    lmask = jnp.where(pre > 0, 1.0, negative_slope)
    dse = _dots_data_lhs(ds, selt_ref[:], precision, ((1,), (0,)))
    dpre = dse * att_row * lmask  # [EC, D]; 0 where ds == 0

    contrib = _dots(hit, dpre.astype(hj_ref.dtype), precision,
                    ((1,), (0,)))

    flags = wf_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] += contrib

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    # Total per-edge SENDER cotangent v = alpha_keep * g[recv] + dpre,
    # accumulated per chunk (each edge's terms land in its owning
    # block's item; both factors are exact zeros out-of-block). The
    # legacy path (emit_v=True) permutes this stream to sender order and
    # runs the sorted scatter; the r5 default recomputes v in sender
    # order instead (attend_send_bwd_sorted) and skips this 686 MB
    # [E, D] write entirely.
    if emit_v:
        if dropped:
            alpha_keep = alpha * drop_ref[:].astype(jnp.float32)
        else:
            alpha_keep = alpha
        akd = _dots_data_lhs(alpha_keep, selt_ref[:], precision,
                             ((1,), (0,)))
        v_contrib = akd * g_b + dpre

        cflags = wcf_ref[w]
        c_first = (cflags & 1) == 1
        c_last = (cflags & 2) == 2

        @pl.when(c_first)
        def _():
            v_acc[:] = v_contrib

        @pl.when(jnp.logical_not(c_first))
        def _():
            v_acc[:] += v_contrib

        @pl.when(c_last)
        def _():
            v_ref[:] = v_acc[:].astype(v_ref.dtype)

    # datt: each edge contributes exactly once (in its owning block's
    # items; dse == 0 elsewhere). pre is finite out-of-block (hi = 0), so
    # z * dse is an exact 0 there.
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    ones = jnp.full((1, edge_chunk), 1.0, jnp.float32)
    datt_acc[:] += _dots(ones, z * dse, precision, ((1,), (0,)))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        datt_ref[:] = datt_acc[:].astype(datt_ref.dtype)


def attend_recv_bwd_full_sorted(
    ht: jax.Array,  # [N, D]
    g: jax.Array,  # [N(_pad), D] output cotangent (receiver rows)
    hj: jax.Array,  # [E, D]
    att: jax.Array,  # [K, F]
    scores: jax.Array | None,  # [E, K] f32, or None to recompute (r5)
    m: jax.Array,
    l: jax.Array,
    rho: jax.Array,  # [N_pad or N, K] f32
    *,
    tables: RowTables,
    eps: float = 1e-10,
    negative_slope: float = 0.2,
    drop_mask: jax.Array | None = None,  # [E, K] pre-scaled keep mask
    precision=None,
    emit_v: bool = True,
    edge_valid: jax.Array | None = None,  # [E] 1/0 (recompute mode)
) -> tuple[jax.Array, ...]:
    """Receiver-grid backward: returns ``(d_ht_recv [N_pad, D],
    datt [K, F], v [E, D])`` with ``emit_v=True`` (the single-permute
    finish; ``v = alpha_keep * g[recv] + d_pre`` in receiver-sorted
    order) or ``(d_ht_recv, datt)`` with ``emit_v=False`` (pairs with
    :func:`attend_send_bwd_sorted`). d_alpha is recomputed in-register
    from the g expand (r4 — no [E, K] d_alpha stream from the rho pass).
    ``scores=None`` (r5) recomputes the score in-register from the pre
    this kernel already forms — the [E, K] f32 cache dies; padded edge
    slots then need ``edge_valid`` (cached mode inherits their -inf).

    All node-side inputs arrive via block-streamed expands, so no random
    access appears in this pass at all.
    """
    e, d = hj.shape
    k = att.shape[0]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    recompute = scores is None
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    rows = jnp.pad(ht, ((0, n_pad - ht.shape[0]), (0, 0)))
    g_rows = jnp.pad(
        g.astype(ht.dtype), ((0, n_pad - g.shape[0]), (0, 0))
    )
    mlr = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32),
             rho.astype(jnp.float32)[:m.shape[0]]], axis=1,
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    att_flat = att.reshape(1, d)
    sel = head_selector(k, d // k)
    selt = sel.T
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    dropped = drop_mask is not None
    masked = recompute and edge_valid is not None
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl, f2: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 3 * k), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), rows, g_rows, mlr]
    if not recompute:
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(
            jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
        )
    in_specs += [
        pl.BlockSpec((ec, d), lambda w, b, c, fl, f2: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [hj_p, att_flat, selt, sel]
    if masked:
        vm = jnp.pad(edge_valid.astype(jnp.float32), (0, e_pad - e))
        in_specs.append(
            pl.BlockSpec((1, 1, ec), lambda w, b, c, fl, f2: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(vm.reshape(e_pad // ec, 1, ec))
    if dropped:
        dm = jnp.pad(drop_mask.astype(jnp.float32),
                     ((0, e_pad - e), (0, 0)))
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dm)
    out_specs = [
        pl.BlockSpec((rb, d), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, d), ht.dtype),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((rb, d), jnp.float32),
        pltpu.VMEM((1, d), jnp.float32),
    ]
    if emit_v:
        out_specs.append(
            pl.BlockSpec((ec, d), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((e_pad, d), ht.dtype))
        scratch.append(pltpu.VMEM((ec, d), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(
            _recv_bwd_full_kernel, edge_chunk=ec, k=k, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
            dropped=dropped, emit_v=emit_v, recompute=recompute,
            masked=masked,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=(12 if emit_v else 10) * tables.num_work * ec
            * (rb + k) * d,
            bytes_accessed=(3 if emit_v else 2) * tables.num_work * ec
            * d * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        jnp.asarray(tables.work_cfirst),
        *args,
    )
    dht, datt = outs[0], outs[1]
    datt = datt.reshape(k, d // k).astype(att.dtype)
    if emit_v:
        return dht, datt, outs[2][:e]
    return dht, datt


# --------------------------------------------------------------------------
# Sender-grid recompute (r5): the permutation-free finish.
#
# dht_send[j] = sum_{e=(j->i)} v_e with v_e = alpha_keep_e * g_i + dpre_e
# computed IN REGISTER in sender-sorted order. Receiver-side quantities
# (g_i, ht_i, m_i, l_i, rho_i) arrive as pre-gathered edge streams (three
# chained N-row takes by receivers_ss — ~4.7 ms total at arxiv scale under
# the r4 scheduling rules, vs ~15.9 ms for the [E, 256] permute whose
# E-row source cannot get under the ~128 MB gather cliff). Sender features
# arrive via the block-streamed one-hot expand (the block IS the sender
# rows here). The recomputed score s is bit-identical to the forward's
# (same exact f32 expression over the same bf16 values), so alpha
# reconstruction is exact.
# --------------------------------------------------------------------------


def _send_bwd_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars (3 prefetch)
    bounds_ref,  # [1, 2, RB] sender intervals
    rows_ref,  # [RB, D] ht rows (sender blocks)
    gr_ref,  # [EC, D] g[recv] stream (sender-sorted order)
    hr_ref,  # [EC, D] ht[recv] stream (sender-sorted order)
    mlr_ref,  # [EC, 3K] f32 (m | l | rho)[recv] stream
    att_ref,  # [1, D]
    sel_ref,  # [D, K]
    selt_ref,  # [K, D]
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    negative_slope: float,
    precision,
    masked: bool,
    dropped: bool,
):
    refs = list(rest)
    valid_ref = refs.pop(0) if masked else None
    drop_ref = refs.pop(0) if dropped else None
    out_ref, acc_ref = refs
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    hj = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))  # [EC, D]
    hrf = hr_ref[:].astype(jnp.float32)
    grf = gr_ref[:].astype(jnp.float32)
    att_row = att_ref[0:1, :].astype(jnp.float32)

    # Score recompute — the SAME exact f32 expression as the fused
    # forward (_sddmm_stats_agg_kernel): pre is a f32 sum of the same
    # bf16 values, z and the MXU head-sum are identical, so s == s_fwd
    # bitwise for every valid in-interval edge. The min(., 0) clamp is
    # then exact (s <= m by construction) and only guards the padded /
    # out-of-interval garbage rows that the masks below zero anyway.
    pre = hrf + hj
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    s = _dots_data_lhs(z * att_row, sel_ref[:], precision, ((1,), (0,)))
    mlr = mlr_ref[:].astype(jnp.float32)
    m_e, l_e, rho_e = mlr[:, :k], mlr[:, k:2 * k], mlr[:, 2 * k:3 * k]
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0  # [EC, 1]
    alpha = jnp.exp(jnp.minimum(s - m_e, 0.0)) / (l_e + eps)
    alpha = jnp.where(inblk, alpha, 0.0)
    if masked:
        # Padded edge slots sit INSIDE the last node's interval (they
        # point at num_nodes-1 with weight 0 in the stream layout), so
        # the interval indicator alone does not null them here.
        alpha = alpha * valid_ref[0, 0:1, :].reshape(edge_chunk, 1)

    da = _dots_data_lhs(grf * hj, sel_ref[:], precision, ((1,), (0,)))
    if dropped:
        dropf = drop_ref[:].astype(jnp.float32)
        da = da * dropf
        alpha_keep = alpha * dropf
    else:
        alpha_keep = alpha
    ds = alpha * (da - rho_e)  # 0 on masked / out-of-interval slots
    dse = _dots_data_lhs(ds, selt_ref[:], precision, ((1,), (0,)))
    lmask = jnp.where(pre > 0, 1.0, negative_slope)
    dpre = dse * att_row * lmask  # [EC, D]
    akd = _dots_data_lhs(alpha_keep, selt_ref[:], precision,
                         ((1,), (0,)))
    v = akd * grf + dpre
    contrib = _dots(hit, v.astype(rows_ref.dtype), precision,
                    ((1,), (0,)))

    flags = wf_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] += contrib

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def attend_send_bwd_sorted(
    ht: jax.Array,  # [N, D] transformed node features
    g_r: jax.Array,  # [E, D] g[receivers_ss] (sender-sorted order)
    ht_r: jax.Array,  # [E, D] ht[receivers_ss]
    stats_r: jax.Array,  # [E, 3K] f32 (m | l | rho)[receivers_ss]
    att: jax.Array,  # [K, F]
    *,
    tables: RowTables,  # SENDER-orientation scatter tables (bwd_tables)
    eps: float = 1e-10,
    negative_slope: float = 0.2,
    valid_ss: jax.Array | None = None,  # [E] 1/0 in sender-sorted order
    drop_ss: jax.Array | None = None,  # [E, K] keep mask, sender order
    precision=None,
) -> jax.Array:
    """Sender-grid attention backward finish: ``d_ht_send [N_pad, D]``.

    Recomputes alpha/ds/d_pre in sender-sorted order and scatters the
    total per-edge sender cotangent ``v = alpha_keep * g[recv] + d_pre``
    into d ht — the permutation-free replacement for the r3/r4
    ``take(v, perm)`` + sorted-scatter finish (module docstring). The
    three ``[E, *]`` input streams must be gathered by the caller with
    CHAINED takes (ops/csr.dep_zero) so XLA cannot co-schedule them.
    """
    e, d = g_r.shape
    k = att.shape[0]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    rows = jnp.pad(ht, ((0, n_pad - ht.shape[0]), (0, 0)))
    gr_p = jnp.pad(g_r, ((0, e_pad - e), (0, 0)))
    hr_p = jnp.pad(ht_r, ((0, e_pad - e), (0, 0)))
    mlr_p = jnp.pad(
        stats_r.astype(jnp.float32), ((0, e_pad - e), (0, 0))
    )
    att_flat = att.reshape(1, d)
    sel = head_selector(k, d // k)
    selt = sel.T
    if precision is None:
        precision = (
            "split2" if ht.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    masked = valid_ss is not None
    dropped = drop_ss is not None
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, 3 * k), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), rows, gr_p, hr_p, mlr_p,
            att_flat, sel, selt]
    if masked:
        vm = jnp.pad(valid_ss.astype(jnp.float32), (0, e_pad - e))
        args.append(vm.reshape(e_pad // ec, 1, ec))
        in_specs.append(
            pl.BlockSpec((1, 1, ec), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if dropped:
        dm = jnp.pad(drop_ss.astype(jnp.float32),
                     ((0, e_pad - e), (0, 0)))
        args.append(dm)
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, d), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _send_bwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
            masked=masked, dropped=dropped,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), ht.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=tables.num_work * ec
            * (2 * d * ht.dtype.itemsize + 4 * 4 * k),
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        *args,
    )
    return out


