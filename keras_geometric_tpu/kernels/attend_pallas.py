"""Fused GATv2 attention aggregation kernels (forward + both backwards).

Completes the kernel tier for attention (kernels/sddmm_pallas.py computes
the scores; kernels/softmax_pallas.py the softmax stats). Three kernels,
all on the boundary-encoded work-list grids of kernels/spmm_pallas.py:

- :func:`attend_aggregate_sorted` (scatter grid): out[r] = sum_{e in r}
  alpha(s, m, l)[e] * hj[e] — the softmax APPLY, head broadcast, message
  product and scatter in ONE pass; alpha is never materialized to HBM.
- :func:`attend_agg_bwd_sorted` (expand grid): the aggregation branch's
  backward — emits d_alpha[E, K] (= sum_F g[recv] * hj per head),
  d_hj_agg[E, D] (= alpha_drop * g[recv]) and rho[N, K]
  (= sum_{e in r} alpha * d_alpha, the softmax-Jacobian row term),
  all in one pass over the edge streams.
- :func:`attend_score_bwd_sorted` (expand grid): the score branch —
  recomputes pre = hi + hj and alpha in-register, forms the exact softmax
  Jacobian ds = alpha * (d_alpha - rho_e), and emits
  d_pre = (ds @ S^T) * att * leaky'(pre) plus the accumulated datt.

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
    "attend_agg_bwd_sorted",
    "attend_score_bwd_sorted",
    "attend_alpha_bwd_sorted",
    "attend_recv_bwd_sorted",
    "attend_sender_bwd_sorted",
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
# Backward, aggregation branch: d_alpha, d_hj_agg, rho in one pass.
# --------------------------------------------------------------------------


def _agg_bwd_kernel(
    wb_ref, wc_ref, wcf_ref, wf_ref,  # SMEM scalars (4 prefetch)
    bounds_ref,  # [1, 2, RB]
    g_ref,  # [RB, D] output cotangent rows
    ml_ref,  # [RB, 2K]
    s_ref,  # [EC, K]
    hj_ref,  # [EC, D]
    selt_ref,  # [K, D]
    sel_ref,  # [D, K]
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    precision,
    dropped: bool,
):
    if dropped:
        drop_ref, da_ref, dhj_ref, rho_ref, da_acc, dhj_acc, rho_acc = rest
    else:
        da_ref, dhj_ref, rho_ref, da_acc, dhj_acc, rho_acc = rest
        drop_ref = None
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    gexp = _dots(onehot_t, g_ref[:], precision, ((1,), (0,)))  # [EC, D] f32
    hjf = hj_ref[:].astype(jnp.float32)
    # d_alpha[e, h] = sum_f gexp * hj (per head segment).
    dalpha = _dots_data_lhs(gexp * hjf, sel_ref[:], precision,
                            ((1,), (0,)))  # [EC, K]
    alpha = _alpha_from(onehot_t, ml_ref, s_ref, k, eps, precision)
    if dropped:
        drop = drop_ref[:].astype(jnp.float32)
        dalpha = dalpha * drop
        alpha_keep = alpha * drop
    else:
        alpha_keep = alpha
    # d_hj (aggregation branch) = alpha_keep broadcast * gexp.
    akd = _dots_data_lhs(alpha_keep, selt_ref[:], precision, ((1,), (0,)))
    dhj = akd * gexp
    # rho[r] = sum_{e in r} alpha * d_alpha (NOT drop-scaled twice: the
    # softmax Jacobian uses alpha and the already-drop-scaled d_alpha).
    rho_contrib = _dots(hit, alpha * dalpha, precision, ((1,), (0,)))

    cf = wcf_ref[w]
    c_first = (cf & 1) == 1
    c_last = (cf & 2) == 2
    bf = wf_ref[w]
    b_first = (bf & 1) == 1
    b_last = (bf & 2) == 2

    @pl.when(c_first)
    def _():
        da_acc[:] = dalpha
        dhj_acc[:] = dhj

    @pl.when(jnp.logical_not(c_first))
    def _():
        da_acc[:] += dalpha
        dhj_acc[:] += dhj

    @pl.when(c_last)
    def _():
        da_ref[:] = da_acc[:].astype(da_ref.dtype)
        dhj_ref[:] = dhj_acc[:].astype(dhj_ref.dtype)

    @pl.when(b_first)
    def _():
        rho_acc[:] = rho_contrib

    @pl.when(jnp.logical_not(b_first))
    def _():
        rho_acc[:] += rho_contrib

    @pl.when(b_last)
    def _():
        rho_ref[:] = rho_acc[:].astype(rho_ref.dtype)


def attend_agg_bwd_sorted(
    g: jax.Array,  # [N, D] output cotangent
    scores: jax.Array,  # [E, K] f32
    m: jax.Array,
    l: jax.Array,
    hj: jax.Array,  # [E, D]
    *,
    tables: RowTables,
    eps: float = 1e-10,
    drop_mask: jax.Array | None = None,
    precision=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(d_alpha [E, K] f32, d_hj_agg [E, D], rho [N, K] f32)``."""
    e, d = hj.shape
    k = scores.shape[1]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    s_p = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    g_p = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0)))
    ml = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32)], axis=1
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    sel = head_selector(k, d // k)
    selt = sel.T
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl, f2: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 2 * k), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl, f2: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), g_p, ml, s_p, hj_p, selt, sel]
    dropped = drop_mask is not None
    if dropped:
        dm = jnp.pad(
            drop_mask.astype(jnp.float32), ((0, e_pad - e), (0, 0))
        )
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, d), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda w, b, c, fl, f2: (b[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ec, k), jnp.float32),
            pltpu.VMEM((ec, d), jnp.float32),
            pltpu.VMEM((rb, k), jnp.float32),
        ],
    )
    da, dhj, rho = pl.pallas_call(
        functools.partial(
            _agg_bwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            precision=precision, dropped=dropped,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, d), hj.dtype),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=2 * tables.num_work * ec * d
            * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_cfirst),
        jnp.asarray(tables.work_first),
        *args,
    )
    return da[:e], dhj[:e], rho


# --------------------------------------------------------------------------
# Backward, score branch: exact softmax Jacobian + d_pre + datt, one pass.
# --------------------------------------------------------------------------


def _score_bwd_kernel(
    wb_ref, wc_ref, wcf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    rows_ref,  # [RB, D] ht rows
    mlr_ref,  # [RB, 3K] (m | l | rho)
    s_ref,  # [EC, K]
    da_ref,  # [EC, K] d_alpha
    hj_ref,  # [EC, D]
    att_ref,  # [1, D]
    selt_ref,  # [K, D]
    dpre_ref,  # [EC, D] out
    datt_ref,  # [1, D] out
    acc_ref,  # [EC, D] f32 (hi accumulator)
    dpre_acc,  # [EC, D] f32 (per-chunk accumulation across blocks)
    datt_acc,  # [1, D] f32
    *,
    edge_chunk: int,
    k: int,
    eps: float,
    negative_slope: float,
    precision,
):
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, _hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    @pl.when(w == 0)
    def _():
        datt_acc[:] = jnp.zeros_like(datt_acc)

    # alpha and rho_e for THIS block's edges (0 elsewhere).
    mlr = _dots(onehot_t, mlr_ref[:].astype(jnp.float32), precision,
                ((1,), (0,)))  # [EC, 3K]
    m_e, l_e, rho_e = mlr[:, :k], mlr[:, k:2 * k], mlr[:, 2 * k:]
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0
    s = s_ref[:].astype(jnp.float32)
    alpha = jnp.where(inblk, jnp.exp(s - m_e) / (l_e + eps), 0.0)
    ds = alpha * (da_ref[:].astype(jnp.float32) - rho_e)  # [EC, K]

    # Score-branch cotangent of the pre-activation (this block's edges).
    hi_b = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))
    pre = hi_b + hj_ref[:].astype(jnp.float32)
    lmask = jnp.where(pre > 0, 1.0, negative_slope)
    dse = _dots_data_lhs(ds, selt_ref[:], precision, ((1,), (0,)))
    att_row = att_ref[0:1, :].astype(jnp.float32)
    dpre = jnp.where(inblk, dse * att_row * lmask, 0.0)

    cf = wcf_ref[w]
    c_first = (cf & 1) == 1
    c_last = (cf & 2) == 2

    @pl.when(c_first)
    def _():
        dpre_acc[:] = dpre

    @pl.when(jnp.logical_not(c_first))
    def _():
        dpre_acc[:] += dpre

    @pl.when(c_last)
    def _():
        dpre_ref[:] = dpre_acc[:].astype(dpre_ref.dtype)

    # datt partial (z masked to this block's edges; disjoint across items).
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    z = jnp.where(inblk, z, 0.0)
    ones = jnp.full((1, edge_chunk), 1.0, jnp.float32)
    datt_acc[:] += _dots(ones, z * dse, precision, ((1,), (0,)))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        datt_ref[:] = datt_acc[:].astype(datt_ref.dtype)


def attend_score_bwd_sorted(
    ht: jax.Array,  # [N, D]
    hj: jax.Array,  # [E, D]
    att: jax.Array,  # [K, F]
    scores: jax.Array,  # [E, K] f32
    m: jax.Array,
    l: jax.Array,
    rho: jax.Array,  # [N, K] f32
    d_alpha: jax.Array,  # [E, K] f32
    *,
    tables: RowTables,
    eps: float = 1e-10,
    negative_slope: float = 0.2,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(d_pre [E, D], datt [K, F])``."""
    e, d = hj.shape
    k = att.shape[0]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    s_p = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    da_p = jnp.pad(d_alpha.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    rows = jnp.pad(ht, ((0, n_pad - ht.shape[0]), (0, 0)))
    mlr = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32),
             rho.astype(jnp.float32)[:m.shape[0]]], axis=1,
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    att_flat = att.reshape(1, d)
    selt = head_selector(k, d // k).T
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=[
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 3 * k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ec, d), jnp.float32),
            pltpu.VMEM((ec, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    dpre, datt = pl.pallas_call(
        functools.partial(
            _score_bwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d), hj.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=2 * tables.num_work * ec * d
            * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_cfirst),
        jnp.asarray(tables.bounds),
        rows,
        mlr,
        s_p,
        da_p,
        hj_p,
        att_flat,
        selt,
    )
    return dpre[:e], datt.reshape(k, d // k).astype(att.dtype)


# --------------------------------------------------------------------------
# Permutation-free backward v2 (three kernels, no [E, D] HBM round-trips).
#
# The v1 backward (above) materializes d_hj_agg and d_pre as [E, D] edge
# arrays, adds them, PERMUTES the sum into sender order (XLA random row
# permutation: ~15.5 ms at ogbn-arxiv [E, 256] bf16) and scatters. v2
# never moves an [E, D] array between edge orders:
#
# - :func:`attend_alpha_bwd_sorted` (receiver scatter grid): d_alpha and
#   rho only — the wide d_hj_agg is recomputed downstream instead of
#   written.
# - :func:`attend_recv_bwd_sorted` (receiver scatter grid): recomputes
#   alpha and the softmax Jacobian ds in-register, forms the score-branch
#   d_pre and SCATTERS it into d ht directly (d_pre never hits HBM);
#   also accumulates datt. An edge's receiver block is the item that owns
#   it, so hi = onehot @ ht-rows is complete exactly where ds != 0 — no
#   cross-item accumulation is needed, unlike the v1 expand-grid kernel.
# - :func:`attend_sender_bwd_sorted` (sender scatter grid): the total
#   sender cotangent alpha_keep*g[recv] + d_pre, recomputed entirely
#   in-register from NODE-side values delivered in sender-edge order by
#   ONE concatenated-table gather (g | ht | m,l,rho packed), plus the
#   sender rows of ht from the block itself. Padded edge slots are
#   neutralized by folding a static [1, EC] mask row into the interval
#   indicator (the same fold that made weighted scatter free).
# --------------------------------------------------------------------------


def _alpha_bwd_kernel(
    wb_ref, wc_ref, wcf_ref, wf_ref,  # SMEM scalars (4 prefetch)
    bounds_ref,  # [1, 2, RB]
    g_ref,  # [RB, D] output cotangent rows
    ml_ref,  # [RB, 2K]
    s_ref,  # [EC, K]
    hj_ref,  # [EC, D]
    sel_ref,  # [D, K]
    *rest,
    edge_chunk: int,
    k: int,
    eps: float,
    precision,
    dropped: bool,
):
    if dropped:
        drop_ref, da_ref, rho_ref, da_acc, rho_acc = rest
    else:
        da_ref, rho_ref, da_acc, rho_acc = rest
        drop_ref = None
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit = _interval_onehots(bounds_ref, base, edge_chunk, rb)

    gexp = _dots(onehot_t, g_ref[:], precision, ((1,), (0,)))  # [EC, D] f32
    hjf = hj_ref[:].astype(jnp.float32)
    dalpha = _dots_data_lhs(gexp * hjf, sel_ref[:], precision,
                            ((1,), (0,)))  # [EC, K]
    alpha = _alpha_from(onehot_t, ml_ref, s_ref, k, eps, precision)
    if dropped:
        dalpha = dalpha * drop_ref[:].astype(jnp.float32)
    rho_contrib = _dots(hit, alpha * dalpha, precision, ((1,), (0,)))

    cf = wcf_ref[w]
    c_first = (cf & 1) == 1
    c_last = (cf & 2) == 2
    bf = wf_ref[w]
    b_first = (bf & 1) == 1
    b_last = (bf & 2) == 2

    @pl.when(c_first)
    def _():
        da_acc[:] = dalpha

    @pl.when(jnp.logical_not(c_first))
    def _():
        da_acc[:] += dalpha

    @pl.when(c_last)
    def _():
        da_ref[:] = da_acc[:].astype(da_ref.dtype)

    @pl.when(b_first)
    def _():
        rho_acc[:] = rho_contrib

    @pl.when(jnp.logical_not(b_first))
    def _():
        rho_acc[:] += rho_contrib

    @pl.when(b_last)
    def _():
        rho_ref[:] = rho_acc[:].astype(rho_ref.dtype)


def attend_alpha_bwd_sorted(
    g: jax.Array,  # [N, D] output cotangent
    scores: jax.Array,  # [E, K] f32
    m: jax.Array,
    l: jax.Array,
    hj: jax.Array,  # [E, D]
    *,
    tables: RowTables,
    eps: float = 1e-10,
    drop_mask: jax.Array | None = None,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Slim aggregation-branch backward: ``(d_alpha [E, K] f32,
    rho [N_pad, K] f32)`` — no wide d_hj output (the sender kernel
    recomputes it in-register)."""
    e, d = hj.shape
    k = scores.shape[1]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    s_p = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
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
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl, f2: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 2 * k), lambda w, b, c, fl, f2: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl, f2: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl, f2: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), g_p, ml, s_p, hj_p, sel]
    dropped = drop_mask is not None
    if dropped:
        dm = jnp.pad(
            drop_mask.astype(jnp.float32), ((0, e_pad - e), (0, 0))
        )
        in_specs.append(
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ec, k), lambda w, b, c, fl, f2: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda w, b, c, fl, f2: (b[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ec, k), jnp.float32),
            pltpu.VMEM((rb, k), jnp.float32),
        ],
    )
    da, rho = pl.pallas_call(
        functools.partial(
            _alpha_bwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            precision=precision, dropped=dropped,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=tables.num_work * ec * d * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_cfirst),
        jnp.asarray(tables.work_first),
        *args,
    )
    return da[:e], rho


def _recv_bwd_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    rows_ref,  # [RB, D] ht rows (receiver blocks)
    mlr_ref,  # [RB, 3K] (m | l | rho)
    s_ref,  # [EC, K]
    da_ref,  # [EC, K] d_alpha (drop-scaled)
    hj_ref,  # [EC, D]
    att_ref,  # [1, D]
    selt_ref,  # [K, D]
    out_ref,  # [RB, D] d ht (receiver side)
    datt_ref,  # [1, D]
    acc_ref,  # [RB, D] f32
    datt_acc,  # [1, D] f32
    *,
    edge_chunk: int,
    k: int,
    eps: float,
    negative_slope: float,
    precision,
):
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
    s = s_ref[:].astype(jnp.float32)
    alpha = jnp.where(inblk, jnp.exp(s - m_e) / (l_e + eps), 0.0)
    ds = alpha * (da_ref[:].astype(jnp.float32) - rho_e)  # 0 out-of-block

    hi_b = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))
    pre = hi_b + hj_ref[:].astype(jnp.float32)
    lmask = jnp.where(pre > 0, 1.0, negative_slope)
    dse = _dots_data_lhs(ds, selt_ref[:], precision, ((1,), (0,)))
    att_row = att_ref[0:1, :].astype(jnp.float32)
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

    # datt: each edge contributes exactly once (in its owning block's
    # items; dse == 0 elsewhere). pre is finite out-of-block (hi = 0), so
    # z * dse is an exact 0 there.
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    ones = jnp.full((1, edge_chunk), 1.0, jnp.float32)
    datt_acc[:] += _dots(ones, z * dse, precision, ((1,), (0,)))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        datt_ref[:] = datt_acc[:].astype(datt_ref.dtype)


def attend_recv_bwd_sorted(
    ht: jax.Array,  # [N, D]
    hj: jax.Array,  # [E, D]
    att: jax.Array,  # [K, F]
    scores: jax.Array,  # [E, K] f32
    m: jax.Array,
    l: jax.Array,
    rho: jax.Array,  # [N_pad or N, K] f32
    d_alpha: jax.Array,  # [E, K] f32 (drop-scaled)
    *,
    tables: RowTables,
    eps: float = 1e-10,
    negative_slope: float = 0.2,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Fused score-branch receiver side: returns ``(d_ht_recv
    [N_pad, D], datt [K, F])`` — d_pre is scattered in-kernel, never
    written to HBM."""
    e, d = hj.shape
    k = att.shape[0]
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    s_p = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    da_p = jnp.pad(d_alpha.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    hj_p = jnp.pad(hj, ((0, e_pad - e), (0, 0)))
    rows = jnp.pad(ht, ((0, n_pad - ht.shape[0]), (0, 0)))
    mlr = jnp.pad(
        jnp.concatenate(
            [m.astype(jnp.float32), l.astype(jnp.float32),
             rho.astype(jnp.float32)[:m.shape[0]]], axis=1,
        ),
        ((0, n_pad - m.shape[0]), (0, 0)),
    )
    att_flat = att.reshape(1, d)
    selt = head_selector(k, d // k).T
    if precision is None:
        precision = (
            "split2" if hj.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=[
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 3 * k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    dht, datt = pl.pallas_call(
        functools.partial(
            _recv_bwd_kernel, edge_chunk=ec, k=k, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), ht.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=tables.num_work * ec * d
            * hj.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        jnp.asarray(tables.bounds),
        rows,
        mlr,
        s_p,
        da_p,
        hj_p,
        att_flat,
        selt,
    )
    return dht, datt.reshape(k, d // k).astype(att.dtype)


def _sender_bwd_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB] (sender blocks)
    rows_ref,  # [RB, D] ht rows (sender blocks)
    g_ref,  # [EC, GP] gathered g[recv] (lanes 0:D valid)
    hr_ref,  # [EC, GP] gathered ht[recv]
    tail_ref,  # [EC, 128] packed m|l|rho
    att_ref,  # [1, D]
    sel_ref,  # [D, K]
    selt_ref,  # [K, D]
    *rest,
    edge_chunk: int,
    k: int,
    d: int,
    eps: float,
    negative_slope: float,
    precision,
    packed: bool,
    masked: bool,
    dropped: bool,
):
    refs = list(rest)
    mask_ref = refs.pop(0) if masked else None
    drop_ref = refs.pop(0) if dropped else None
    out_ref, acc_ref = refs
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    onehot_t, hit_raw = _interval_onehots(bounds_ref, base, edge_chunk, rb)
    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi_b = bounds_ref[0, 1:2, :].reshape(rb, 1)
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)
    inside = (gidx >= lo) & (gidx < hi_b)
    if masked:
        # Fold the static validity mask into the indicator (exactly the
        # weighted-scatter fold): padded edge slots contribute zero.
        mrow = mask_ref[0, 0:1, :].astype(jnp.float32)  # [1, EC]
        hit = jnp.where(inside, mrow, 0.0)
    else:
        hit = hit_raw

    # Node-side values in sender-edge order.
    tail = tail_ref[:].astype(jnp.float32)  # [EC, 128]
    if packed:
        m_e = tail[:, 0:k] + tail[:, k:2 * k]
        l_e = tail[:, 2 * k:3 * k] + tail[:, 3 * k:4 * k]
        rho_e = tail[:, 4 * k:5 * k] + tail[:, 5 * k:6 * k]
    else:
        m_e = tail[:, 0:k]
        l_e = tail[:, k:2 * k]
        rho_e = tail[:, 2 * k:3 * k]
    g_r = g_ref[:, 0:d].astype(jnp.float32)
    ht_r = hr_ref[:, 0:d].astype(jnp.float32)

    # hj from this block's sender rows; 0 out-of-block (alpha masked too).
    hj = _dots(onehot_t, rows_ref[:], precision, ((1,), (0,)))
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0

    pre = ht_r + hj
    z = jnp.where(pre > 0, pre, negative_slope * pre)
    att_row = att_ref[0:1, :].astype(jnp.float32)
    s = _dots_data_lhs(z * att_row, sel_ref[:], precision,
                       ((1,), (0,)))  # [EC, K]
    alpha = jnp.where(inblk, jnp.exp(s - m_e) / (l_e + eps), 0.0)
    dalpha = _dots_data_lhs(g_r * hj, sel_ref[:], precision, ((1,), (0,)))
    if dropped:
        drop = drop_ref[:].astype(jnp.float32)
        dalpha = dalpha * drop
        alpha_keep = alpha * drop
    else:
        alpha_keep = alpha
    ds = alpha * (dalpha - rho_e)
    dse = _dots_data_lhs(ds, selt_ref[:], precision, ((1,), (0,)))
    lmask = jnp.where(pre > 0, 1.0, negative_slope)
    dpre = dse * att_row * lmask
    akd = _dots_data_lhs(alpha_keep, selt_ref[:], precision, ((1,), (0,)))
    dhj = akd * g_r + dpre  # total sender cotangent, this block's edges

    contrib = _dots(hit, dhj.astype(rows_ref.dtype), precision,
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


def pack_node_sidecar(
    m: jax.Array,  # [N, K] f32
    l: jax.Array,  # [N, K] f32
    rho: jax.Array,  # [N_pad >= N, K] f32
    num_nodes: int,
    dtype,
) -> tuple[jax.Array, bool]:
    """128-lane packed softmax-stat sidecar for the sender-side gather.

    Measured (benchmarks/take_fix_probe.py, real v5e): XLA's random row
    gather has a WIDTH CLIFF — ≤256 bf16 lanes runs at 4.3 ms/1.34M rows
    and 128 lanes at 2.6 ms, while ≥320 lanes jumps to ~20 ms and narrow
    (<128-lane) tables are descriptor-bound (14.5 ms for 16 f32 lanes).
    The backward therefore gathers THREE separate ≤256-lane tables (g,
    ht, this sidecar) instead of one [N, 640] concat.

    bf16 sidecars carry m/l/rho as hi/lo bf16 VALUE pairs (hi = bf16(x),
    lo = bf16(x - hi)): the kernel reconstructs x = hi + lo to ~f24 — no
    bitcasting, Mosaic-portable. Returns ``(table [N, 128], packed)``.
    """
    k = m.shape[1]
    m = m[:num_nodes]
    l = l[:num_nodes]
    rho = rho[:num_nodes]
    if dtype == jnp.bfloat16:
        assert 6 * k <= 128, "heads too wide for the packed sidecar"

        def _split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        m_hi, m_lo = _split(m.astype(jnp.float32))
        l_hi, l_lo = _split(l.astype(jnp.float32))
        r_hi, r_lo = _split(rho.astype(jnp.float32))
        tail = jnp.concatenate([m_hi, m_lo, l_hi, l_lo, r_hi, r_lo],
                               axis=1)
        packed = True
    else:
        assert 3 * k <= 128, "heads too wide for the sidecar"
        tail = jnp.concatenate(
            [m.astype(dtype), l.astype(dtype), rho.astype(dtype)],
            axis=1,
        )
        packed = False
    tpad = jnp.zeros((m.shape[0], 128 - tail.shape[1]), dtype)
    return jnp.concatenate([tail.astype(dtype), tpad], axis=1), packed


def attend_sender_bwd_sorted(
    ht: jax.Array,  # [N, D]
    g_ss: jax.Array,  # [E, D] gathered g[recv] (sender order)
    ht_ss: jax.Array,  # [E, D] gathered ht[recv] (sender order)
    tail_ss: jax.Array,  # [E, 128] gathered packed m|l|rho sidecar
    att: jax.Array,  # [K, F]
    *,
    tables: RowTables,
    packed: bool,
    eps: float = 1e-10,
    negative_slope: float = 0.2,
    mask_ss: jax.Array | None = None,  # [E] f32 validity (sender order)
    drop_ss: jax.Array | None = None,  # [E, K] (sender order)
    precision=None,
) -> jax.Array:
    """Total sender-side cotangent of ``ht``: ``[N_pad, D]`` — scatter of
    ``alpha_keep * g[recv] + d_pre`` over the sender-sorted grid with
    everything recomputed in-register (no edge-order permutation).

    The node-side inputs arrive as THREE separate gathered arrays (not
    one concat): XLA's random gather falls off a cliff above 256 lanes
    (see :func:`pack_node_sidecar`)."""
    e = g_ss.shape[0]
    d = ht.shape[1]
    k = att.shape[0]
    assert tail_ss.shape[1] == 128
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    n_pad = nb * rb
    g_p = jnp.pad(g_ss, ((0, e_pad - e), (0, 0)))
    hr_p = jnp.pad(ht_ss, ((0, e_pad - e), (0, 0)))
    tail_p = jnp.pad(tail_ss, ((0, e_pad - e), (0, 0)))
    rows = jnp.pad(ht, ((0, n_pad - ht.shape[0]), (0, 0)))
    att_flat = att.reshape(1, d)
    sel = head_selector(k, d // k)
    selt = sel.T
    if precision is None:
        precision = (
            "split2" if ht.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, d), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, 128), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda w, b, c, fl: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), rows, g_p, hr_p, tail_p,
            att_flat, sel, selt]
    masked = mask_ss is not None
    if masked:
        mt = jnp.pad(mask_ss.astype(jnp.float32), (0, e_pad - e))
        args.append(mt.reshape(e_pad // ec, 1, ec))
        in_specs.append(
            pl.BlockSpec((1, 1, ec), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
    dropped = drop_ss is not None
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
            _sender_bwd_kernel, edge_chunk=ec, k=k, d=d, eps=float(eps),
            negative_slope=float(negative_slope), precision=precision,
            packed=packed, masked=masked, dropped=dropped,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), ht.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * tables.num_work * ec * (rb + k) * d,
            bytes_accessed=tables.num_work * ec * (2 * d + 128)
            * ht.dtype.itemsize,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        *args,
    )
    return out
