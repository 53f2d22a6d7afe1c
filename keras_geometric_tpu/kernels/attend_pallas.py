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
