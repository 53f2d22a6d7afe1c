"""Fused Pallas kernels for the sorted edge softmax (GATv2 attention).

Reference semantics: per-receiver max-shifted softmax with ``+eps`` in the
denominator (gatv2_conv.py:291-311). XLA executes this as segment_max +
gather + segment_sum + gather over ``[E, heads]`` arrays — 16-byte rows
that cost ~35 ms at ogbn-arxiv scale on TPU (pure gather/scatter latency).

Here the whole forward runs in TWO passes over the score array using the
same boundary-encoded work-list grid as the SpMM kernels
(spmm_pallas.py):

- **stats pass** — one streaming pass computing BOTH the per-row max
  ``m`` and the normalizer ``l = sum exp(s - m)`` with flash-attention
  style online rescaling (``l <- l * exp(m_old - m_new) + sum exp(s -
  m_new)``). Per-row max uses the interval indicator + per-head masked
  lane reduction; the sum-exp uses interval one-hot MXU contractions, so
  no gather/scatter appears anywhere.
- **apply pass** — an expand-shaped kernel: accumulate ``m_e = onehot^T @
  m`` and ``l_e = onehot^T @ l`` across the row blocks overlapping each
  chunk, then emit ``alpha = exp(s - m_e) / (l_e + eps)`` in-register.

Masking: callers pre-set masked (padded) slots to ``-inf``; they then
contribute ``exp(-inf) = 0`` everywhere automatically. Rows with no
unmasked edges keep ``m = 0`` (the reference's inf->0 fixup) and ``l =
0`` so ``alpha = 0/eps = 0``.

Precision: the one-hot contractions use the split2 (two bf16 passes)
scheme from spmm_pallas for full f32 fidelity of the stats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_pallas import RowTables, _dots

__all__ = ["softmax_stats_sorted", "softmax_apply_sorted"]


def _stats_kernel(
    work_block_ref, work_chunk_ref, work_first_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    scores_t_ref,  # [K, EC]  (heads on sublanes — for the masked max)
    scores_ref,  # [EC, K]  (edges on sublanes — for the exp/contraction)
    m_out_ref,  # [RB, K]
    l_out_ref,  # [RB, K]
    m_acc_ref,  # [RB, K] f32
    l_acc_ref,  # [RB, K] f32
    *,
    edge_chunk: int,
):
    w = pl.program_id(0)
    base = work_chunk_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    k = scores_t_ref.shape[0]

    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi = bounds_ref[0, 1:2, :].reshape(rb, 1)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)
    gidx = base + eidx
    hit = jnp.where((gidx >= lo) & (gidx < hi), 1.0, 0.0)  # [RB, EC]

    # Per-head masked max along lanes (strictly 2-D; no lane<->sublane
    # casts). Assembled into [RB, K] via lane selects.
    neg = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, k), 1)
    mx = jnp.full((rb, k), neg, jnp.float32)
    hitb = hit > 0.0
    for kk in range(k):
        s_k = scores_t_ref[kk : kk + 1, :].astype(jnp.float32)  # [1, EC]
        masked = jnp.where(hitb, s_k, neg)
        col = jnp.max(masked, axis=1, keepdims=True)  # [RB, 1]
        mx = jnp.where(lane == kk, col, mx)

    flags = work_first_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    m_old = jnp.where(is_first, jnp.full((rb, k), neg, jnp.float32),
                      m_acc_ref[:])
    l_old = jnp.where(is_first, jnp.zeros((rb, k), jnp.float32),
                      l_acc_ref[:])

    m_new = jnp.maximum(m_old, mx)
    # -inf rows (nothing seen yet anywhere): keep exp args finite.
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)

    # Per-edge shift for THIS block's rows; edges outside the block get
    # m_e = 0, but the one-hot in the l-contraction zeroes them anyway.
    gidx_t = base + jax.lax.broadcasted_iota(
        jnp.int32, (edge_chunk, 1), 0
    )  # [EC, 1]
    lo_t = bounds_ref[0, 0:1, :]  # [1, RB]
    hi_t = bounds_ref[0, 1:2, :]
    onehot_t = jnp.where((gidx_t >= lo_t) & (gidx_t < hi_t), 1.0, 0.0)

    m_e = _dots(onehot_t, m_safe, "split2", ((1,), (0,)))  # [EC, K]
    s = scores_ref[:].astype(jnp.float32)
    ex = jnp.exp(s - m_e)  # masked slots: s = -inf -> 0
    # Edges not in this block would contribute exp(s - 0); the one-hot
    # contraction removes them exactly.
    l_contrib = _dots(hit, ex, "split2", ((1,), (0,)))  # [RB, K]

    factor = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_safe), 0.0)
    l_new = l_old * factor + l_contrib

    m_acc_ref[:] = m_new
    l_acc_ref[:] = l_new

    @pl.when(is_last)
    def _():
        # Reference fixup: rows with no (unmasked) edges report m = 0.
        m_out_ref[:] = jnp.where(jnp.isfinite(m_new), m_new, 0.0).astype(
            m_out_ref.dtype
        )
        l_out_ref[:] = l_new.astype(l_out_ref.dtype)


def softmax_stats_sorted(
    scores: jax.Array,
    num_nodes: int,
    *,
    tables: RowTables,
) -> tuple[jax.Array, jax.Array]:
    """One-pass per-row (max, sum-exp) of receiver-sorted ``[E, K]`` scores.

    Masked slots must already be ``-inf``. Returns ``(m, l)`` each
    ``[num_nodes, K]`` f32 with the reference's inf->0 fixup applied to m.
    """
    e, k = scores.shape
    ec = tables.edge_chunk
    rb = tables.row_block
    e_pad = ((e + ec - 1) // ec) * ec
    s = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)),
                constant_values=-jnp.inf)
    st = s.T  # [K, E_pad]

    bounds = jnp.asarray(tables.bounds)
    num_blocks = tables.bounds.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=[
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ec), lambda w, b, c, fl: (0, c[w]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, k), jnp.float32),
            pltpu.VMEM((rb, k), jnp.float32),
        ],
    )
    m, l = pl.pallas_call(
        functools.partial(_stats_kernel, edge_chunk=ec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_blocks * rb, k), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * rb, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * tables.num_work * ec * rb * k,
            bytes_accessed=2 * tables.num_work * ec * k * 4,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        bounds,
        st,
        s,
    )
    return m[:num_nodes], l[:num_nodes]


def _apply_kernel(
    work_block_ref, work_chunk_ref, work_cfirst_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    scores_ref,  # [EC, K]
    m_ref,  # [RB, K]
    l_ref,  # [RB, K]
    alpha_ref,  # [EC, K] out
    ml_acc_ref,  # [EC, 2K] f32 scratch (m_e | l_e accumulators)
    *,
    edge_chunk: int,
    eps: float,
):
    w = pl.program_id(0)
    base = work_chunk_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    k = m_ref.shape[1]

    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (edge_chunk, 1), 0)
    lo = bounds_ref[0, 0:1, :]  # [1, RB]
    hi = bounds_ref[0, 1:2, :]
    onehot_t = jnp.where((gidx >= lo) & (gidx < hi), 1.0, 0.0)  # [EC, RB]

    ml = jnp.concatenate(
        [m_ref[:].astype(jnp.float32), l_ref[:].astype(jnp.float32)], axis=1
    )  # [RB, 2K]
    contrib = _dots(onehot_t, ml, "split2", ((1,), (0,)))  # [EC, 2K]

    flags = work_cfirst_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        ml_acc_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        ml_acc_ref[:] += contrib

    @pl.when(is_last)
    def _():
        acc = ml_acc_ref[:]
        m_e = acc[:, :k]
        l_e = acc[:, k:]
        s = scores_ref[:].astype(jnp.float32)
        alpha = jnp.exp(s - m_e) / (l_e + eps)
        alpha_ref[:] = alpha.astype(alpha_ref.dtype)


def softmax_apply_sorted(
    scores: jax.Array,
    m: jax.Array,
    l: jax.Array,
    *,
    tables: RowTables,
    eps: float = 1e-10,
    out_dtype=None,
) -> jax.Array:
    """``alpha = exp(s - m[row]) / (l[row] + eps)`` in one expand-shaped pass.

    Masked slots must be ``-inf`` in ``scores`` (alpha comes out 0).
    """
    e, k = scores.shape
    ec = tables.edge_chunk
    rb = tables.row_block
    e_pad = ((e + ec - 1) // ec) * ec
    s = jnp.pad(scores.astype(jnp.float32), ((0, e_pad - e), (0, 0)),
                constant_values=-jnp.inf)
    num_blocks = tables.bounds.shape[0]
    n_pad = num_blocks * rb
    mp = jnp.pad(m.astype(jnp.float32), ((0, n_pad - m.shape[0]), (0, 0)))
    lp = jnp.pad(l.astype(jnp.float32), ((0, n_pad - l.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=[
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ec, k), lambda w, b, c, fl: (c[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ec, 2 * k), jnp.float32)],
    )
    out_dtype = out_dtype or scores.dtype
    alpha = pl.pallas_call(
        functools.partial(_apply_kernel, edge_chunk=ec, eps=float(eps)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, k), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * tables.num_work * ec * rb * k,
            bytes_accessed=2 * tables.num_work * ec * k * 4,
            transcendentals=tables.num_work * ec * k,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_cfirst),
        jnp.asarray(tables.bounds),
        s,
        mp,
        lp,
    )
    return alpha[:e]
