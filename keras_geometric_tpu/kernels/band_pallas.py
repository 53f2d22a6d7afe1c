"""Banded-dense SpMM: locality-reordered edges as MXU matmuls.

The random sender gather is the SpMM hot path's one irreducible random
memory access, and XLA's row gather on TPU has a hard per-row cost that
is *locality-insensitive* (measured ~2.6 ns/row whether indices span 256
rows or the whole array — benchmarks/locality_probe.py). The only way to
cash in data locality is to never gather at all:

After a community/bandwidth reordering (ops/reorder.py), most edges of a
real graph satisfy ``sender ∈ window(block(receiver))`` for a sliding
window of W rows. Those edges are stored as a **dense banded adjacency**
``band[n, W]`` where column ``c`` holds the weight of edge
``(base(block(n)) + c -> n)``, and the SpMM over them becomes a blocked
dense matmul:

    y[block b] = band[b·RB:(b+1)·RB, :] @ x[base(b) : base(b)+W]

— pure MXU work, no gather, no scatter, streaming ``x`` windows and the
band once. Cost per edge: ``2·W/deg_local`` band bytes (vs ~2100
byte-equivalents for XLA's per-row gather cost at 819 GB/s), so the band
wins whenever local density ``deg·W/n`` clears ~1/1000.

The feature window is expressed as TWO consecutive ``[W/2, F]`` blocks
whose indices come from a scalar-prefetched per-block table — standard
BlockSpec streaming, so the pipeline double-buffers the windows (and
skips re-fetches when consecutive row blocks share a window block).

Edges that do not fit the band (inter-community residual) stay on the
CSR gather/scatter tier (spmm_pallas.py); ``GraphContext`` sums both.

**Transpose-representability**: an edge is banded only if it fits the
window in BOTH orientations (``s ∈ win(blk(r))`` and ``r ∈
win(blk(s))``), so the transpose of the band part is itself a band (and
of the residual, a residual): every existing custom VJP stays valid, and
for symmetric (undirected, GCN-normalized) graphs the band is exactly
self-transpose.

No reference analog: the reference delegates its SpMM to backend
``ops.take``/``ops.segment_sum`` (message_passing.py:195-212) with no
layout control at all. This tier exists for the BASELINE.json >=70% HBM
north star.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["BandPlan", "build_band_plan", "band_spmm"]

BAND_ROW_BLOCK = 256


class BandPlan(NamedTuple):
    """Device-side banded adjacency for one orientation."""

    band: jax.Array  # [n_pad, W] weights (0 = no edge)
    base_idx: jax.Array  # [NB] int32: window start in W/2-block units
    window: int
    row_block: int
    num_edges: int  # real edges represented in the band

    @property
    def n_pad(self) -> int:
        return int(self.band.shape[0])


def _block_base_rows(n_pad: int, window: int, row_block: int) -> np.ndarray:
    """Window start row per row block: centered, clamped, W/2-aligned."""
    w2 = window // 2
    nb = n_pad // row_block
    centers = np.arange(nb, dtype=np.int64) * row_block + row_block // 2
    k = np.clip(
        np.round((centers - window // 2) / w2).astype(np.int64),
        0,
        max(n_pad // w2 - 2, 0),
    )
    return k


def build_band_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray | None,
    num_nodes: int,
    *,
    window: int = 1024,
    row_block: int = BAND_ROW_BLOCK,
    exclude: np.ndarray | None = None,
) -> tuple[BandPlan, np.ndarray]:
    """Split edges into (band, residual) and build the dense band.

    Returns ``(plan, local_mask)`` where ``local_mask[e]`` marks edges
    absorbed into the band. The symmetric fit criterion (module
    docstring) makes the band's transpose a band over the same node
    padding, so ``plan`` serves as its own backward for symmetric
    adjacencies and the caller builds one extra plan (same mask) from
    the swapped edge list otherwise.

    ``num_nodes`` must already be padded to a multiple of
    ``lcm(row_block, window/2)`` and be at least ``window``
    (prepare_graph arranges this via its band-aware node grain).
    """
    w2 = window // 2
    if window % 256:
        raise ValueError(f"window must be a multiple of 256, got {window}")
    grain = max(row_block, w2)
    if num_nodes % grain or num_nodes < window:
        raise ValueError(
            f"num_nodes={num_nodes} must be a multiple of {grain} and "
            f">= window={window} (use prepare_graph(pad_nodes=True))"
        )
    s = np.asarray(senders, dtype=np.int64)
    r = np.asarray(receivers, dtype=np.int64)
    k = _block_base_rows(num_nodes, window, row_block)
    base_row = k * w2  # [NB]
    off_s = s - base_row[r // row_block]  # col of edge in r's band
    off_r = r - base_row[s // row_block]
    local = (
        (off_s >= 0) & (off_s < window) & (off_r >= 0) & (off_r < window)
    )
    if exclude is not None:
        local &= ~np.asarray(exclude, bool)
    band = np.zeros((num_nodes, window), np.float32)
    w = (
        np.ones(s.shape[0], np.float32)
        if weights is None
        else np.asarray(weights, np.float32)
    )
    np.add.at(band, (r[local], off_s[local]), w[local])
    plan = BandPlan(
        band=jnp.asarray(band),
        base_idx=jnp.asarray(k.astype(np.int32)),
        window=window,
        row_block=row_block,
        num_edges=int(local.sum()),
    )
    return plan, local


def _band_kernel(base_ref, band_ref, x1_ref, x2_ref, out_ref):
    a = band_ref[:]
    w2 = x1_ref.shape[0]
    y = jax.lax.dot_general(
        a[:, :w2], x1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y += jax.lax.dot_general(
        a[:, w2:], x2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = y.astype(out_ref.dtype)


def _band_matmul(x: jax.Array, band: jax.Array, base_idx: jax.Array,
                 window: int, row_block: int) -> jax.Array:
    n_pad, f = x.shape
    w2 = window // 2
    nb = n_pad // row_block
    band = band.astype(x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((row_block, window), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, f), lambda b, k: (k[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, f), lambda b, k: (k[b] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, f), lambda b, k: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _band_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * window * f,
            bytes_accessed=(
                n_pad * window * band.dtype.itemsize
                + 2 * n_pad * f * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(base_idx, band, x, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _band_spmm(x, arrays, window, row_block):
    band, base_idx, _bandT, _base_idxT = arrays
    return _band_matmul(x, band, base_idx, window, row_block)


def _band_spmm_fwd(x, arrays, window, row_block):
    return _band_spmm(x, arrays, window, row_block), arrays


def _band_spmm_bwd(window, row_block, arrays, g):
    band, base_idx, bandT, base_idxT = arrays
    if bandT is None:  # symmetric: the band is its own transpose
        bandT, base_idxT = band, base_idx
    return _band_matmul(g, bandT, base_idxT, window, row_block), None


_band_spmm.defvjp(_band_spmm_fwd, _band_spmm_bwd)


def band_spmm(
    x: jax.Array,
    plan: BandPlan,
    plan_bwd: BandPlan | None = None,
) -> jax.Array:
    """``y = B @ x`` over the banded edges (differentiable in ``x``).

    ``plan_bwd`` is the transpose orientation's plan; omit it for
    symmetric adjacencies (the band is then its own transpose).
    """
    if x.shape[0] != plan.n_pad:
        raise ValueError(
            f"x rows {x.shape[0]} != band n_pad {plan.n_pad}"
        )
    arrays = (
        plan.band,
        plan.base_idx,
        None if plan_bwd is None else plan_bwd.band,
        None if plan_bwd is None else plan_bwd.base_idx,
    )
    return _band_spmm(x, arrays, plan.window, plan.row_block)
