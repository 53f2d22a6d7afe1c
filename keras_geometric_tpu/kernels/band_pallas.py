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

__all__ = [
    "BandPlan", "build_band_plan", "band_spmm",
    "WindowScatterPlan", "build_window_scatter_plan", "window_scatter_sum",
]

BAND_ROW_BLOCK = 256


# ---------------------------------------------------------------------------
# Windowed scatter: the banded-attention backward finisher (r5).
#
# The fused GATv2 backward produces the per-edge sender cotangent ``v``
# in RECEIVER-sorted order; finishing the sender side needs a scatter by
# sender — random memory. The single-permute finish (ops/csr.py) pays a
# take whose [E, H*F] source sits beyond the ~128 MB gather cliff
# (~15.9 ms at arxiv scale, benchmarks/RESULTS.md r4). After a locality
# reordering most senders of each receiver-sorted edge chunk fall into
# ONE W-aligned window of the node axis, so their scatter needs no
# random access at all: an equality one-hot ``hit[j, e] = (sender[e] ==
# win_base + j)`` contracted against the message chunk on the MXU sums
# them straight into the window rows — the same one-hot-contraction
# trick as the sorted scatter (spmm_pallas.py), with VALUE equality
# replacing the sorted-interval test, so arbitrary sender order inside
# the chunk is fine. Only the residual minority (senders outside their
# chunk's window, inter-community edges) still rides the permute — and
# the take's cost is proportional to its INDEX count (measured r5), so
# shrinking the permuted stream 4x shrinks its cost 4x even though the
# source stays the full [E, H*F] array.
#
# Unlike the banded-dense SpMM tier above, this needs NO dense band
# array, no symmetric fit criterion and no reordered feature windows —
# eligibility is chosen per edge CHUNK (the window that captures the
# most senders), computed exactly on host.
# ---------------------------------------------------------------------------


class WindowScatterPlan:
    """Host-built work list for :func:`window_scatter_sum`.

    A plain class (id-hashed), not a NamedTuple: it rides jit caches as
    a ``nondiff_argnums`` operand, like ``spmm_pallas.RowTables``.
    """

    def __init__(self, work_win, work_chunk, work_flags, window,
                 num_windows, edge_chunk, num_band_edges):
        self.work_win = work_win  # [Wk] int32: window index of item
        self.work_chunk = work_chunk  # [Wk] int32: edge-chunk of item
        # bit0: first item of its window; bit1: last item of its window.
        self.work_flags = work_flags  # [Wk] int32
        self.window = int(window)
        self.num_windows = int(num_windows)
        self.edge_chunk = int(edge_chunk)
        self.num_band_edges = int(num_band_edges)  # absorbed edge count

    @property
    def num_work(self) -> int:
        return int(self.work_win.shape[0])


def build_window_scatter_plan(
    senders: np.ndarray,
    num_nodes: int,
    eligible: np.ndarray,
    *,
    window: int = 1024,
    edge_chunk: int = 1024,
) -> tuple[WindowScatterPlan, np.ndarray, np.ndarray]:
    """Choose each edge chunk's best W-aligned window and split edges.

    ``senders`` is the [E_pad] receiver-sorted sender array (padding
    slots marked False in ``eligible``). Returns ``(plan, band_mask,
    sender_tab)``: ``band_mask[e]`` marks edges whose sender falls in
    their chunk's chosen window; ``sender_tab[e]`` is the sender id for
    those edges and -1 otherwise (the kernel's equality one-hot then
    never matches non-band slots). ``num_nodes`` must be a multiple of
    ``window`` (prepare_graph's pad grain arranges this).
    """
    senders = np.asarray(senders, np.int64)
    eligible = np.asarray(eligible, bool)
    e_pad = senders.shape[0]
    if e_pad % edge_chunk:
        raise ValueError("senders must be padded to the edge_chunk grain")
    if num_nodes % window:
        raise ValueError(
            f"num_nodes={num_nodes} must be a multiple of window={window}"
        )
    num_windows = num_nodes // window
    nchunks = e_pad // edge_chunk
    swin = senders // window  # [E_pad]
    chunk_id = np.arange(e_pad) // edge_chunk
    # Votes per (chunk, window) -> per-chunk argmax window.
    key = chunk_id[eligible] * num_windows + swin[eligible]
    votes = np.bincount(key, minlength=nchunks * num_windows)
    votes = votes.reshape(nchunks, num_windows)
    chosen = votes.argmax(axis=1)  # [nchunks]
    band_mask = eligible & (swin == chosen[chunk_id])
    sender_tab = np.where(band_mask, senders, -1).astype(np.int32)
    # Work list: one item per (chosen window, chunk) pair that has any
    # band edge, ordered window-major (accumulation requires items of a
    # window to be consecutive); windows with no items still need ONE
    # visit to initialize their output block (all-miss one-hot -> 0).
    has = np.bincount(chunk_id[band_mask], minlength=nchunks) > 0
    wins = chosen[has]
    chunks = np.nonzero(has)[0]
    order = np.lexsort((chunks, wins))
    wins, chunks = wins[order], chunks[order]
    missing = np.setdiff1d(np.arange(num_windows), wins)
    if missing.size:
        wins = np.concatenate([wins, missing])
        chunks = np.concatenate([chunks, np.zeros_like(missing)])
        order = np.lexsort((chunks, wins))
        wins, chunks = wins[order], chunks[order]
    first = np.ones(wins.shape[0], np.int32)
    first[1:] = (wins[1:] != wins[:-1]).astype(np.int32)
    last = np.ones(wins.shape[0], np.int32)
    last[:-1] = (wins[1:] != wins[:-1]).astype(np.int32)
    plan = WindowScatterPlan(
        work_win=wins.astype(np.int32),
        work_chunk=chunks.astype(np.int32),
        work_flags=(first | (2 * last)).astype(np.int32),
        window=window,
        num_windows=num_windows,
        edge_chunk=edge_chunk,
        num_band_edges=int(band_mask.sum()),
    )
    return plan, band_mask, sender_tab


def _win_scatter_kernel(
    win_ref, chunk_ref, flags_ref,  # SMEM scalar-prefetch
    sender_ref,  # [1, 1, EC] int32
    msg_ref,  # [EC, F]
    out_ref,  # [WINDOW, F]
    acc_ref,  # [WINDOW, F] f32 scratch
    *,
    edge_chunk: int,
    window: int,
):
    w = pl.program_id(0)
    base = win_ref[w] * window
    srow = sender_ref[0, 0, :].reshape(1, edge_chunk)
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
    msgs = msg_ref[:]
    hit = jnp.where(srow == rows, 1.0, 0.0).astype(msgs.dtype)
    contrib = jax.lax.dot_general(
        hit, msgs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    flags = flags_ref[w]

    @pl.when((flags & 1) == 1)
    def _():
        acc_ref[:] = contrib

    @pl.when((flags & 1) == 0)
    def _():
        acc_ref[:] += contrib

    @pl.when((flags & 2) == 2)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def window_scatter_sum(
    messages: jax.Array,
    sender_tab: jax.Array,
    plan: WindowScatterPlan,
) -> jax.Array:
    """Sum receiver-sorted ``[E, F]`` messages into their senders' rows
    for the window-eligible edges (``sender_tab[e] >= 0``); other slots
    contribute nothing. Returns ``[num_windows * window, F]``.
    """
    e, f = messages.shape
    ec, window = plan.edge_chunk, plan.window
    if e % ec:
        messages = jnp.pad(messages, ((0, ec - e % ec), (0, 0)))
    sender3d = sender_tab.reshape(-1, 1, ec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.num_work,),
        in_specs=[
            pl.BlockSpec((1, 1, ec), lambda w, a, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, f), lambda w, a, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((window, f), lambda w, a, c, fl: (a[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((window, f), jnp.float32)],
    )
    kernel = functools.partial(
        _win_scatter_kernel, edge_chunk=ec, window=window
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (plan.num_windows * window, f), messages.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_work * ec * window * f,
            bytes_accessed=(plan.num_work * ec + plan.num_windows * window)
            * f * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        jnp.asarray(plan.work_win),
        jnp.asarray(plan.work_chunk),
        jnp.asarray(plan.work_flags),
        sender3d,
        messages,
    )


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
