"""Pallas TPU kernels for sorted-CSR SpMM: scatter-sum and its transpose.

The framework's hottest ops, hand-scheduled for TPU (reference analog:
``keras.ops.segment_sum``/``ops.take``, aggregators.py:72 /
message_passing.py:195 — executed opaquely by the backend):

- :func:`scatter_sum_sorted` — reduce receiver-sorted ``[E, F]`` edge
  messages into ``[N, F]`` node rows;
- :func:`expand_sorted` — the exact transpose: replicate ``[N, F]`` node
  rows out to ``[E, F]`` sorted edge slots (a *sorted gather*). XLA lowers
  a general gather with runtime sort + unsort passes; for sorted static
  indices this kernel streams both sides sequentially instead.

Shared design (boundary-encoded work-list grid):

- Edges are receiver-sorted. Rows are tiled into ``ROW_BLOCK`` blocks;
  block ``i``'s edges are the contiguous slice
  ``row_ptr[i*RB]:row_ptr[(i+1)*RB]``.
- The host builds a flat **work list**: one item per (row block,
  EDGE_CHUNK-aligned message window intersecting its edge range). The
  Pallas grid walks work items; blocks arrive through *scalar-prefetch-
  driven BlockSpec index_maps*, so the pipeline double-buffers the HBM
  streams automatically, including across block boundaries.
- Neither kernel reads per-edge ids: sortedness means edge ``e`` belongs
  to local row ``r`` iff ``lo[r] <= e < hi[r]`` — two lane-aligned int32
  boundary vectors per block. The indicator compiles to two VPU compares
  and feeds **one MXU matmul** per chunk:
  scatter: ``one_hot[RB, EC] @ messages[EC, F]``;
  expand:  ``one_hot[EC, RB] @ rows[RB, F]``.
  Out-of-range edges match no interval and contribute exactly zero.
- Optional fused per-edge weights arrive as a ``[num_chunks, EC]``
  lane-aligned table (one row per chunk) and scale the streamed chunk in
  VMEM — no separate ``[E, F]`` weighting pass over HBM.
- Consecutive work items sharing an output block accumulate in VMEM
  scratch; the output ref is written once per block (write-only — an RMW
  on a dynamically-indexed out block would deoptimize the pipeline).

HBM traffic: edge array ~once (boundary chunks twice) + node array once —
the speed-of-light for these ops. MXU: ``2*E*ROW_BLOCK*F`` FLOPs each.

Precision: one-hot entries are exact in bf16, so ``"split2"`` (default for
f32 data) reaches full f32 fidelity with two native-rate bf16 passes
(hi/lo split); bf16 data runs a single exact-rate pass.

VJPs: scatter and expand are each other's transposes, so each backward is
the other kernel (with the same tables/weights) — no XLA gather/scatter
appears anywhere in fwd+bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "scatter_sum_sorted",
    "expand_sorted",
    "segment_max_sorted",
    "segment_max_wide_sorted",
    "build_row_tables",
    "RowTables",
]

ROW_BLOCK = 128  # default; per-tables row_block overrides (see build_row_tables)
DEFAULT_EDGE_CHUNK = 512

# Scatter implementation selector. "block" runs one grid step per ROW
# BLOCK with an inner dynamic loop over its edge chunks (manual
# multi-buffered DMA) — ~3x fewer grid steps than the flat work-list
# grid, whose fixed per-item cost (~2µs) dominates at production scale.
# "work" is the original one-item-per-(block, chunk) grid. The global is
# the default only; pass ``mode=`` to the public entry points to select
# per-call (the global is read at trace time, so flipping it after a jit
# cache fill has no effect on cached executables). The KGT_SCATTER_MODE
# env var overrides the default at import time (A/B benchmarking).
SCATTER_MODE = __import__("os").environ.get("KGT_SCATTER_MODE", "work")
SCATTER_NBUF = 4  # in-flight edge-chunk DMA buffers in block mode


class RowTables:
    """Precomputed work-list tables for a sorted receiver array."""

    def __init__(
        self,
        bounds: np.ndarray,
        work_block: np.ndarray,
        work_chunk: np.ndarray,
        work_first: np.ndarray,
        work_cfirst: np.ndarray,
        edge_chunk: int,
        row_block: int = ROW_BLOCK,
    ):
        self.bounds = bounds  # [num_blocks, 2, row_block] int32 (lo, hi)
        self.work_block = work_block  # [W] int32: row-block id of item
        self.work_chunk = work_chunk  # [W] int32: message-chunk index
        # bit0: first item of its row block; bit1: last item of its block.
        self.work_first = work_first  # [W] int32
        # bit0: first item referencing its chunk; bit1: last such item.
        self.work_cfirst = work_cfirst  # [W] int32
        self.edge_chunk = int(edge_chunk)
        self.row_block = int(row_block)

    @property
    def num_work(self) -> int:
        return int(self.work_block.shape[0])


def _tables_from_row_ptr(
    row_ptr: np.ndarray, num_blocks: int, edge_chunk: int, row_block: int
) -> RowTables:
    n_pad = num_blocks * row_block
    lo = row_ptr[:n_pad].reshape(num_blocks, row_block)
    hi = row_ptr[1 : n_pad + 1].reshape(num_blocks, row_block)
    bounds = np.stack([lo, hi], axis=1).astype(np.int32)

    starts = row_ptr[::row_block]  # [num_blocks + 1]
    s = starts[:-1].astype(np.int64)
    t = starts[1:].astype(np.int64)
    # Clamp empty trailing blocks (s == t == E, E % ec == 0) into range —
    # their chunk reference would otherwise index one past the last chunk.
    c0 = np.minimum(s, np.maximum(t - 1, 0)) // edge_chunk
    c1 = np.maximum(np.maximum(t - 1, 0) // edge_chunk, c0)
    counts = (c1 - c0 + 1).astype(np.int64)
    total = int(counts.sum())
    wb = np.repeat(np.arange(num_blocks, dtype=np.int32), counts)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    intra = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    wc = (np.repeat(c0, counts) + intra).astype(np.int32)
    wf = (intra == 0).astype(np.int32) | (
        2 * (intra == np.repeat(counts, counts) - 1).astype(np.int32)
    )
    cfirst = np.ones(total, np.int32)
    cfirst[1:] = (wc[1:] != wc[:-1]).astype(np.int32)
    clast = np.ones(total, np.int32)
    clast[:-1] = (wc[1:] != wc[:-1]).astype(np.int32)
    wcf = cfirst | (2 * clast)
    return RowTables(bounds, wb, wc, wf, wcf, edge_chunk, row_block)


def build_row_tables(
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_chunk: int = DEFAULT_EDGE_CHUNK,
    row_block: int = ROW_BLOCK,
) -> RowTables:
    """Host-side: boundary + work-list tables from sorted receivers.

    ``row_block``/``edge_chunk`` set the kernel tile geometry. Measured at
    ogbn-arxiv scale (v5e, bf16, F=256): scatter is fastest at
    (256, 1024) — fewer boundary-chunk re-reads — while expand prefers
    (128, 1024); the defaults stay (128, 512) for small-graph friendliness
    and prepare_graph picks the measured optima per orientation.
    """
    receivers = np.asarray(receivers)
    num_blocks = -(-num_nodes // row_block)
    n_pad = num_blocks * row_block
    row_ptr = np.searchsorted(
        receivers, np.arange(n_pad + 1), side="left"
    ).astype(np.int64)
    return _tables_from_row_ptr(row_ptr, num_blocks, edge_chunk, row_block)


def _weights_2d(weights: jax.Array, edge_chunk: int) -> jax.Array:
    """Reshape a padded [E] weight vector to the [chunks, 1, EC] kernel
    table (3-D so the per-chunk block equals the trailing array dims —
    Mosaic requires trailing block dims divisible by (8, 128) or exactly
    equal to the array dims)."""
    e = weights.shape[0]
    assert e % edge_chunk == 0, "weights must be chunk-padded"
    return weights.reshape(e // edge_chunk, 1, edge_chunk)


def _dots(one_hot_hit, data, precision, dims):
    """One-hot contraction with the precision policy applied to ``data``."""

    def _dot(a, b, prec):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    if precision == "split2" and data.dtype == jnp.float32:
        one_hot = one_hot_hit.astype(jnp.bfloat16)
        d_hi = data.astype(jnp.bfloat16)
        d_lo = (data - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return _dot(one_hot, d_hi, jax.lax.Precision.DEFAULT) + _dot(
            one_hot, d_lo, jax.lax.Precision.DEFAULT
        )
    prec = jax.lax.Precision.DEFAULT if precision == "split2" else precision
    return _dot(one_hot_hit.astype(data.dtype), data, prec)


# ---------------------------------------------------------------------------
# Scatter kernel: messages [E, F] -> rows [N, F].
# ---------------------------------------------------------------------------


def _scatter_kernel(
    work_block_ref, work_chunk_ref, work_first_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, ROW_BLOCK]
    msg_ref,  # [EC, F]
    *rest,
    precision,
    edge_chunk: int,
    weighted: bool,
):
    if weighted:
        weights_ref, out_ref, acc_ref = rest
    else:
        (out_ref, acc_ref) = rest
        weights_ref = None
    w = pl.program_id(0)
    base = work_chunk_ref[w] * edge_chunk

    # Rows on sublanes, edge ids on lanes: one-hot is MXU-natural [M, K].
    rb = bounds_ref.shape[2]
    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi = bounds_ref[0, 1:2, :].reshape(rb, 1)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)
    gidx = base + eidx  # [1, EC]
    msgs = msg_ref[:]
    inside = (gidx >= lo) & (gidx < hi)
    fold = weighted and not (
        precision == "split2" and msgs.dtype == jnp.float32
    )
    if fold:
        # Fold the per-edge weights INTO the indicator: the select's true
        # operand becomes the broadcast [1, EC] weight row, so weighted
        # costs the same as unweighted. The alternative — scaling the
        # chunk — was 3 full VPU passes over [EC, F] plus a lane->sublane
        # relayout (~0.5 us/item, measured: 4.8 -> 2.7 ms at arxiv
        # scale). Padded slots carry zero weight.
        wrow = weights_ref[0, 0:1, :].astype(jnp.float32)  # [1, EC]
        hit = jnp.where(inside, wrow, 0.0)
    else:
        if weighted:
            # split2 needs the one-hot exact in bf16: scale the messages
            # in f32 instead (the fidelity path; bf16 IO never lands here).
            wcol = (
                weights_ref[0, 0:1, :]
                .astype(jnp.float32).reshape(edge_chunk, 1)
            )
            msgs = (msgs.astype(jnp.float32) * wcol).astype(msgs.dtype)
        hit = jnp.where(inside, 1.0, 0.0)
    contrib = _dots(hit, msgs, precision, ((1,), (0,)))

    flags = work_first_ref[w]
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


def _scatter_impl(
    messages, bounds, wb, wc, wf, num_blocks, precision, edge_chunk,
    weights2d=None, block_tables=None, mode=None,
):
    if mode is None:
        mode = SCATTER_MODE
    # Block mode's manual HBM DMA (tpu.memref_slice) requires the lane
    # dim 128-aligned — unlike BlockSpec-driven streaming, which pads.
    # Non-aligned feature widths (e.g. a 40-class output layer) take the
    # work-list grid.
    if (
        mode == "block"
        and block_tables is not None
        and messages.shape[1] % 128 == 0
    ):
        bc0, bnc = block_tables
        return _scatter_block_impl(
            messages, bounds, bc0, bnc, wb.shape[0], num_blocks, precision,
            edge_chunk, weights2d,
        )
    e, f = messages.shape
    rb = bounds.shape[2]
    num_work = wb.shape[0]
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((edge_chunk, f), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [bounds, messages]
    if weights2d is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, edge_chunk), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(weights2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, f), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, f), jnp.float32)],
    )
    kernel = functools.partial(
        _scatter_kernel, precision=precision, edge_chunk=edge_chunk,
        weighted=weights2d is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * rb, f),
                                       messages.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_work * edge_chunk * rb * f,
            bytes_accessed=(num_work * edge_chunk + num_blocks * rb)
            * f * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(wb, wc, wf, *args)


# ---------------------------------------------------------------------------
# Block-mode scatter: one grid step per ROW BLOCK, inner dynamic loop over
# its edge chunks with manual multi-buffered HBM->VMEM DMA. Same math and
# tables as the work-list grid, but the fixed per-grid-item cost (~2µs of
# Mosaic grid/DMA bookkeeping, the measured floor at ogbn-arxiv scale) is
# paid num_blocks times instead of num_work times (~3x fewer).
# ---------------------------------------------------------------------------


def _block_chunk_tables(tables: RowTables):
    """Per row-block first-chunk index and chunk count (host, cached)."""
    cached = getattr(tables, "_block_chunks", None)
    if cached is not None:
        return cached
    bounds = tables.bounds
    ec = tables.edge_chunk
    start = bounds[:, 0, 0].astype(np.int64)  # first edge of block
    end = bounds[:, 1, -1].astype(np.int64)  # one-past-last edge
    # Clamp empty trailing blocks (start == end == E with E % ec == 0)
    # back into range: their chunk DMA would otherwise read past the end
    # of the padded message array. The read is still zero-masked by the
    # bounds check, so any in-range chunk is equally correct.
    c0 = np.minimum(start, np.maximum(end - 1, 0)) // ec
    c1 = np.maximum(np.maximum(end - 1, 0) // ec, c0)
    nc = (c1 - c0 + 1).astype(np.int32)
    out = (c0.astype(np.int32), nc)
    tables._block_chunks = out
    return out


def _scatter_block_kernel(
    c0_ref, nc_ref,  # SMEM scalars: per-block first chunk / chunk count
    bounds_ref,  # [1, 2, RB] VMEM
    msg_hbm,  # [E_pad, F] ANY (manually DMA'd)
    *rest,
    precision,
    edge_chunk: int,
    nbuf: int,
    weighted: bool,
):
    if weighted:
        w_hbm, out_ref, acc_ref, mbuf, wbuf, sem, wsem = rest
    else:
        out_ref, acc_ref, mbuf, sem = rest
        w_hbm = wbuf = wsem = None
    b = pl.program_id(0)
    c0 = c0_ref[b]
    nc = nc_ref[b]
    rb = bounds_ref.shape[2]
    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi = bounds_ref[0, 1:2, :].reshape(rb, 1)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)

    def mdma(slot, i):
        return pltpu.make_async_copy(
            msg_hbm.at[pl.ds((c0 + i) * edge_chunk, edge_chunk), :],
            mbuf.at[slot],
            sem.at[slot],
        )

    def wdma(slot, i):
        # Mosaic requires HBM slice shapes 8-sublane-aligned (the round-1
        # BENCH failure was a 1-row bf16 slice here): DMA the enclosing
        # 8-row-aligned window of the (row-padded) weight table and select
        # the wanted row in VMEM.
        base = pl.multiple_of(((c0 + i) // 8) * 8, 8)
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(base, 8), :], wbuf.at[slot], wsem.at[slot]
        )

    # Warm-up: fill the pipeline nbuf deep (static unroll, masked by nc).
    for j in range(nbuf):
        @pl.when(j < nc)
        def _(j=j):
            mdma(j, j).start()
            if weighted:
                wdma(j, j).start()

    def body(i, _):
        slot = jax.lax.rem(i, nbuf)
        mdma(slot, i).wait()
        msgs = mbuf[slot]
        gidx = (c0 + i) * edge_chunk + eidx  # [1, EC]
        inside = (gidx >= lo) & (gidx < hi)
        if weighted:
            wdma(slot, i).wait()
            # Select row (c0+i) % 8 of the aligned [8, EC] window with a
            # sublane-iota compare + reduce (a dynamic 1-sublane VMEM
            # slice would hit the same Mosaic alignment rule as the DMA).
            row = jax.lax.rem(c0 + i, 8)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (8, edge_chunk), 0)
            wsel = jnp.where(
                ridx == row, wbuf[slot].astype(jnp.float32), 0.0
            )
            wrow = jnp.sum(wsel, axis=0, keepdims=True)  # [1, EC]
            if not (precision == "split2" and msgs.dtype == jnp.float32):
                # Fold weights into the indicator (see _scatter_kernel).
                hit = jnp.where(inside, wrow, 0.0)
            else:
                msgs = (
                    msgs.astype(jnp.float32) * wrow.reshape(edge_chunk, 1)
                ).astype(msgs.dtype)
                hit = jnp.where(inside, 1.0, 0.0)
        else:
            hit = jnp.where(inside, 1.0, 0.0)
        contrib = _dots(hit, msgs, precision, ((1,), (0,)))

        @pl.when(i == 0)
        def _():
            acc_ref[:] = contrib

        @pl.when(i > 0)
        def _():
            acc_ref[:] += contrib

        # Reuse the slot for chunk i+nbuf now that its data is consumed.
        @pl.when(i + nbuf < nc)
        def _():
            mdma(slot, i + nbuf).start()
            if weighted:
                wdma(slot, i + nbuf).start()

        return 0

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _scatter_block_impl(
    messages, bounds, bc0, bnc, num_work, num_blocks, precision, edge_chunk,
    weights2d=None,
):
    e_pad, f = messages.shape
    rb = bounds.shape[2]
    weighted = weights2d is not None
    nbuf = SCATTER_NBUF
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda b, c, n: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [bounds, messages]
    scratch = [
        pltpu.VMEM((rb, f), jnp.float32),
        pltpu.VMEM((nbuf, edge_chunk, f), messages.dtype),
    ]
    if weighted:
        # [num_chunks, 1, EC] -> [num_chunks_pad8, EC]: rows padded to the
        # 8-sublane DMA grain; the kernel fetches aligned [8, EC] windows.
        nch = weights2d.shape[0]
        wflat = weights2d.reshape(nch, edge_chunk)
        pad8 = (-nch) % 8
        if pad8:
            wflat = jnp.pad(wflat, ((0, pad8), (0, 0)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(wflat)
        scratch.append(pltpu.VMEM((nbuf, 8, edge_chunk), wflat.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((nbuf,)))
    if weighted:
        scratch.append(pltpu.SemaphoreType.DMA((nbuf,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, f), lambda b, c, n: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _scatter_block_kernel, precision=precision, edge_chunk=edge_chunk,
        nbuf=nbuf, weighted=weighted,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * rb, f), messages.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_work * edge_chunk * rb * f,
            bytes_accessed=(num_work * edge_chunk + num_blocks * rb)
            * f * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(bc0, bnc, *args)


# ---------------------------------------------------------------------------
# Expand kernel (transpose): rows [N, F] -> sorted edge slots [E, F].
# ---------------------------------------------------------------------------


def _expand_kernel(
    work_block_ref, work_chunk_ref, work_cfirst_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, ROW_BLOCK]
    rows_ref,  # [ROW_BLOCK, F]
    *rest,
    precision,
    edge_chunk: int,
    weighted: bool,
):
    if weighted:
        weights_ref, out_ref, acc_ref = rest
    else:
        (out_ref, acc_ref) = rest
        weights_ref = None
    w = pl.program_id(0)
    base = work_chunk_ref[w] * edge_chunk

    # Edge ids on sublanes, rows on lanes: one-hot is MXU-natural [EC, RB]
    # with no relayouts at all.
    lo = bounds_ref[0, 0:1, :]  # [1, ROW_BLOCK]
    hi = bounds_ref[0, 1:2, :]
    eidx = jax.lax.broadcasted_iota(jnp.int32, (edge_chunk, 1), 0)
    gidx = base + eidx  # [EC, 1]
    rows = rows_ref[:]
    inside = (gidx >= lo) & (gidx < hi)  # [EC, RB]

    fold = weighted and not (
        precision == "split2" and rows.dtype == jnp.float32
    )
    if fold:
        # Fold weights into the indicator (see _scatter_kernel): one
        # [1, EC] -> [EC, 1] relayout replaces 3 VPU passes over [EC, F].
        wcol = (
            weights_ref[0, 0:1, :].astype(jnp.float32).reshape(edge_chunk, 1)
        )
        hit = jnp.where(inside, wcol, 0.0)
        contrib = _dots(hit, rows, precision, ((1,), (0,)))
    else:
        hit = jnp.where(inside, 1.0, 0.0)
        contrib = _dots(hit, rows, precision, ((1,), (0,)))
        if weighted:
            wcol = (
                weights_ref[0, 0:1, :]
                .astype(jnp.float32).reshape(edge_chunk, 1)
            )
            contrib = (
                contrib.astype(jnp.float32) * wcol
            ).astype(contrib.dtype)

    flags = work_cfirst_ref[w]
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


def _expand_impl(
    rows, bounds, wb, wc, wcf, e_pad, precision, edge_chunk, weights2d=None
):
    n_pad, f = rows.shape
    rb = bounds.shape[2]
    num_work = wb.shape[0]
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, f), lambda w, b, c, fl: (b[w], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [bounds, rows]
    if weights2d is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, edge_chunk), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(weights2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((edge_chunk, f), lambda w, b, c, fl: (c[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((edge_chunk, f), jnp.float32)],
    )
    kernel = functools.partial(
        _expand_kernel, precision=precision, edge_chunk=edge_chunk,
        weighted=weights2d is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, f), rows.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_work * edge_chunk * rb * f,
            bytes_accessed=(num_work * (edge_chunk + rb)) * f
            * rows.dtype.itemsize,
            transcendentals=0,
        ),
    )(wb, wc, wcf, *args)


# ---------------------------------------------------------------------------
# Differentiable wrappers (scatter <-> expand transposes).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _scatter_core(messages, aux, num_nodes, precision, edge_chunk, mode):
    receivers, bounds, wb, wc, wf, wcf, weights2d, bc0, bnc = aux
    num_blocks = bounds.shape[0]
    e = messages.shape[0]
    e_pad = ((e + edge_chunk - 1) // edge_chunk) * edge_chunk
    messages = jnp.pad(messages, ((0, e_pad - e), (0, 0)))
    out = _scatter_impl(
        messages, bounds, wb, wc, wf, num_blocks, precision, edge_chunk,
        weights2d, block_tables=(bc0, bnc), mode=mode,
    )
    return out[:num_nodes]


def _scatter_fwd(messages, aux, num_nodes, precision, edge_chunk, mode):
    return _scatter_core(
        messages, aux, num_nodes, precision, edge_chunk, mode
    ), (aux, messages.shape[0])


def _scatter_bwd(num_nodes, precision, edge_chunk, mode, res, g):
    aux, e = res
    receivers, bounds, wb, wc, wf, wcf, weights2d, _bc0, _bnc = aux
    n_pad = bounds.shape[0] * bounds.shape[2]
    g_pad = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0)))
    e_pad = ((e + edge_chunk - 1) // edge_chunk) * edge_chunk
    dmsg = _expand_impl(
        g_pad, bounds, wb, wc, wcf, e_pad, precision, edge_chunk, weights2d
    )
    return dmsg[:e], None


_scatter_core.defvjp(_scatter_fwd, _scatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _expand_core(rows, aux, num_edges, precision, edge_chunk, mode):
    receivers, bounds, wb, wc, wf, wcf, weights2d, _bc0, _bnc = aux
    n_pad = bounds.shape[0] * bounds.shape[2]
    rows = jnp.pad(rows, ((0, n_pad - rows.shape[0]), (0, 0)))
    e_pad = ((num_edges + edge_chunk - 1) // edge_chunk) * edge_chunk
    out = _expand_impl(
        rows, bounds, wb, wc, wcf, e_pad, precision, edge_chunk, weights2d
    )
    return out[:num_edges]


def _expand_fwd(rows, aux, num_edges, precision, edge_chunk, mode):
    return _expand_core(
        rows, aux, num_edges, precision, edge_chunk, mode
    ), (aux, rows.shape[0])


def _expand_bwd(num_edges, precision, edge_chunk, mode, res, g):
    aux, n = res
    receivers, bounds, wb, wc, wf, wcf, weights2d, bc0, bnc = aux
    e_pad = ((num_edges + edge_chunk - 1) // edge_chunk) * edge_chunk
    g_pad = jnp.pad(g, ((0, e_pad - g.shape[0]), (0, 0)))
    nb = bounds.shape[0]
    drows = _scatter_impl(
        g_pad, bounds, wb, wc, wf, nb, precision, edge_chunk, weights2d,
        block_tables=(bc0, bnc), mode=mode,
    )
    return drows[:n], None


_expand_core.defvjp(_expand_fwd, _expand_bwd)


def _make_aux(receivers, tables, weights, edge_chunk):
    weights2d = None
    if weights is not None:
        e = receivers.shape[0]
        e_pad = ((e + edge_chunk - 1) // edge_chunk) * edge_chunk
        w = jnp.pad(weights, (0, e_pad - e))
        weights2d = _weights_2d(w, edge_chunk)
    if isinstance(tables.bounds, np.ndarray):
        bc0, bnc = _block_chunk_tables(tables)
    else:
        # Traced per-shard tables (inside shard_map): block-mode chunk
        # tables are host-only; callers are routed to the work grid.
        nb = tables.bounds.shape[0]
        bc0 = jnp.zeros((nb,), jnp.int32)
        bnc = jnp.ones((nb,), jnp.int32)
    return (
        receivers.astype(jnp.int32),
        jnp.asarray(tables.bounds),
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        jnp.asarray(tables.work_cfirst),
        weights2d,
        jnp.asarray(bc0),
        jnp.asarray(bnc),
    )


def scatter_sum_sorted(
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    mask: jax.Array | None = None,
    tables: RowTables | None = None,
    precision="split2",
    edge_chunk: int = DEFAULT_EDGE_CHUNK,
    weights: jax.Array | None = None,
    mode: str | None = None,
) -> jax.Array:
    """Sum-reduce receiver-sorted ``[E, F]`` messages into ``[N, F]`` rows.

    ``tables`` (from :func:`build_row_tables`) skips host bucketization —
    required under jit with traced receivers. ``weights`` ([E]) are fused
    into the kernel (messages scaled chunk-wise in VMEM). ``precision``:
    ``"split2"`` (default) = full f32 fidelity from two bf16 passes;
    ``DEFAULT`` = single pass (exact rate for bf16 data). ``mode``
    (``"work"``/``"block"``) selects the grid strategy per call; ``None``
    reads the module default :data:`SCATTER_MODE` at trace time.
    """
    if messages.ndim != 2:
        raise ValueError(f"messages must be [E, F], got {messages.shape}")
    if mask is not None:
        messages = jnp.where(mask[:, None], messages, jnp.zeros_like(messages))
    if tables is None:
        recv_np = np.asarray(jax.device_get(receivers))
        if not np.all(recv_np[1:] >= recv_np[:-1]):
            raise ValueError("receivers must be sorted (receiver-major CSR)")
        tables = build_row_tables(recv_np, num_nodes, edge_chunk=edge_chunk)
    aux = _make_aux(receivers, tables, weights, tables.edge_chunk)
    if mode is None:
        mode = SCATTER_MODE
    if not isinstance(tables.bounds, np.ndarray):
        mode = "work"  # traced tables: no host block-chunk tables
    return _scatter_core(messages, aux, num_nodes, precision,
                         tables.edge_chunk, mode)


def expand_sorted(
    rows: jax.Array,
    receivers: jax.Array,
    num_edges: int | None = None,
    *,
    tables: RowTables | None = None,
    precision="split2",
    edge_chunk: int = DEFAULT_EDGE_CHUNK,
    weights: jax.Array | None = None,
    mode: str | None = None,
) -> jax.Array:
    """Sorted gather: ``out[e] = rows[receivers[e]] (* weights[e])``.

    The transpose of :func:`scatter_sum_sorted`; replaces
    ``jnp.take(rows, receivers)`` for sorted static receivers, streaming
    sequentially instead of XLA's runtime sort/gather/unsort. ``mode``
    selects the scatter grid strategy used by the BACKWARD pass.
    """
    if num_edges is None:
        num_edges = receivers.shape[0]
    num_nodes = rows.shape[0]
    if tables is None:
        recv_np = np.asarray(jax.device_get(receivers))
        if not np.all(recv_np[1:] >= recv_np[:-1]):
            raise ValueError("receivers must be sorted")
        tables = build_row_tables(recv_np, num_nodes, edge_chunk=edge_chunk)
    aux = _make_aux(receivers, tables, weights, tables.edge_chunk)
    if mode is None:
        mode = SCATTER_MODE
    return _expand_core(rows, aux, num_edges, precision, tables.edge_chunk,
                        mode)


# ---------------------------------------------------------------------------
# Segment max over few-column data (attention-score softmax statistics).
# ---------------------------------------------------------------------------


def _segment_max_kernel(
    work_block_ref, work_chunk_ref, work_first_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    scores_ref,  # [K, EC] (transposed: heads on sublanes, edges on lanes)
    out_ref,  # [RB, K]
    acc_ref,  # [RB, K] f32 scratch
    *,
    edge_chunk: int,
):
    w = pl.program_id(0)
    base = work_chunk_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    k = scores_ref.shape[0]

    # Strictly 2-D vector ops (Mosaic rejects 3-D lane<->sublane casts):
    # hit is the scatter kernel's interval indicator; each head's scores
    # sit on one sublane of the transposed input and reduce along lanes.
    lo = bounds_ref[0, 0:1, :].reshape(rb, 1)
    hi = bounds_ref[0, 1:2, :].reshape(rb, 1)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (1, edge_chunk), 1)
    gidx = base + eidx  # [1, EC]
    hit = (gidx >= lo) & (gidx < hi)  # [RB, EC]

    neg = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, k), 1)
    contrib = jnp.full((rb, k), neg, jnp.float32)
    for kk in range(k):  # static unroll over heads (K <= 8)
        s_k = scores_ref[kk : kk + 1, :].astype(jnp.float32)  # [1, EC]
        masked = jnp.where(hit, s_k, neg)  # [RB, EC]
        mx = jnp.max(masked, axis=1, keepdims=True)  # [RB, 1]
        # Place this head's column via lane select (no 1-wide concat).
        contrib = jnp.where(lane == kk, mx, contrib)

    flags = work_first_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], contrib)

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def segment_max_sorted(
    scores: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    tables: RowTables,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment max of ``[E, K]`` scores over sorted receivers -> ``[N, K]``.

    K is small (attention heads). Rows with no (unmasked) edges return
    ``-inf``. The kernel streams the scores ONCE in a transposed ``[K, E]``
    layout (heads on sublanes) and reduces each receiver interval along
    lanes with a 3-D masked max — no XLA segment ops or per-row gathers,
    which at ogbn-arxiv scale cost ~30 ms on [E, 4] data (16-byte rows are
    pure latency for XLA's gather/scatter machinery).

    Reference analog: ``ops.segment_max`` (aggregators.py:108) as used by
    GATv2's ``_softmax_by_target`` (gatv2_conv.py:291-311).
    """
    e, k = scores.shape
    edge_chunk = tables.edge_chunk
    rb = tables.row_block
    if mask is not None:
        scores = jnp.where(
            mask[:, None], scores, jnp.full_like(scores, -jnp.inf)
        )
    e_pad = ((e + edge_chunk - 1) // edge_chunk) * edge_chunk
    st = jnp.pad(
        scores, ((0, e_pad - e), (0, 0)), constant_values=-jnp.inf
    ).T  # [K, E_pad]

    bounds = jnp.asarray(tables.bounds)
    wb = jnp.asarray(tables.work_block)
    wc = jnp.asarray(tables.work_chunk)
    wf = jnp.asarray(tables.work_first)
    num_blocks = tables.bounds.shape[0]
    num_work = tables.num_work

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_work,),
        in_specs=[
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, edge_chunk), lambda w, b, c, fl: (0, c[w]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, k), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, k), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_segment_max_kernel, edge_chunk=edge_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * rb, k), scores.dtype),
        cost_estimate=pl.CostEstimate(
            flops=num_work * edge_chunk * rb * k,
            bytes_accessed=(num_work * edge_chunk * k
                            + num_blocks * rb * k) * 4,
            transcendentals=0,
        ),
    )(wb, wc, wf, bounds, st)
    return out[:num_nodes]


# ---------------------------------------------------------------------------
# Wide-feature segment max (SAGE pooling aggregation) — r5, VERDICT item 6.
#
# segment_max_sorted above unrolls over heads (K <= 8); pooling needs the
# max over WIDE [E, F] messages. Naive masked-max costs RB*EC*F VPU work
# per item; this kernel instead runs a segmented Hillis-Steele MAX-SCAN
# along the edge axis (log2(EC) steps of [EC, F] elementwise work — 25x
# less) and then SELECTS each receiver interval's last position with a
# one-hot MXU contraction, accumulating across chunks by running max.
# The max has no matmul form (not a semiring the MXU speaks), which is
# why this shape differs from every other kernel in this file.
# ---------------------------------------------------------------------------

_NEG_SENTINEL = -1e30  # finite -inf stand-in: one-hot matmuls need 0*x==0


def _segment_max_wide_kernel(
    wb_ref, wc_ref, wf_ref,  # SMEM scalars
    bounds_ref,  # [1, 2, RB]
    msgs_ref,  # [EC, F]
    *rest,
    edge_chunk: int,
    masked: bool,
):
    refs = list(rest)
    valid_ref = refs.pop(0) if masked else None
    out_ref, acc_ref = refs
    w = pl.program_id(0)
    base = wc_ref[w] * edge_chunk
    rb = bounds_ref.shape[2]
    neg = jnp.float32(_NEG_SENTINEL)

    lo_t = bounds_ref[0, 0:1, :]  # [1, RB]
    hi_t = bounds_ref[0, 1:2, :]
    gidx_t = base + jax.lax.broadcasted_iota(
        jnp.int32, (edge_chunk, 1), 0
    )  # [EC, 1]
    onehot_t = jnp.where((gidx_t >= lo_t) & (gidx_t < hi_t), 1.0, 0.0)

    # Distance into the edge's own segment: seg_start selected by the
    # interval one-hot (split2 keeps the int-valued f32 exact).
    # HIGHEST = 3-way bf16 split: reconstructs f32 (24-bit mantissa)
    # EXACTLY for one-hot selection — split2 (16 bits) is not enough
    # for either the int-valued seg_start (E can exceed 2^16) or the
    # value pick below (the backward routes gradient by equality).
    seg_start = _dots(
        onehot_t, lo_t.reshape(rb, 1).astype(jnp.float32),
        jax.lax.Precision.HIGHEST, ((1,), (0,)),
    )  # [EC, 1]
    dist = gidx_t.astype(jnp.float32) - seg_start

    v = msgs_ref[:].astype(jnp.float32)
    if masked:
        v = jnp.where(
            valid_ref[0, 0:1, :].reshape(edge_chunk, 1) > 0, v, neg
        )
    inblk = jnp.sum(onehot_t, axis=1, keepdims=True) > 0.0
    v = jnp.where(inblk, v, neg)

    # Segmented inclusive max-scan (Hillis-Steele): after step 2^k,
    # v[e] = max over [max(seg_start_e, e-2^k+1), e].
    sub_iota = jax.lax.broadcasted_iota(
        jnp.int32, (edge_chunk, 1), 0
    )
    d = 1
    while d < edge_chunk:
        prev = jnp.roll(v, d, axis=0)
        prev = jnp.where(sub_iota < d, neg, prev)
        v = jnp.where(dist >= d, jnp.maximum(v, prev), v)
        d *= 2

    # Each row's chunk-max sits at its interval's last position in this
    # chunk; select it with a one-hot MXU contraction (sentinel values
    # are finite, so 0 * v is an exact 0 — no NaN leak).
    lo_r = lo_t.reshape(rb, 1)
    hi_r = hi_t.reshape(rb, 1)
    eidx = base + jax.lax.broadcasted_iota(
        jnp.int32, (1, edge_chunk), 1
    )  # [1, EC]
    last_pos = jnp.minimum(hi_r, base + edge_chunk) - 1  # [RB, 1]
    # hi > lo excludes EMPTY rows (lo == hi would select edge lo-1,
    # which belongs to some other row's segment).
    has = (lo_r < base + edge_chunk) & (hi_r > base) & (hi_r > lo_r)
    sel = jnp.where((eidx == last_pos) & has, 1.0, 0.0)  # [RB, EC]
    picked = _dots(sel, v, jax.lax.Precision.HIGHEST, ((1,), (0,)))
    picked = jnp.where(has, picked, jnp.full_like(picked, neg))

    flags = wf_ref[w]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = picked

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], picked)

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def segment_max_wide_raw(
    messages: jax.Array,  # [E, F]
    num_nodes: int,
    *,
    tables: RowTables,
    mask: jax.Array | None = None,  # [E] 1/0 validity
) -> jax.Array:
    """Per-receiver max of wide sorted messages -> ``[N, F]`` f32, with
    EMPTY rows at the ``-1e30`` sentinel (callers map to the reference
    empty-segment semantics; ops/segment.segment_max returns 0)."""
    e, f = messages.shape
    ec, rb = tables.edge_chunk, tables.row_block
    nb = tables.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    msgs = jnp.pad(messages, ((0, e_pad - e), (0, 0)))
    masked = mask is not None
    in_specs = [
        pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, f), lambda w, b, c, fl: (c[w], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(tables.bounds), msgs]
    if masked:
        vm = jnp.pad(mask.astype(jnp.float32), (0, e_pad - e))
        in_specs.append(
            pl.BlockSpec((1, 1, ec), lambda w, b, c, fl: (c[w], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(vm.reshape(e_pad // ec, 1, ec))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tables.num_work,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, f), lambda w, b, c, fl: (b[w], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rb, f), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _segment_max_wide_kernel, edge_chunk=ec, masked=masked,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tables.bounds.shape[0] * rb, f), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=tables.num_work * ec * f * 12
            + 2 * tables.num_work * ec * rb * f,
            bytes_accessed=tables.num_work * ec * f
            * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        jnp.asarray(tables.work_block),
        jnp.asarray(tables.work_chunk),
        jnp.asarray(tables.work_first),
        *args,
    )
    del nb
    return out


# Table ARRAYS ride the differentiable `aux` pytree, not nondiff_argnums:
# the distributed path builds RowTables views over TRACED shard arrays
# (parallel/kernel_plan._tables_view), and a traced array inside a
# nondiff operand is stored by custom_vjp beyond the trace — an
# UnexpectedTracerError on the first training step (r5 dryrun). Only the
# static tile geometry (edge_chunk, row_block) stays nondiff — the same
# split parallel/attend_plan.py uses.


def _flat_tables(t: RowTables | None):
    if t is None:
        return None
    return (t.bounds, t.work_block, t.work_chunk, t.work_first,
            t.work_cfirst)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _segment_max_wide(messages, aux, num_nodes, geom, et_geom):
    receivers, mask, t_flat, _et_flat = aux
    del receivers  # backward-only
    tables = RowTables(*t_flat, edge_chunk=geom[0], row_block=geom[1])
    return segment_max_wide_raw(
        messages, num_nodes, tables=tables, mask=mask
    )[:num_nodes]


def _segment_max_wide_fwd(messages, aux, num_nodes, geom, et_geom):
    receivers, mask, t_flat, et_flat = aux
    tables = RowTables(*t_flat, edge_chunk=geom[0], row_block=geom[1])
    raw = segment_max_wide_raw(
        messages, num_nodes, tables=tables, mask=mask
    )
    return raw[:num_nodes], (messages, raw, receivers, mask, t_flat,
                             et_flat)


def _segment_max_wide_bwd(num_nodes, geom, et_geom, res, g):
    """Max subgradient: the cotangent routes to every element equal to
    its segment's max (ties each receive the full gradient — the
    measure-zero case for continuous data; matches where XLA's
    scatter-max transpose sends it). Both expands are block-streamed
    sorted kernels — no random access."""
    messages, raw, receivers, mask, t_flat, et_flat = res
    if et_flat is not None:
        et = RowTables(*et_flat, edge_chunk=et_geom[0],
                       row_block=et_geom[1])
    else:
        et = RowTables(*t_flat, edge_chunk=geom[0], row_block=geom[1])
    e = messages.shape[0]
    # HIGHEST: the argmax routing below matches by EQUALITY, so the
    # expanded maxes must be bit-exact f32 (split2 is 16-bit).
    out_e = expand_sorted(
        raw.astype(jnp.float32), receivers, e, tables=et,
        precision=jax.lax.Precision.HIGHEST,
    )
    g_pad = jnp.pad(
        g.astype(jnp.float32),
        ((0, raw.shape[0] - g.shape[0]), (0, 0)),
    )
    g_e = expand_sorted(g_pad, receivers, e, tables=et)
    is_max = (messages.astype(jnp.float32) == out_e)
    if mask is not None:
        is_max = is_max & (mask > 0)[:, None]
    dmsg = jnp.where(is_max, g_e, 0.0).astype(messages.dtype)
    return dmsg, None


_segment_max_wide.defvjp(_segment_max_wide_fwd, _segment_max_wide_bwd)


def segment_max_wide_sorted(
    messages: jax.Array,  # [E, F] receiver-sorted
    receivers: jax.Array,  # [E] non-decreasing
    num_nodes: int,
    *,
    tables: RowTables,
    exp_tables: RowTables | None = None,
    mask: jax.Array | None = None,  # [E] 1/0
    empty_to_zero: bool = True,
) -> jax.Array:
    """Differentiable per-receiver max of wide sorted messages with the
    reference empty-segment semantics (empty rows -> 0; ops/segment.
    segment_max / aggregators.py:108). Backward: two sorted expands +
    an elementwise argmax-routing — no random access (module comment).
    ``empty_to_zero=False`` keeps empty rows at the ``-1e30`` sentinel
    so partial maxes over SPLIT edge streams (kernel plan loc/rem)
    combine correctly with ``jnp.maximum`` before one final fixup.
    """
    raw = _segment_max_wide(
        messages,
        (receivers, mask, _flat_tables(tables), _flat_tables(exp_tables)),
        num_nodes,
        (tables.edge_chunk, tables.row_block),
        None if exp_tables is None
        else (exp_tables.edge_chunk, exp_tables.row_block),
    )
    if not empty_to_zero:
        return raw
    return jnp.where(
        raw <= _NEG_SENTINEL / 2, jnp.zeros_like(raw), raw
    )
