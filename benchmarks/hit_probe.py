"""What bounds the scatter kernel? Decompose per-item cost on REAL TPU.

Four variants share the work-list grid/BlockSpecs of the production
scatter (unweighted, bf16, F=256) and differ only in the kernel body:

- full:    production body (VPU interval compare -> one-hot -> MXU)
- const:   one-hot replaced by a constant ones matrix (no VPU compares;
           measures DMA + MXU + grid overhead)
- stream:  one-hot PRECOMPUTED on host, streamed as a third input
           (trades ~5 VPU passes for RB*EC bf16 bytes of HBM)
- copy:    no compute at all (acc = first RB rows of the chunk; measures
           the pure streaming floor of this grid)

Usage: python benchmarks/hit_probe.py [--rb 128] [--ec 512] [--f 256]
"""

from __future__ import annotations

import argparse
import functools

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_335_586
PEAK_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rb", type=int, default=128)
    ap.add_argument("--ec", type=int, default=512)
    ap.add_argument("--f", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from keras_geometric_tpu.kernels import spmm_pallas as K
    from keras_geometric_tpu.utils.profiling import timed_steps

    n, e, f, rb, ec = ARXIV_NODES, ARXIV_EDGES, args.f, args.rb, args.ec
    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, n, e).astype(np.int32))
    t = K.build_row_tables(recv, n, edge_chunk=ec, row_block=rb)
    nw, nb = t.num_work, t.bounds.shape[0]
    e_pad = ((e + ec - 1) // ec) * ec
    msgs = jnp.asarray(
        rng.standard_normal((e_pad, f)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # Precomputed one-hot per work item (bf16 [W, RB, EC]), built ON
    # DEVICE — a host transfer of ~0.5 GB through the tunnel stalls.
    @jax.jit
    def _build_onehot(bounds, wb, wc):
        lo = bounds[wb][:, 0, :]  # [W, RB]
        hi = bounds[wb][:, 1, :]
        gidx = (wc[:, None] * ec + jnp.arange(ec))[:, None, :]
        return (
            (gidx >= lo[:, :, None]) & (gidx < hi[:, :, None])
        ).astype(jnp.bfloat16)

    onehot = _build_onehot(
        jnp.asarray(t.bounds), jnp.asarray(t.work_block),
        jnp.asarray(t.work_chunk),
    )
    onehot.block_until_ready()

    def body(wb_ref, wc_ref, wf_ref, bounds_ref, msg_ref, *rest, variant):
        if variant == "stream":
            oh_ref, out_ref, acc_ref = rest
        else:
            out_ref, acc_ref = rest
        w = pl.program_id(0)
        base = wc_ref[w] * ec
        msgs_blk = msg_ref[:]
        if variant == "copy":
            contrib = msgs_blk[:rb].astype(jnp.float32)
        else:
            if variant == "full":
                lo_ = bounds_ref[0, 0:1, :].reshape(rb, 1)
                hi_ = bounds_ref[0, 1:2, :].reshape(rb, 1)
                eidx = jax.lax.broadcasted_iota(jnp.int32, (1, ec), 1)
                gidx_ = base + eidx
                hit = jnp.where(
                    (gidx_ >= lo_) & (gidx_ < hi_), 1.0, 0.0
                ).astype(jnp.bfloat16)
            elif variant == "const":
                hit = jnp.full((rb, ec), 1.0, jnp.bfloat16)
            else:  # stream
                hit = oh_ref[0]
            contrib = jax.lax.dot_general(
                hit, msgs_blk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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

    for variant in ("full", "const", "stream", "copy"):
        in_specs = [
            pl.BlockSpec((1, 2, rb), lambda w, b, c, fl: (b[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, f), lambda w, b, c, fl: (c[w], 0),
                         memory_space=pltpu.VMEM),
        ]
        arrays = [jnp.asarray(t.bounds), msgs]
        if variant == "stream":
            in_specs.append(
                pl.BlockSpec((1, rb, ec), lambda w, b, c, fl: (w, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            arrays.append(onehot)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nw,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rb, f), lambda w, b, c, fl: (b[w], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rb, f), jnp.float32)],
        )
        fn = jax.jit(lambda m, arrays=arrays, grid_spec=grid_spec,
                     variant=variant: pl.pallas_call(
            functools.partial(body, variant=variant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * rb, f), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * nw * ec * rb * f,
                bytes_accessed=(nw * ec + nb * rb) * f * 2,
                transcendentals=0,
            ),
        )(jnp.asarray(t.work_block), jnp.asarray(t.work_chunk),
          jnp.asarray(t.work_first), *([m if a is msgs else a
                                        for a in arrays])))
        try:
            sec = timed_steps(lambda: fn(msgs), k_lo=2, k_hi=10)
        except Exception as exc:  # noqa: BLE001
            print(f"{variant:7s}: FAIL {type(exc).__name__}: {exc}")
            continue
        stream_by = (nw * ec + nb * rb) * f * 2
        if variant == "stream":
            stream_by += nw * rb * ec * 2
        print(
            f"{variant:7s} rb={rb} ec={ec} F={f}: {sec*1e3:7.3f} ms | "
            f"{stream_by/sec/1e9:6.1f} GB/s | {sec/nw*1e6:5.2f} us/item "
            f"({nw} items)"
        )


if __name__ == "__main__":
    main()
