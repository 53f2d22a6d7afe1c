"""Scatter/expand kernel geometry sweep at ogbn-arxiv scale (REAL TPU).

VERDICT r1 #2: the SpMM is latency-bound (~1.4 us/grid-item fixed cost) at
~10-15% of v5e HBM bandwidth. This sweep measures each kernel IN ISOLATION
across (row_block, edge_chunk, F, mode, nbuf) so geometry choices in
prepare_graph come from data, not folklore.

    python benchmarks/kernel_sweep.py                 # full sweep
    python benchmarks/kernel_sweep.py --f 40          # one feature width
    python benchmarks/kernel_sweep.py --op expand

Prints one line per config: ms/call, effective GB/s, HBM util, us/grid-item.
"""

from __future__ import annotations

import argparse
import functools

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_166_243 + ARXIV_NODES  # + self loops (undensified worst case)
PEAK_BW = 819e9  # v5e HBM bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=None)
    ap.add_argument("--op", default=None, choices=[None, "scatter", "expand"])
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import spmm_pallas as K
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    n, e = ARXIV_NODES, ARXIV_EDGES
    recv = np.sort(rng.integers(0, n, e).astype(np.int32))
    w_np = rng.random(e).astype(np.float32)

    fs = [args.f] if args.f else [40, 128, 256]
    geoms = [
        (128, 512), (128, 1024), (128, 2048),
        (256, 1024), (256, 2048), (256, 4096),
        (512, 2048), (512, 4096),
    ]
    if args.quick:
        geoms = [(128, 1024), (256, 1024), (256, 2048)]

    print(f"# N={n} E={e} bf16; ms/call | eff GB/s | util | us/item")
    for f in fs:
        msgs = jnp.asarray(
            rng.standard_normal((e, f)).astype(np.float32)
        ).astype(jnp.bfloat16)
        rows = jnp.asarray(
            rng.standard_normal((n, f)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(w_np).astype(jnp.bfloat16)
        for rb, ec in geoms:
            t = K.build_row_tables(recv, n, edge_chunk=ec, row_block=rb)
            nw = t.num_work
            nb = t.bounds.shape[0]
            # Effective bytes: every work item streams one [EC, F] chunk
            # (boundary chunks re-read), output written once per block.
            sc_bytes = (nw * ec * f + nb * rb * f) * 2 + nw * ec * 2
            ex_bytes = (nw * ec * f + nw * rb * f) * 2

            if args.op in (None, "scatter"):
                for mode in ("work", "block"):
                    if mode == "block" and f % 128 != 0:
                        continue
                    items = nw if mode == "work" else nb
                    fn = jax.jit(functools.partial(
                        K.scatter_sum_sorted,
                        receivers=jnp.asarray(recv), num_nodes=n, tables=t,
                        weights=w, mode=mode,
                        precision=jax.lax.Precision.DEFAULT,
                    ))
                    try:
                        sec = timed_steps(lambda: fn(msgs), k_lo=2, k_hi=10)
                    except Exception as exc:  # noqa: BLE001
                        print(f"scatter/{mode} F={f:3d} rb={rb} ec={ec}: "
                              f"FAIL {type(exc).__name__}")
                        continue
                    print(
                        f"scatter/{mode:5s} F={f:3d} rb={rb:3d} ec={ec:4d}: "
                        f"{sec*1e3:7.3f} ms | {sc_bytes/sec/1e9:6.1f} GB/s | "
                        f"{sc_bytes/sec/PEAK_BW*100:5.1f}% | "
                        f"{sec/items*1e6:5.2f} us/item ({items})"
                    )
            if args.op in (None, "expand"):
                fn = jax.jit(functools.partial(
                    K.expand_sorted,
                    receivers=jnp.asarray(recv), num_edges=e, tables=t,
                    precision=jax.lax.Precision.DEFAULT,
                ))
                try:
                    sec = timed_steps(lambda: fn(rows), k_lo=2, k_hi=10)
                except Exception as exc:  # noqa: BLE001
                    print(f"expand       F={f:3d} rb={rb} ec={ec}: "
                          f"FAIL {type(exc).__name__}")
                    continue
                print(
                    f"expand       F={f:3d} rb={rb:3d} ec={ec:4d}: "
                    f"{sec*1e3:7.3f} ms | {ex_bytes/sec/1e9:6.1f} GB/s | "
                    f"{ex_bytes/sec/PEAK_BW*100:5.1f}% | "
                    f"{sec/nw*1e6:5.2f} us/item ({nw})"
                )

    # Floor probe: XLA random-row gather (the op with no Pallas analog).
    for f in fs:
        src = jnp.asarray(
            rng.standard_normal((n, f)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        fn = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        sec = timed_steps(lambda: fn(src, idx), k_lo=2, k_hi=10)
        by = 2 * e * f * 2
        print(
            f"xla_take     F={f:3d}              : {sec*1e3:7.3f} ms | "
            f"{by/sec/1e9:6.1f} GB/s | {by/sec/PEAK_BW*100:5.1f}%"
        )


if __name__ == "__main__":
    main()
