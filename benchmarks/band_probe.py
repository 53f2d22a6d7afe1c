"""Banded-dense SpMM vs CSR take+scatter at ogbn-arxiv scale (REAL TPU).

Workload: a community-structured power-law graph (the structure real
citation graphs have; data/datasets/synthetic.community_graph), scrambled,
then recovered with LPA cluster ordering (ops/reorder.py). Compares the
plain CSR context against the band_window context on:

- one spmm forward (F=128, bf16)
- spmm forward+backward
- the full 2-layer GCN train step (bench.py shapes)
"""

from __future__ import annotations

import time

import numpy as np

N = 169_343
E = 1_166_243
F = 128
HIDDEN = 256
CLASSES = 40


def timed(fn, *args, iters=(2, 12)):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.device_get(jnp.sum(jax.tree.leaves(out)[0]))

    def run(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            jax.device_get(jnp.sum(jax.tree.leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    k0, k1 = iters
    return (run(k1) - run(k0)) / (k1 - k0)


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.data.datasets.synthetic import community_graph
    from keras_geometric_tpu.ops import reorder
    from keras_geometric_tpu.ops.csr import prepare_graph

    ei = community_graph(N, E, seed=0)
    s, r = ei[0].astype(np.int64), ei[1].astype(np.int64)
    t0 = time.time()
    order = reorder.cluster_order(s, r, N)
    inv = reorder.invert_order(order)
    s2, r2 = inv[s], inv[r]
    t_order = time.time() - t0
    for w in (512, 1024, 2048):
        cov = reorder.band_coverage(s2, r2, windows=(w,))[w]
        print(f"coverage W={w}: {cov:.3f}")
    print(f"cluster_order: {t_order:.1f}s")

    kw = dict(
        add_self_loops=True, gcn_normalize=True, symmetric=True,
        densify_self_loops=True, pad_nodes=True,
    )
    t0 = time.time()
    ctx_plain = prepare_graph(np.stack([s2, r2]), N, **kw)
    t_plain = time.time() - t0
    t0 = time.time()
    ctx_band = prepare_graph(np.stack([s2, r2]), N, band_window=1024, **kw)
    t_band = time.time() - t0
    print(
        f"prepare plain {t_plain:.1f}s band {t_band:.1f}s; band edges "
        f"{ctx_band.num_band_edges} ({ctx_band.num_band_edges / ctx_band.num_edges:.2%})"
        f" residual {ctx_band.num_real_edges}"
    )

    rng = np.random.default_rng(0)
    for name, ctx in (("plain", ctx_plain), ("band", ctx_band)):
        ctx = ctx._replace(
            edge_weight=ctx.edge_weight.astype(jnp.bfloat16),
            self_weight=ctx.self_weight.astype(jnp.bfloat16),
        )
        if ctx.band is not None:
            ctx = ctx._replace(
                band=ctx.band._replace(
                    band=ctx.band.band.astype(jnp.bfloat16)
                )
            )
        x = jnp.asarray(
            rng.standard_normal((ctx.num_nodes, F)).astype(np.float32)
        )

        # The band array (~350 MB) must be a jit ARGUMENT: closure
        # constants are serialized into the compile payload (the tunneled
        # remote-compile service rejects them at this size), and constants
        # also bloat every executable.
        band_arr = None if ctx.band is None else ctx.band.band

        def with_band(c, b):
            return c if b is None else c._replace(band=c.band._replace(band=b))

        fwd = jax.jit(
            lambda h, b, c=ctx: with_band(c, b).spmm(h.astype(jnp.bfloat16))
        )
        t_f = timed(fwd, x, band_arr)
        grad = jax.jit(
            jax.grad(
                lambda h, b, c=ctx: jnp.sum(
                    with_band(c, b).spmm(h.astype(jnp.bfloat16))
                    .astype(jnp.float32) ** 2
                )
            )
        )
        t_g = timed(grad, x, band_arr)
        eps = ctx.num_edges
        print(
            f"{name}: spmm fwd {t_f*1e3:6.2f} ms ({eps/t_f/1e6:6.1f}M e/s)"
            f"  fwd+bwd {t_g*1e3:6.2f} ms ({eps/t_g/1e6:6.1f}M e/s)"
        )


if __name__ == "__main__":
    main()
