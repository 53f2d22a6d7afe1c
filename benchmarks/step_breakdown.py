"""Microbenchmark: where do the ~26ms of the headline GCN step go?

Times each component of the bench.py workload independently on the real
chip (slope timing). Run: python benchmarks/step_breakdown.py
"""

from __future__ import annotations

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_166_243


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int32)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int32)
    senders = np.concatenate([a, b])
    receivers = np.concatenate([b, a])
    ctx = prepare_graph(
        np.stack([senders, receivers]),
        ARXIV_NODES,
        add_self_loops=True,
        gcn_normalize=True,
        symmetric=True,
    )
    ctx = ctx._replace(edge_weight=ctx.edge_weight.astype(jnp.bfloat16))
    E = ctx.senders.shape[0]
    N = ARXIV_NODES

    results = {}

    def bench(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        t = timed_steps(lambda: jfn(*args))
        results[name] = t * 1e3
        print(f"{name:42s} {t*1e3:8.3f} ms", flush=True)

    for F in (256, 128, 40):
        h = jnp.asarray(
            rng.standard_normal((N, F)).astype(np.float32), jnp.bfloat16
        )
        m = jnp.asarray(
            rng.standard_normal((E, F)).astype(np.float32), jnp.bfloat16
        )

        bench(f"take(h, senders)           F={F}", lambda h: jnp.take(h, ctx.senders, axis=0), h)
        bench(f"scatter_weighted           F={F}", lambda m: ctx.scatter_weighted(m), m)
        bench(f"expand (sorted gather)     F={F}", lambda h: ctx.gather_receivers(h), h)
        bench(f"spmm fwd (take+scatter_w)  F={F}", lambda h: ctx.spmm(h), h)
        bench(
            f"spmm fwd+bwd               F={F}",
            lambda h: jax.grad(lambda hh: ctx.spmm(hh).astype(jnp.float32).sum())(h),
            h,
        )

    # Dense matmul anchor
    h = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32), jnp.bfloat16)
    bench("dense XW [N,128]@[128,256]", lambda h, W: h @ W, h, W)

    y = jnp.asarray(rng.integers(0, 40, N).astype(np.int32))
    logits = jnp.asarray(rng.standard_normal((N, 40)).astype(np.float32))
    def loss(logits):
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
    bench("log_softmax loss [N,40]", loss, logits)

    print()
    tot = 2 * (results.get("spmm fwd+bwd               F=256", 0)
               + results.get("spmm fwd+bwd               F=128", 0)) / 2
    print(f"(spmm fwd+bwd F=256 + F=128 = "
          f"{results['spmm fwd+bwd               F=256'] + results['spmm fwd+bwd               F=128']:.2f} ms "
          f"of ~26 ms step)")


if __name__ == "__main__":
    main()
