"""Where do the ~13.7 ms of the post-propagate-first headline step go?

Times each component of the bench.py workload (slope timing, real chip).
Run from the repo root: python benchmarks/residual_probe.py
"""

from __future__ import annotations

import numpy as np

ARXIV_NODES = 169_343
ARXIV_EDGES = 1_166_243
ARXIV_CLASSES = 40


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    half = ARXIV_EDGES // 2
    a = rng.integers(0, ARXIV_NODES, half).astype(np.int32)
    b = rng.integers(0, ARXIV_NODES, half).astype(np.int32)
    ctx = prepare_graph(
        np.stack([np.concatenate([a, b]), np.concatenate([b, a])]),
        ARXIV_NODES,
        add_self_loops=True, gcn_normalize=True, symmetric=True,
        densify_self_loops=True, pad_nodes=True,
    )
    cdt = jnp.bfloat16
    ctx = ctx._replace(
        edge_weight=ctx.edge_weight.astype(cdt),
        self_weight=ctx.self_weight.astype(cdt),
    )
    N = ctx.num_nodes

    def bench(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t = timed_steps(lambda: jfn(*args))
        print(f"{name:40s} {t*1e3:8.3f} ms", flush=True)

    for F in (128, 40):
        hf = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

        def fwd(hf):
            return ctx.spmm(hf.astype(cdt))

        def fwdbwd(hf):
            return jax.grad(
                lambda hh: ctx.spmm(hh).astype(jnp.float32).sum()
            )(hf.astype(cdt))

        bench(f"spmm fwd (intermediate src)   F={F}", fwd, hf)
        bench(f"spmm fwd+bwd                  F={F}", fwdbwd, hf)

    onehot = np.zeros((N, ARXIV_CLASSES), np.float32)
    onehot[np.arange(ARXIV_NODES), rng.integers(0, ARXIV_CLASSES, ARXIV_NODES)] = 1.0
    onehot = jnp.asarray(onehot)
    logits = jnp.asarray(rng.standard_normal((N, ARXIV_CLASSES)).astype(np.float32), cdt)

    def head(z):
        logp = jax.nn.log_softmax(z.astype(jnp.float32))
        return -jnp.sum(logp * onehot) / ARXIV_NODES

    bench("loss head fwd+bwd [N,40]", lambda z: jax.grad(head)(z), logits)

    x = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32))
    W1 = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))

    def l1(x, W1):
        return jax.nn.relu(ctx.spmm(x.astype(cdt)) @ W1.astype(cdt))

    bench("layer1 fwd (spmm128 + matmul + relu)", l1, x, W1)


if __name__ == "__main__":
    main()
