"""r5: end-to-end GATv2 with the no-score-cache pipeline, ec sweep.

Canary first: a solo take whose r4/r5 baseline is ~4.3 ms — if it reads
3x that, the relay is in its degraded mode and the numbers are void.
"""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    ei = np.stack([
        rng.integers(0, N, 2 * E_HALF), rng.integers(0, N, 2 * E_HALF)
    ]).astype(np.int32)
    d = HEADS * FDIM
    ht = jnp.asarray(
        rng.standard_normal((N, d)).astype(np.float32), jnp.bfloat16
    )
    att = jnp.asarray(
        rng.standard_normal((HEADS, FDIM)).astype(np.float32), jnp.bfloat16
    )

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:52s} {sec*1e3:8.2f} ms", flush=True)
        return sec * 1e3

    idx = jnp.asarray(rng.integers(0, N, 1_343_488).astype(np.int32))
    canary = t("CANARY solo take (baseline ~4.3)",
               lambda a: jnp.take(a, idx, axis=0), ht)
    if canary > 8.0:
        print("DEGRADED RELAY MODE — numbers void", flush=True)

    for ec in (1024, 512):
        ctx = prepare_graph(ei, N, add_self_loops=True, edge_chunk=ec)

        def loss(h, a, c=ctx):
            return jnp.sum(c.attend(h, a) ** 2)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        gfn(ht, att)[0].block_until_ready()
        sec = timed_steps(lambda: gfn(ht, att), k_lo=2, k_hi=8)
        e = ctx.num_edges
        print(f"{'attend fwd+bwd no-cache ec=' + str(ec):52s} "
              f"{sec*1e3:8.2f} ms  ({e/sec/1e6:.1f}M e/s)", flush=True)


if __name__ == "__main__":
    main()
