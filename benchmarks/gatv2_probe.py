"""Decompose GATv2 arxiv cost: fused attend vs non-fused context path.

perf_suite r2 measured the fused-attend fwd+bwd at 155 ms (r1's
non-fused path: 100.5 ms) — this probe isolates where it goes.
"""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2
HEADS, FDIM = 4, 64


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu import GATv2Conv
    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    ei = np.stack([
        rng.integers(0, N, 2 * E_HALF), rng.integers(0, N, 2 * E_HALF)
    ]).astype(np.int32)
    ctx = prepare_graph(ei, N, add_self_loops=True)
    e_pad = int(ctx.senders.shape[0])

    ht = jnp.asarray(
        rng.standard_normal((N, HEADS * FDIM)).astype(np.float32),
        jnp.bfloat16,
    )
    att = jnp.asarray(
        rng.standard_normal((HEADS, FDIM)).astype(np.float32), jnp.bfloat16
    )
    scores = jnp.asarray(
        rng.standard_normal((e_pad, HEADS)).astype(np.float32)
    )

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:44s} {sec*1e3:8.2f} ms", flush=True)

    t("attend fwd", lambda h, a: ctx.attend(h, a), ht, att)
    t("attend fwd+bwd (d ht, att)",
      lambda h, a: jax.grad(
          lambda hh, aa: jnp.sum(ctx.attend(hh, aa).astype(jnp.float32) ** 2),
          argnums=(0, 1))(h, a),
      ht, att)
    t("edge_softmax fwd [E,4]", lambda s: ctx.edge_softmax(s), scores)
    t("edge_softmax fwd+bwd",
      lambda s: jax.grad(lambda ss: jnp.sum(ctx.edge_softmax(ss) ** 2))(s),
      scores)
    t("gather ht (take [E,256])",
      lambda h: jnp.take(h, ctx.senders, axis=0), ht)
    t("expand ht (gather_receivers)",
      lambda h: ctx.gather_receivers(h), ht)
    t("scatter [E,256]",
      lambda m: ctx.scatter(m),
      jnp.zeros((e_pad, HEADS * FDIM), jnp.bfloat16))
    t("perm take [E,4] (alpha reorder)",
      lambda s: jnp.take(s, ctx.bwd_perm, axis=0), scores)
    t("perm take [E,256] (edge reorder)",
      lambda m: jnp.take(m, ctx.bwd_perm, axis=0),
      jnp.zeros((e_pad, HEADS * FDIM), jnp.bfloat16))

    # Non-fused context path (edge_softmax + separate scatter), fwd+bwd.
    layer = GATv2Conv(output_dim=FDIM, heads=HEADS, add_self_loops=False)
    layer_fused = GATv2Conv(output_dim=FDIM, heads=HEADS,
                            add_self_loops=False, fused_attend=True)
    params = layer.init(jax.random.PRNGKey(0), HEADS * FDIM)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params
    )
    x = jnp.asarray(
        rng.standard_normal((N, HEADS * FDIM)).astype(np.float32),
        jnp.bfloat16,
    )

    def loss_fused(p, xx):
        return jnp.sum(
            layer_fused.apply(p, xx, context=ctx).astype(jnp.float32) ** 2
        )

    def loss_nonfused(p, xx):
        out, _ = layer.apply(
            p, xx, context=ctx, return_attention=True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    t("layer fused fwd+bwd", lambda p, xx: jax.grad(loss_fused)(p, xx),
      params, x)
    t("layer NON-fused fwd+bwd",
      lambda p, xx: jax.grad(loss_nonfused)(p, xx), params, x)


if __name__ == "__main__":
    main()
