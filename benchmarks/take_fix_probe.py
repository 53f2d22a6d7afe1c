"""Probe XLA random-gather cost vs source-table width (sender-order
gather for the permutation-free attend backward)."""

from __future__ import annotations

import numpy as np

N, E_HALF = 169_343, 1_166_243 // 2


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.ops.csr import prepare_graph
    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    ei = np.stack([
        rng.integers(0, N, 2 * E_HALF), rng.integers(0, N, 2 * E_HALF)
    ]).astype(np.int32)
    ctx = prepare_graph(ei, N, add_self_loops=True)
    rss = ctx.receivers_ss

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jax.tree_util.tree_leaves(jfn(*args))[0].block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:44s} {sec*1e3:8.2f} ms", flush=True)

    tabs = {}
    for w in (128, 256, 320, 384, 512, 640, 768):
        tabs[w] = jnp.asarray(
            rng.standard_normal((N, w)).astype(np.float32), jnp.bfloat16
        )

    for w in (128, 256, 320, 384, 512, 640, 768):
        t(f"take bf16 [N,{w}]",
          lambda tab: jnp.take(tab, rss, axis=0), tabs[w])

    # split combos for the [g|ht|tail]=640 payload
    t("2 takes: 512 + 128",
      lambda a, b: (jnp.take(a, rss, axis=0), jnp.take(b, rss, axis=0)),
      tabs[512], tabs[128])
    t("2 takes: 384 + 256",
      lambda a, b: (jnp.take(a, rss, axis=0), jnp.take(b, rss, axis=0)),
      tabs[384], tabs[256])
    t("2 takes: 320 + 320",
      lambda a, b: (jnp.take(a, rss, axis=0), jnp.take(b, rss, axis=0)),
      tabs[320], tabs[320])

    # dynamic_slice-free alternative: one-hot matmul gather is O(N*E) —
    # skip. Try take_along_axis formulation instead:
    t("take_along_axis [N,640]",
      lambda tab: jnp.take_along_axis(
          tab, rss[:, None].astype(jnp.int32), axis=0), tabs[640])


if __name__ == "__main__":
    main()
