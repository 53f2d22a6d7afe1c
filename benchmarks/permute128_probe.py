"""r5: is the gather fast path a function of ROW WIDTH (128 lanes)?

Combined cliff data (r4 + r5 send_bwd_probe): 512-byte rows gather fast
only under ~128 MB of source; 640-byte rows are slow even at 108 MB;
256-byte rows measured fast at 86 MB but were never probed ABOVE the
cliff. If 256-byte rows stay fast at 343-686 MB, the attention
backward's [E, 256] permute (686 MB source, pinned ~15.9 ms) can be
restructured as ONE interleaved take over an [2E, 128] layout.
"""

from __future__ import annotations

import numpy as np

N = 169_343
E = 1_343_488  # arxiv e_pad


def main():
    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.utils.profiling import timed_steps

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        jfn(*args).block_until_ready()
        sec = timed_steps(lambda: jfn(*args), k_lo=2, k_hi=8)
        print(f"{name:56s} {sec*1e3:8.2f} ms", flush=True)

    src256 = jnp.asarray(
        rng.standard_normal((E, 256)).astype(np.float32), jnp.bfloat16
    )
    t("permute [E,256] bf16 (686MB src, 512B rows) [r4 ref]",
      lambda s: jnp.take(s, perm, axis=0), src256)

    src128 = jnp.asarray(
        rng.standard_normal((E, 128)).astype(np.float32), jnp.bfloat16
    )
    t("permute [E,128] bf16 (343MB src, 256B rows)",
      lambda s: jnp.take(s, perm, axis=0), src128)

    src128b = jnp.asarray(
        rng.standard_normal((2 * E, 128)).astype(np.float32), jnp.bfloat16
    )
    idx2 = jnp.concatenate([2 * perm, 2 * perm + 1])
    t("interleaved take [2E idx] from [2E,128] (686MB src)",
      lambda s: jnp.take(s, idx2, axis=0), src128b)

    idx_pair = jnp.stack([2 * perm, 2 * perm + 1], axis=1).reshape(-1)
    t("interleaved take paired-order idx (row locality)",
      lambda s: jnp.take(s, idx_pair, axis=0), src128b)

    src64 = jnp.asarray(
        rng.standard_normal((E, 64)).astype(np.float32)
    )
    t("permute [E,64] f32 (343MB src, 256B rows, f32)",
      lambda s: jnp.take(s, perm, axis=0), src64)


if __name__ == "__main__":
    main()
