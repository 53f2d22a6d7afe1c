"""Does gather locality pay on TPU? Measure XLA take with banded indices.

Round-3 question (VERDICT item 1): the random sender gather runs at ~27%
effective HBM. Node reordering cannot change the information content of a
uniform-random graph, but on real (community-structured) graphs it makes
senders of receiver-sorted edges *quasi-local*. Before building any new
kernel, measure what locality alone buys the existing XLA take: gather
[E, F] rows whose indices are confined to a sliding window of W rows
around the read cursor, for W from 256 to N (uniform).

Also sweeps the scatter kernel's (row_block, edge_chunk) geometry on the
bench shapes to quantify the boundary-chunk re-read factor's real cost
(VERDICT item 1's second lever).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from keras_geometric_tpu.kernels import spmm_pallas

N = 169_472  # arxiv nodes padded to 256
E = 1_166_243


def timed(fn, *args, iters=(2, 12)):
    out = fn(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))

    def run(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            jax.device_get(
                jnp.sum(out[0] if isinstance(out, tuple) else out)
            )
            best = min(best, time.perf_counter() - t0)
        return best

    k0, k1 = iters
    return (run(k1) - run(k0)) / (k1 - k0)


def banded_indices(rng, e, n, w):
    """Indices uniform within a width-w window sliding over [0, n)."""
    center = (np.arange(e, dtype=np.int64) * n) // e
    off = rng.integers(-w // 2, w // 2, e)
    return ((center + off) % n).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    x128 = jnp.asarray(
        rng.standard_normal((N, 128)).astype(np.float32), dtype=jnp.bfloat16
    )
    x256 = jnp.asarray(
        rng.standard_normal((N, 256)).astype(np.float32), dtype=jnp.bfloat16
    )

    take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    print("== XLA take [E, F] by window width (bf16) ==")
    for w in [256, 1024, 4096, 16384, 65536, N]:
        idx = jnp.asarray(banded_indices(rng, E, N, w))
        t128 = timed(take, x128, idx)
        t256 = timed(take, x256, idx)
        gb128 = 2 * E * 128 * 2 / t128 / 1e9
        gb256 = 2 * E * 256 * 2 / t256 / 1e9
        print(
            f"w={w:>7}: F=128 {t128*1e3:6.2f} ms ({gb128:5.0f} GB/s io)  "
            f"F=256 {t256*1e3:6.2f} ms ({gb256:5.0f} GB/s io)"
        )

    print("== sorted-window take (indices also sorted within window) ==")
    e_trim = (E // 512) * 512
    for w in [1024, 16384]:
        idx = np.sort(
            banded_indices(rng, e_trim, N, w).reshape(-1, 512), axis=1
        ).reshape(-1)
        t128 = timed(take, x128, jnp.asarray(idx))
        print(f"w={w:>7} chunk-sorted: F=128 {t128*1e3:6.2f} ms")

    print("== scatter geometry sweep (bench receivers, F=128/F=40) ==")
    half = E // 2
    a = rng.integers(0, 169_343, half)
    b = rng.integers(0, 169_343, half)
    r = np.sort(np.concatenate([a, b]).astype(np.int32))
    e = len(r)
    for f in (128, 40):
        msgs = jnp.asarray(
            rng.standard_normal((e, f)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        wts = jnp.asarray(rng.random(e).astype(np.float32))
        for rb in (128, 256, 512):
            for ec in (512, 1024, 2048):
                tables = spmm_pallas.build_row_tables(
                    r, N, edge_chunk=ec, row_block=rb
                )
                fn = jax.jit(
                    lambda m, w, t=tables: spmm_pallas.scatter_sum_sorted(
                        m, jnp.asarray(r), N, tables=t, weights=w,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                )
                t = timed(fn, msgs, wts)
                reread = tables.num_work * ec / e - 1  # extra factor
                eff = (e * (1 + reread) + N) * f * 2 / t / 1e9
                print(
                    f"F={f:3d} rb={rb:4d} ec={ec:5d}: {t*1e3:6.2f} ms  "
                    f"work={tables.num_work:5d} reread=x{1+reread:4.2f} "
                    f"({eff:5.0f} GB/s)"
                )


if __name__ == "__main__":
    main()
