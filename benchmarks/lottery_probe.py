"""Attack the gather lottery (VERDICT r3 item 1a).

r3 measured XLA's [E, 256] random-row take as allocation-bistable: the
identical program costs 4.3 ms in one process and 15.7 ms in another
(idle chip both times), and each additional distinct-source take in one
program adds ~+10-15 ms. This probe searches for the control knob: run
the SAME take workload under different allocation orders, buffer
donation, XLA flags, and gather formulations — each config in K fresh
subprocesses — and report the per-config distribution.

Usage:
    python benchmarks/lottery_probe.py child <config>   # one measurement
    python benchmarks/lottery_probe.py [K]              # full matrix
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = 169_472  # arxiv nodes padded to 256
E = 1_166_243
F = 256

CONFIGS = [
    # name, env overrides
    ("base", {}),
    ("param_source", {}),  # gather straight from the jit parameter
    ("prealloc_big", {}),  # allocate + free a ~512 MB block first
    ("three_takes_distinct", {}),  # the bench-step shape: 3 sources
    ("three_takes_flags", {"LIBTPU_INIT_ARGS": (
        "--xla_tpu_enable_latency_hiding_scheduler=false")}),
    ("three_takes_nofold", {}),  # sources are true intermediates
    ("three_takes_serial", {}),  # data-dependency-chained takes
    ("warm_then_take", {}),  # tiny chained warm-up gather + big take
    ("sorted_idx", {}),  # same rows, sorted order
    ("at_get", {}),  # x.at[idx].get() formulation
    ("f32_source", {}),  # f32 gather (2x bytes)
]


def child(config: str) -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, E).astype(np.int32)
    if config == "sorted_idx":
        idx_np = np.sort(idx_np)
    idx = jnp.asarray(idx_np)

    def make_x(n=N, f=F):
        return jnp.asarray(
            rng.standard_normal((n, f)).astype(np.float32),
            dtype=jnp.bfloat16,
        )

    if config == "prealloc_big":
        big = jnp.zeros((4096, 65536), jnp.bfloat16)  # ~512 MB
        big.block_until_ready()
        del big

    if config in ("three_takes_distinct", "three_takes_flags",
                  "three_takes_nofold"):
        xs = [make_x(), make_x(), make_x()]
        # *1.0 folds away (sources stay parameter ALIASES); *1.0000001
        # forces a real intermediate buffer per source.
        scale = 1.0000001 if config == "three_takes_nofold" else 1.0

        # Per-edge weights stop XLA from rewriting sum-of-gather into
        # a gather-free histogram contraction.
        w = jnp.asarray(
            rng.standard_normal((E, 1)).astype(np.float32),
            jnp.bfloat16,
        )

        def fn(a, b, c, i):
            return (
                (jnp.take(a * scale, i, axis=0) * w).sum()
                + (jnp.take(b * scale, i, axis=0) * w).sum()
                + (jnp.take(c * scale, i, axis=0) * w).sum()
            )

        if config == "three_takes_serial":
            def fn(a, b, c, i):  # noqa: F811
                t1 = (jnp.take(a * 1.0, i, axis=0) * w).sum()
                # Zero-valued index offset forces t2 to wait for t1:
                # the gathers serialize instead of running concurrently.
                i2 = i + (t1 * 0).astype(jnp.int32)
                t2 = (jnp.take(b * 1.0, i2, axis=0) * w).sum()
                i3 = i + (t2 * 0).astype(jnp.int32)
                return t1 + t2 + (
                    jnp.take(c * 1.0, i3, axis=0) * w
                ).sum()

        jfn = jax.jit(fn)
        args = (*xs, idx)
    else:
        x = make_x() if config != "f32_source" else jnp.asarray(
            rng.standard_normal((N, F)).astype(np.float32)
        )

        if config == "warm_then_take":
            w = jnp.asarray(
                rng.standard_normal((E, 1)).astype(np.float32),
                jnp.bfloat16,
            )

            def fn(x, i):
                xs = x * 1.0
                warm = jnp.take(xs, i[:1024], axis=0).sum()
                i2 = i + (warm * 0).astype(jnp.int32)
                return (jnp.take(xs, i2, axis=0) * w).sum()
        elif config == "param_source":
            def fn(x, i):
                return jnp.take(x, i, axis=0).sum()
        elif config == "at_get":
            def fn(x, i):
                return (x * 1.0).at[i].get().sum()
        else:
            def fn(x, i):
                return jnp.take(x * 1.0, i, axis=0).sum()

        jfn = jax.jit(fn)
        args = (x, idx)

    out = jfn(*args)
    jax.device_get(out)
    def run(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = jfn(*args)
            jax.device_get(o)
            best = min(best, time.perf_counter() - t0)
        return best

    k0, k1 = 2, 10
    per = (run(k1) - run(k0)) / (k1 - k0)
    print(json.dumps({"config": config, "ms": per * 1e3}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    results: dict[str, list[float]] = {}
    for name, env_over in CONFIGS:
        results[name] = []
        for rep in range(k):
            env = dict(os.environ)
            env.update(env_over)
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "child", name],
                    capture_output=True, text=True, env=env, timeout=600,
                )
            except subprocess.TimeoutExpired:
                results[name].append(None)
                print(f"{name:24s} rep{rep}: TIMEOUT", flush=True)
                continue
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                ms = json.loads(line[-1])["ms"]
                results[name].append(round(ms, 2))
            else:
                results[name].append(None)
                sys.stderr.write(p.stderr[-2000:] + "\n")
            print(f"{name:24s} rep{rep}: {results[name][-1]} ms",
                  flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
