"""TPU compile-smoke harness: Mosaic-compile every Pallas kernel variant.

Round 1 shipped a kernel that passed the whole (interpret-mode) test suite
and then failed Mosaic compilation on hardware (BENCH_r01: 1-row bf16 DMA
slice, 8-sublane alignment). Interpret mode executes kernel *semantics*
but skips Mosaic lowering entirely — this harness closes that gap: it
jit-lowers AND compiles (no timing, optional execution) every kernel
variant on the real chip at production tile geometries.

Run before every commit that touches kernels/ or ops/csr.py:

    python tools/tpu_smoke.py            # compile-only, all variants
    python tools/tpu_smoke.py --exec     # also execute + allclose vs XLA
    python tools/tpu_smoke.py --filter scatter   # substring filter

Exit code 0 = every variant compiled (and, with --exec, matched XLA).
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import numpy as np


def _make_graph(n=4096, e=40_000, seed=0):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, n, e).astype(np.int32))
    send = rng.integers(0, n, e).astype(np.int32)
    return send, recv


def build_cases(jnp, K, SM, csr):
    """Yield (name, fn, args, ref_fn|None) compile cases."""
    import jax

    n, e = 4096, 40_960
    send, recv = _make_graph(n, e)
    w_np = np.random.default_rng(1).random(e).astype(np.float32)

    # Production tile geometries (bench uses scatter 256/1024, expand
    # 128/1024) plus the small-graph default 128/512.
    geoms = [(256, 1024), (128, 512)]
    cases = []

    for rb, ec in geoms:
        t = K.build_row_tables(recv, n, edge_chunk=ec, row_block=rb)
        for dt, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            msgs = jnp.asarray(
                np.random.default_rng(2).standard_normal((e, 256)), dtype=dt
            )
            rows = jnp.asarray(
                np.random.default_rng(3).standard_normal((n, 256)), dtype=dt
            )
            w = jnp.asarray(w_np, dtype=dt)
            recv_j = jnp.asarray(recv)
            prec = "split2" if dt == jnp.float32 else jax.lax.Precision.DEFAULT

            def ref_scatter(m=msgs, wt=None):
                mm = m.astype(jnp.float32)
                if wt is not None:
                    mm = mm * wt.astype(jnp.float32)[:, None]
                return jax.ops.segment_sum(mm, recv_j, n).astype(m.dtype)

            for mode in ("work", "block"):
                for weighted in (False, True):
                    nm = f"scatter/{mode}/{dname}/rb{rb}ec{ec}" + (
                        "/weighted" if weighted else ""
                    )
                    wt = w if weighted else None
                    cases.append((
                        nm,
                        (lambda m, t=t, wt=wt, mode=mode, prec=prec:
                         K.scatter_sum_sorted(
                             m, recv_j, n, tables=t, weights=wt,
                             precision=prec, mode=mode)),
                        (msgs,),
                        (lambda m, wt=wt: ref_scatter(m, wt)),
                    ))
            for weighted in (False, True):
                nm = f"expand/{dname}/rb{rb}ec{ec}" + (
                    "/weighted" if weighted else ""
                )
                wt = w if weighted else None
                cases.append((
                    nm,
                    (lambda r, t=t, wt=wt, prec=prec: K.expand_sorted(
                        r, recv_j, e, tables=t, weights=wt, precision=prec)),
                    (rows,),
                    (lambda r, wt=wt: (
                        jnp.take(r, recv_j, axis=0)
                        * (1 if wt is None
                           else wt.astype(jnp.float32)[:, None])
                    ).astype(r.dtype)),
                ))

        # Scatter VJP (expand under the hood) + block-mode backward.
        msgs32 = jnp.asarray(
            np.random.default_rng(4).standard_normal((e, 256)), jnp.float32
        )
        for mode in ("work", "block"):
            cases.append((
                f"scatter_grad/{mode}/f32/rb{rb}ec{ec}/weighted",
                (lambda m, t=t, mode=mode: jax.grad(
                    lambda mm: jnp.sum(K.scatter_sum_sorted(
                        mm, recv_j, n, tables=t, weights=jnp.asarray(w_np),
                        mode=mode) ** 2))(m)),
                (msgs32,),
                (lambda m: jax.grad(
                    lambda mm: jnp.sum(jax.ops.segment_sum(
                        mm * jnp.asarray(w_np)[:, None], recv_j, n) ** 2)
                )(m)),
            ))

        # segment_max + fused softmax (4 heads).
        scores = jnp.asarray(
            np.random.default_rng(5).standard_normal((e, 4)), jnp.float32
        )
        cases.append((
            f"segment_max/rb{rb}ec{ec}",
            (lambda s, t=t: K.segment_max_sorted(s, recv_j, n, tables=t)),
            (scores,),
            None,
        ))
        cases.append((
            f"softmax_stats/rb{rb}ec{ec}",
            (lambda s, t=t: SM.softmax_stats_sorted(s, n, tables=t)),
            (scores,),
            None,
        ))

        def _softmax_full(s, t=t):
            m, l = SM.softmax_stats_sorted(s, n, tables=t)
            return SM.softmax_apply_sorted(s, m, l, tables=t)

        def _softmax_ref(s):
            mx = jax.ops.segment_max(s, recv_j, n)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            ex = jnp.exp(s - mx[recv_j])
            den = jax.ops.segment_sum(ex, recv_j, n)[recv_j] + 1e-10
            return ex / den

        cases.append((
            f"softmax_full/rb{rb}ec{ec}", _softmax_full, (scores,),
            _softmax_ref,
        ))

    # GraphContext end-to-end ops at production geometry: spmm (symmetric
    # + general) fwd+bwd, edge_softmax grad, fused attend fwd+bwd.
    half = e // 2
    ei = np.stack([
        np.concatenate([send[:half], recv[:half]]),
        np.concatenate([recv[:half], send[:half]]),
    ])
    ctx_sym = csr.prepare_graph(
        ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
        densify_self_loops=True, pad_nodes=True,
    )
    ctx_dir = csr.prepare_graph(
        np.stack([send, recv]), n, add_self_loops=True, gcn_normalize=True,
    )
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal(
            (ctx_sym.num_nodes, 256)), jnp.bfloat16
    )
    ctx_sym = ctx_sym._replace(
        edge_weight=ctx_sym.edge_weight.astype(jnp.bfloat16),
        self_weight=ctx_sym.self_weight.astype(jnp.bfloat16),
    )
    cases.append((
        "spmm_symmetric/bf16/fwd+bwd",
        (lambda h: jax.grad(
            lambda hh: jnp.sum(ctx_sym.spmm(hh).astype(jnp.float32) ** 2)
        )(h)),
        (x,),
        None,
    ))
    xd = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 256)), jnp.bfloat16
    )
    cases.append((
        "spmm_general/bf16/fwd+bwd",
        (lambda h: jax.grad(
            lambda hh: jnp.sum(ctx_dir.spmm(hh).astype(jnp.float32) ** 2)
        )(h)),
        (xd,),
        None,
    ))
    sc4 = jnp.asarray(
        np.random.default_rng(8).standard_normal(
            (int(ctx_dir.senders.shape[0]), 4)), jnp.float32
    )
    cases.append((
        "edge_softmax_grad",
        (lambda s: jax.grad(
            lambda ss: jnp.sum(ctx_dir.edge_softmax(ss) ** 2))(s)),
        (sc4,),
        None,
    ))
    ht = jnp.asarray(
        np.random.default_rng(9).standard_normal((n, 4 * 64)), jnp.bfloat16
    )
    att = jnp.asarray(
        np.random.default_rng(10).standard_normal((4, 64)), jnp.bfloat16
    )
    drop = jnp.asarray(
        (np.random.default_rng(11).random(
            (int(ctx_dir.senders.shape[0]), 4)) < 0.7) / 0.7,
        jnp.float32,
    )
    for dt, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        hta, atta = ht.astype(dt), att.astype(dt)
        cases.append((
            f"attend/{dname}/fwd+bwd",
            (lambda h, a, _d=dt: jax.grad(
                lambda hh: jnp.sum(
                    ctx_dir.attend(hh, a).astype(jnp.float32) ** 2))(h)),
            (hta, atta),
            None,
        ))
    cases.append((
        "attend/bf16/dropout/fwd+bwd",
        (lambda h, a: jax.grad(
            lambda hh: jnp.sum(
                ctx_dir.attend(hh, a, drop_mask=drop)
                .astype(jnp.float32) ** 2))(h)),
        (ht, att),
        None,
    ))
    for dt, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        htx, attx = ht.astype(dt), att.astype(dt)
        cases.append((
            f"sddmm/{dname}/fwd+bwd",
            (lambda h, a, htx=htx: jax.grad(
                lambda hh, aa: jnp.sum(ctx_dir.sddmm_scores(
                    hh, ctx_dir.gather(hh), aa) ** 2),
                argnums=(0, 1))(h, a)),
            (htx, attx),
            None,
        ))
    # Banded-dense tier (kernels/band_pallas.py): dense-window matmul
    # fwd + VJP, both dtypes, against an XLA dense reference.
    from keras_geometric_tpu.kernels import band_pallas as BP

    n_band = 4096
    rngb = np.random.default_rng(7)
    rb_ = rngb.integers(0, n_band, 30_000)
    sb_ = np.clip(rb_ + rngb.integers(-300, 300, 30_000), 0, n_band - 1)
    wb_ = rngb.random(30_000).astype(np.float32)
    plan, local_b = BP.build_band_plan(sb_, rb_, wb_, n_band, window=1024)
    planT, _ = BP.build_band_plan(rb_, sb_, wb_, n_band, window=1024)
    dense = np.zeros((n_band, n_band), np.float32)
    np.add.at(dense, (rb_[local_b], sb_[local_b]), wb_[local_b])
    for dt, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        xb = jnp.asarray(
            rngb.standard_normal((n_band, 128)), dtype=dt
        )
        dj = jnp.asarray(dense, dtype=dt)
        cases.append((
            f"band/{dname}/fwd",
            (lambda x, p=plan, pT=planT: BP.band_spmm(x, p, pT)),
            (xb,),
            (lambda x, d=dj: jnp.dot(
                d, x, preferred_element_type=jnp.float32
            ).astype(x.dtype)),
        ))
        cases.append((
            f"band/{dname}/fwd+bwd",
            (lambda x, p=plan, pT=planT: jax.grad(
                lambda xx: jnp.sum(
                    BP.band_spmm(xx, p, pT).astype(jnp.float32) ** 2
                ))(x)),
            (xb,),
            None,
        ))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exec", action="store_true", dest="execute",
                    help="also run each case and allclose vs XLA ref")
    ap.add_argument("--filter", default="", help="substring case filter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from keras_geometric_tpu.kernels import softmax_pallas as SM
    from keras_geometric_tpu.kernels import spmm_pallas as K
    from keras_geometric_tpu.ops import csr

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    failures = []
    cases = build_cases(jnp, K, SM, csr)
    for name, fn, xs, ref in cases:
        if args.filter and args.filter not in name:
            continue
        t0 = time.perf_counter()
        try:
            compiled = jax.jit(fn).lower(*xs).compile()
            dt = time.perf_counter() - t0
            status = f"compiled {dt:6.1f}s"
            if args.execute:
                out = jax.device_get(compiled(*xs))
                if ref is not None:
                    expect = jax.device_get(jax.jit(ref)(*xs))
                    for o, r in zip(jax.tree.leaves(out),
                                    jax.tree.leaves(expect)):
                        np.testing.assert_allclose(
                            np.asarray(o, np.float32),
                            np.asarray(r, np.float32),
                            rtol=3e-2, atol=3e-2,
                        )
                    status += "  exec+match"
                else:
                    for leaf in jax.tree.leaves(out):
                        assert np.all(np.isfinite(
                            np.asarray(leaf, np.float32)))
                    status += "  exec+finite"
            print(f"ok   {name:52s} {status}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}")
            traceback.print_exception(exc, limit=3)
            failures.append(name)
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall kernel variants compiled clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
