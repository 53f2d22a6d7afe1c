"""Pallas SpMM kernel tests (interpret mode on CPU; allclose vs XLA).

Mirrors SURVEY.md §7.2 step 3: every Pallas kernel ships with an
XLA-composed fallback and an allclose test against it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.kernels import spmm_pallas as K


def _case(n, e, f, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # Power-law-ish receivers: hub rows exercise multi-chunk blocks.
        raw = np.minimum(
            (rng.pareto(1.0, e) * 3).astype(np.int64), n - 1
        )
        recv = np.sort(raw).astype(np.int32)
    else:
        recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msgs = rng.standard_normal((e, f)).astype(np.float32)
    return msgs, recv


@pytest.mark.parametrize(
    "n,e,f,skew",
    [
        (300, 2000, 64, False),
        (128, 512, 128, False),  # exactly one block
        (1000, 100, 32, False),  # sparse: most blocks empty
        (50, 5000, 8, True),  # hubs: blocks spanning many chunks
        (257, 1000, 256, False),  # non-multiple of ROW_BLOCK
    ],
)
def test_forward_matches_xla(n, e, f, skew):
    msgs, recv = _case(n, e, f, skew=skew)
    ref = jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(recv), n)
    with pltpu.force_tpu_interpret_mode():
        out = K.scatter_sum_sorted(jnp.asarray(msgs), jnp.asarray(recv), n)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_tables_path_matches():
    msgs, recv = _case(300, 2000, 64)
    t = K.build_row_tables(recv, 300)
    ref = jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(recv), 300)
    with pltpu.force_tpu_interpret_mode():
        out = K.scatter_sum_sorted(
            jnp.asarray(msgs), jnp.asarray(recv), 300, tables=t
        )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_mask_zeroes_padded_edges():
    msgs, recv = _case(100, 600, 16)
    mask = np.arange(600) < 500
    ref = jax.ops.segment_sum(
        jnp.asarray(msgs[:500]), jnp.asarray(recv[:500]), 100
    )
    with pltpu.force_tpu_interpret_mode():
        out = K.scatter_sum_sorted(
            jnp.asarray(msgs), jnp.asarray(recv), 100, mask=jnp.asarray(mask)
        )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_backward_matches_xla():
    msgs, recv = _case(200, 1500, 32)
    t = K.build_row_tables(recv, 200)

    def loss_pallas(m):
        return jnp.sum(
            K.scatter_sum_sorted(m, jnp.asarray(recv), 200, tables=t) ** 2
        )

    def loss_xla(m):
        return jnp.sum(jax.ops.segment_sum(m, jnp.asarray(recv), 200) ** 2)

    # The backward pass now also runs a Pallas kernel (sorted expand), so
    # the whole grad evaluation sits inside interpret mode.
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_pallas)(jnp.asarray(msgs))
    gref = jax.grad(loss_xla)(jnp.asarray(msgs))
    np.testing.assert_allclose(g, gref, rtol=1e-4, atol=1e-4)


class TestScatterModes:
    """Block-mode vs work-mode parity (ADVICE r1: the block kernel shipped
    untested and failed Mosaic compile at HEAD). Interpret mode checks the
    semantics; tools/tpu_smoke.py compiles every variant on hardware."""

    @pytest.mark.parametrize("weighted", [False, True])
    @pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
    def test_block_matches_work(self, weighted, dtype):
        msgs, recv = _case(300, 2000, 64, skew=True)
        if dtype == "bfloat16":
            msgs = jnp.asarray(msgs).astype(jnp.bfloat16)
        else:
            msgs = jnp.asarray(msgs)
        t = K.build_row_tables(recv, 300)
        w = None
        if weighted:
            w = jnp.asarray(
                np.random.default_rng(1).random(2000).astype(np.float32)
            )
            if dtype == "bfloat16":
                w = w.astype(jnp.bfloat16)
        kw = dict(tables=t, weights=w)
        with pltpu.force_tpu_interpret_mode():
            a = K.scatter_sum_sorted(msgs, jnp.asarray(recv), 300,
                                     mode="work", **kw)
            b = K.scatter_sum_sorted(msgs, jnp.asarray(recv), 300,
                                     mode="block", **kw)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2 if dtype == "bfloat16" else 1e-5, atol=1e-4,
        )

    @pytest.mark.parametrize("weighted", [False, True])
    def test_block_grad_matches_work(self, weighted):
        msgs, recv = _case(200, 1500, 32)
        t = K.build_row_tables(recv, 200)
        w = jnp.asarray(
            np.random.default_rng(2).random(1500).astype(np.float32)
        ) if weighted else None

        def loss(m, mode):
            out = K.scatter_sum_sorted(
                m, jnp.asarray(recv), 200, tables=t, weights=w, mode=mode
            )
            return jnp.sum(out ** 2)

        with pltpu.force_tpu_interpret_mode():
            ga = jax.grad(lambda m: loss(m, "work"))(jnp.asarray(msgs))
            gb = jax.grad(lambda m: loss(m, "block"))(jnp.asarray(msgs))
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)

    def test_block_trailing_empty_blocks(self):
        # E an exact multiple of edge_chunk AND trailing receivers empty:
        # the un-clamped chunk table DMA'd past the end of the messages
        # array (ADVICE r1 medium; work-mode tables had the same OOB).
        # F=128 so block mode actually runs (narrower F falls back).
        e, n, f = 512, 1024, 128
        rng = np.random.default_rng(3)
        recv = np.sort(rng.integers(0, 40, e).astype(np.int32))
        msgs = rng.standard_normal((e, f)).astype(np.float32)
        t = K.build_row_tables(recv, n, edge_chunk=512, row_block=128)
        ref = jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(recv), n)
        bc0, bnc = K._block_chunk_tables(t)
        assert int(bc0.max()) * 512 < e, "chunk table points out of range"
        with pltpu.force_tpu_interpret_mode():
            out = K.scatter_sum_sorted(
                jnp.asarray(msgs), jnp.asarray(recv), n, tables=t,
                mode="block",
            )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_block_weighted_unaligned_chunk_rows(self):
        # num_chunks not a multiple of 8: exercises the row-padded weight
        # table and the aligned-window row select.
        e, n, f = 3 * 256, 300, 16
        rng = np.random.default_rng(4)
        recv = np.sort(rng.integers(0, n, e).astype(np.int32))
        msgs = rng.standard_normal((e, f)).astype(np.float32)
        w = rng.random(e).astype(np.float32)
        t = K.build_row_tables(recv, n, edge_chunk=256, row_block=128)
        ref = jax.ops.segment_sum(
            jnp.asarray(msgs * w[:, None]), jnp.asarray(recv), n
        )
        with pltpu.force_tpu_interpret_mode():
            out = K.scatter_sum_sorted(
                jnp.asarray(msgs), jnp.asarray(recv), n, tables=t,
                weights=jnp.asarray(w), mode="block",
            )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_unsorted_receivers_rejected():
    msgs = jnp.ones((4, 8))
    recv = jnp.asarray(np.array([3, 1, 2, 0], np.int32))
    with pytest.raises(ValueError, match="sorted"):
        K.scatter_sum_sorted(msgs, recv, 4)


class TestSegmentMaxSorted:
    def test_matches_reference(self):
        rng = np.random.default_rng(5)
        n, e, k = 120, 700, 4
        recv = np.sort(rng.integers(0, n, e).astype(np.int32))
        t = K.build_row_tables(recv, n, edge_chunk=256, row_block=128)
        s = jnp.asarray(rng.standard_normal((e, k)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            m = K.segment_max_sorted(s, jnp.asarray(recv), n, tables=t)
        ref = np.full((n, k), -np.inf, np.float32)
        for i, r in enumerate(recv):
            ref[r] = np.maximum(ref[r], np.asarray(s)[i])
        got = np.asarray(m)
        assert np.all(np.isinf(ref) == np.isinf(got))
        finite = ~np.isinf(ref)
        np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-6)

    def test_masked(self):
        rng = np.random.default_rng(6)
        n, e, k = 50, 300, 2
        recv = np.sort(rng.integers(0, n, e).astype(np.int32))
        t = K.build_row_tables(recv, n, edge_chunk=256, row_block=128)
        s = jnp.asarray(rng.standard_normal((e, k)).astype(np.float32))
        mask = jnp.asarray(rng.random(e) > 0.3)
        with pltpu.force_tpu_interpret_mode():
            m = K.segment_max_sorted(
                s, jnp.asarray(recv), n, tables=t, mask=mask
            )
        ref = np.full((n, k), -np.inf, np.float32)
        for i, r in enumerate(recv):
            if bool(mask[i]):
                ref[r] = np.maximum(ref[r], np.asarray(s)[i])
        got = np.asarray(m)
        assert np.all(np.isinf(ref) == np.isinf(got))
        finite = ~np.isinf(ref)
        np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-6)


class TestSegmentMaxWide:
    """r5 (VERDICT r4 item 6): wide-feature segmented max-scan kernel
    vs ops/segment.segment_max, values and gradients."""

    @pytest.mark.parametrize(
        "n,e,f,skew",
        [
            (300, 2000, 64, False),
            (50, 5000, 16, True),   # hubs: segments spanning chunks
            (1000, 100, 32, False),  # many empty rows
            (257, 1000, 128, False),
        ],
    )
    def test_matches_xla(self, n, e, f, skew):
        from keras_geometric_tpu.ops.segment import segment_max

        msgs, recv = _case(n, e, f, seed=3, skew=skew)
        mask = (np.random.default_rng(4).random(e) > 0.1)
        tables = K.build_row_tables(recv, n, edge_chunk=256, row_block=64)
        ref = segment_max(
            jnp.asarray(msgs), jnp.asarray(recv), n,
            mask=jnp.asarray(mask), indices_are_sorted=True,
        )
        with pltpu.force_tpu_interpret_mode():
            out = K.segment_max_wide_sorted(
                jnp.asarray(msgs), jnp.asarray(recv), n, tables=tables,
                mask=jnp.asarray(mask.astype(np.float32)),
            )
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_gradients_match_xla(self):
        from keras_geometric_tpu.ops.segment import segment_max

        n, e, f = 120, 900, 32
        msgs, recv = _case(n, e, f, seed=7)
        mask = np.ones(e, bool)
        tables = K.build_row_tables(recv, n, edge_chunk=128, row_block=32)
        w = np.random.default_rng(8).standard_normal((n, f)).astype(
            np.float32
        )

        def loss_k(m):
            out = K.segment_max_wide_sorted(
                m, jnp.asarray(recv), n, tables=tables,
                mask=jnp.asarray(mask.astype(np.float32)),
            )
            return jnp.sum(out * w)

        def loss_ref(m):
            return jnp.sum(
                segment_max(m, jnp.asarray(recv), n,
                            indices_are_sorted=True) * w
            )

        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(loss_k)(jnp.asarray(msgs))
        g_r = jax.grad(loss_ref)(jnp.asarray(msgs))
        np.testing.assert_allclose(g_k, g_r, rtol=1e-5, atol=1e-6)
