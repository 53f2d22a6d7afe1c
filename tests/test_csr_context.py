"""GraphContext (dual-orientation CSR) tests: fwd/bwd vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu.ops.csr import prepare_graph


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(3)
    n, e, f = 200, 1500, 32
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    h = rng.standard_normal((n, f)).astype(np.float32)
    return n, ei, jnp.asarray(h)


def _ref_spmm(h, ei, n, w=None):
    msgs = jnp.take(h, ei[0], axis=0)
    if w is not None:
        msgs = msgs * w[:, None]
    return jax.ops.segment_sum(msgs, ei[1], n)


def test_spmm_matches_reference(case):
    n, ei, h = case
    ctx = prepare_graph(ei, n)
    with pltpu.force_tpu_interpret_mode():
        out = ctx.spmm(h)
    ref = _ref_spmm(h, ei, n)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gcn_normalized_spmm(case):
    n, ei, h = case
    import keras_geometric_tpu as kgt

    ctx = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
    ei_l, _ = kgt.add_self_loops(jnp.asarray(ei), n)
    w_ref = kgt.gcn_norm(ei_l, n)
    with pltpu.force_tpu_interpret_mode():
        out = ctx.spmm(h)
    ref = _ref_spmm(h, ei_l, n, w_ref)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gather_backward_matches(case):
    """The sorted-scatter VJP must equal XLA's gather transpose."""
    n, ei, h = case
    ctx = prepare_graph(ei, n)

    def loss_ctx(h):
        return jnp.sum(jnp.tanh(ctx.gather(h)))

    def loss_ref(h):
        return jnp.sum(jnp.tanh(jnp.take(h, ctx.senders, axis=0)))

    # The sorted-scatter kernel runs in the *backward* pass, so the whole
    # grad evaluation must sit inside interpret mode.
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_ctx)(h)
    g2 = jax.grad(loss_ref)(h)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


def test_full_spmm_gradient(case):
    n, ei, h = case
    ctx = prepare_graph(ei, n, gcn_normalize=True)

    def loss_ctx(h):
        return jnp.sum(ctx.spmm(h) ** 2)

    def loss_ref(h):
        ei_s = np.stack([np.asarray(ctx.senders), np.asarray(ctx.receivers)])
        return jnp.sum(_ref_spmm(h, jnp.asarray(ei_s), n, ctx.edge_weight) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_ctx)(h)
    np.testing.assert_allclose(
        g1, jax.grad(loss_ref)(h), rtol=1e-3, atol=1e-3
    )


class TestSymmetric:
    def test_symmetric_spmm_grad_matches_general(self):
        rng = np.random.default_rng(4)
        n, half, f = 150, 500, 16
        a = rng.integers(0, n, half)
        b = rng.integers(0, n, half)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        h = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

        ctx_sym = prepare_graph(ei, n, add_self_loops=True,
                                gcn_normalize=True, symmetric=True)
        ctx_gen = prepare_graph(ei, n, add_self_loops=True,
                                gcn_normalize=True)

        with pltpu.force_tpu_interpret_mode():
            out_sym = ctx_sym.spmm(h)
            out_gen = ctx_gen.spmm(h)
            g_sym = jax.grad(lambda x: jnp.sum(jnp.tanh(ctx_sym.spmm(x))))(h)
            g_gen = jax.grad(lambda x: jnp.sum(jnp.tanh(ctx_gen.spmm(x))))(h)
        np.testing.assert_allclose(out_sym, out_gen, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(g_sym, g_gen, rtol=1e-4, atol=1e-4)

    def test_asymmetric_rejected(self):
        ei = np.array([[0, 1], [1, 2]], np.int32)
        with pytest.raises(ValueError, match="not symmetric"):
            prepare_graph(ei, 3, symmetric=True)


class TestDensifiedSelfLoops:
    """densify_self_loops: diag applied densely == loops in the stream."""

    def _sym_case(self):
        rng = np.random.default_rng(11)
        n, half, f = 180, 700, 32
        a = rng.integers(0, n, half).astype(np.int32)
        b = rng.integers(0, n, half).astype(np.int32)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        h = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        return n, ei, h

    def test_spmm_matches_streamed_loops(self):
        n, ei, h = self._sym_case()
        dense = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True,
        )
        streamed = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
        )
        assert dense.num_edges == streamed.num_edges  # math edge accounting
        assert dense.num_real_edges < streamed.num_real_edges
        with pltpu.force_tpu_interpret_mode():
            out_d = dense.spmm(h)
            out_s = streamed.spmm(h)
        np.testing.assert_allclose(out_d, out_s, rtol=1e-5, atol=1e-5)

    def test_grad_matches_streamed_loops(self):
        n, ei, h = self._sym_case()
        dense = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True,
        )
        streamed = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
        )
        with pltpu.force_tpu_interpret_mode():
            g_d = jax.grad(lambda x: jnp.sum(jnp.tanh(dense.spmm(x))))(h)
            g_s = jax.grad(lambda x: jnp.sum(jnp.tanh(streamed.spmm(x))))(h)
        np.testing.assert_allclose(g_d, g_s, rtol=1e-5, atol=1e-5)

    def test_general_path_matches(self):
        """Non-symmetric densified context: gather+scatter_weighted + diag."""
        rng = np.random.default_rng(12)
        n, e, f = 150, 900, 16
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        h = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        dense = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            densify_self_loops=True,
        )
        streamed = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
        )
        with pltpu.force_tpu_interpret_mode():
            out_d = dense.spmm(h)
            out_s = streamed.spmm(h)
        np.testing.assert_allclose(out_d, out_s, rtol=1e-5, atol=1e-5)

    def test_gcn_conv_context_parity(self):
        """GCNConv(context=densified) == GCNConv(plain edge_index path)."""
        from keras_geometric_tpu.nn import GCNConv

        n, ei, h_x = self._sym_case()
        x = h_x
        layer_ctx = GCNConv(
            output_dim=24, add_self_loops=False, normalize=False
        )
        layer_plain = GCNConv(output_dim=24)
        params = layer_plain.init(jax.random.PRNGKey(0), x.shape[1])
        ctx = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True,
        )
        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer_ctx.apply(params, x, context=ctx)
        out_ref = layer_plain.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_ref, rtol=1e-4, atol=1e-4)

    def test_requires_add_self_loops(self):
        n, ei, _ = self._sym_case()
        with pytest.raises(ValueError, match="add_self_loops"):
            prepare_graph(ei, n, densify_self_loops=True)


class TestPaddedNodes:
    def test_padded_spmm_matches(self):
        rng = np.random.default_rng(21)
        n, half, f = 300, 1200, 32
        a = rng.integers(0, n, half).astype(np.int32)
        b = rng.integers(0, n, half).astype(np.int32)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        plain = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True,
        )
        padded = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True, pad_nodes=True,
        )
        assert padded.num_real_nodes == n
        assert padded.num_nodes % 256 == 0 and padded.num_nodes >= n
        xp = np.pad(x, ((0, padded.num_nodes - n), (0, 0)))
        with pltpu.force_tpu_interpret_mode():
            out_plain = plain.spmm(jnp.asarray(x))
            out_pad = padded.spmm(jnp.asarray(xp))
        assert out_pad.shape[0] == padded.num_nodes
        np.testing.assert_allclose(
            out_pad[:n], out_plain, rtol=1e-5, atol=1e-5
        )
        # padded rows stay exactly zero (no edges, zero self-weight)
        np.testing.assert_array_equal(np.asarray(out_pad[n:]), 0.0)

    def test_padded_grad_matches(self):
        rng = np.random.default_rng(22)
        n, half, f = 200, 800, 16
        a = rng.integers(0, n, half).astype(np.int32)
        b = rng.integers(0, n, half).astype(np.int32)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        plain = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
        )
        padded = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
            pad_nodes=True,
        )
        xp = jnp.asarray(np.pad(x, ((0, padded.num_nodes - n), (0, 0))))
        with pltpu.force_tpu_interpret_mode():
            g_plain = jax.grad(
                lambda h: jnp.sum(jnp.tanh(plain.spmm(h)))
            )(jnp.asarray(x))
            g_pad = jax.grad(
                lambda h: jnp.sum(jnp.tanh(padded.spmm(h)[:n]))
            )(xp)
        np.testing.assert_allclose(g_pad[:n], g_plain, rtol=1e-5, atol=1e-5)


class TestPrecompute:
    def test_cached_first_layer_exact(self):
        """(S X) W == S (X W): precompute matches the live first layer."""
        from keras_geometric_tpu.ops.precompute import precompute_propagation

        rng = np.random.default_rng(31)
        n, half, fin, fout = 220, 900, 24, 16
        a = rng.integers(0, n, half).astype(np.int32)
        b = rng.integers(0, n, half).astype(np.int32)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((n, fin)).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((fin, fout)).astype(np.float32))
        ctx = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True,
            symmetric=True, densify_self_loops=True,
        )
        with pltpu.force_tpu_interpret_mode():
            sx = precompute_propagation(ctx, x)
            live = ctx.spmm(x @ W)
        np.testing.assert_allclose(sx @ W, live, rtol=1e-4, atol=1e-4)

    def test_multi_hop(self):
        from keras_geometric_tpu.ops.precompute import precompute_propagation

        rng = np.random.default_rng(32)
        n, half, f = 100, 300, 8
        a = rng.integers(0, n, half).astype(np.int32)
        b = rng.integers(0, n, half).astype(np.int32)
        ei = np.stack(
            [np.concatenate([a, b]), np.concatenate([b, a])]
        ).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        ctx = prepare_graph(
            ei, n, add_self_loops=True, gcn_normalize=True, symmetric=True,
        )
        with pltpu.force_tpu_interpret_mode():
            s2x = precompute_propagation(ctx, x, hops=2)
            ref = ctx.spmm(ctx.spmm(x))
        np.testing.assert_allclose(s2x, ref, rtol=1e-4, atol=1e-4)

    def test_hops_validation(self):
        from keras_geometric_tpu.ops.precompute import precompute_propagation

        ei = np.array([[0, 1], [1, 0]], np.int32)
        ctx = prepare_graph(ei, 2)
        with pytest.raises(ValueError, match="hops"):
            precompute_propagation(ctx, jnp.zeros((2, 4)), hops=0)


class TestEdgeSoftmax:
    """Kernelized edge softmax == XLA segment_softmax (fwd + VJP)."""

    def _case(self, k=4):
        rng = np.random.default_rng(5)
        n, e = 120, 700
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        ctx = prepare_graph(ei, n, add_self_loops=True)
        scores = jnp.asarray(
            rng.standard_normal((ctx.senders.shape[0], k)).astype(np.float32)
        )
        return n, ctx, scores

    def test_forward_parity(self):
        from keras_geometric_tpu.ops.segment import segment_softmax

        n, ctx, s = self._case()
        with pltpu.force_tpu_interpret_mode():
            a1 = ctx.edge_softmax(s)
        a2 = segment_softmax(
            s, ctx.receivers, n, mask=ctx.edge_mask, eps=1e-10,
            indices_are_sorted=True,
        )
        np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-5)

    def test_vjp_parity(self):
        from keras_geometric_tpu.ops.segment import segment_softmax

        n, ctx, s = self._case()
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(
                lambda s: jnp.sum(jnp.tanh(ctx.edge_softmax(s)))
            )(s)
        g2 = jax.grad(
            lambda s: jnp.sum(jnp.tanh(segment_softmax(
                s, ctx.receivers, n, mask=ctx.edge_mask, eps=1e-10,
                indices_are_sorted=True,
            )))
        )(s)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)

    def test_rows_sum_to_one(self):
        n, ctx, s = self._case(k=2)
        with pltpu.force_tpu_interpret_mode():
            a = ctx.edge_softmax(s)
        sums = jax.ops.segment_sum(a, ctx.receivers, n)
        deg = np.bincount(
            np.asarray(ctx.receivers)[np.asarray(ctx.edge_mask)], minlength=n
        )
        np.testing.assert_allclose(
            np.asarray(sums)[deg > 0], 1.0, rtol=1e-4
        )


class TestGeneralSpmmVJP:
    """Permutation-free backward of the directed (asymmetric) spmm."""

    def test_directed_grad_matches_xla(self):
        rng = np.random.default_rng(41)
        n, e, f = 170, 1100, 24
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        h = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        ctx = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
        assert ctx.receivers_ss is not None

        def loss_ctx(h):
            return jnp.sum(jnp.tanh(ctx.spmm(h)))

        def loss_ref(h):
            msgs = jnp.take(h, ctx.senders, axis=0) * ctx.edge_weight[:, None]
            return jnp.sum(jnp.tanh(jax.ops.segment_sum(
                msgs, ctx.receivers, ctx.num_nodes)))

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_ctx)(h)
        g2 = jax.grad(loss_ref)(h)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)

    def test_gin_sage_fused_grads_match_edge_path(self):
        """spmm/spmm_mean routes == gather+scatter routes, values and grads."""
        from keras_geometric_tpu.nn import GINConv, SAGEConv

        rng = np.random.default_rng(42)
        n, e, f = 140, 900, 16
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        ctx = prepare_graph(ei, n, add_self_loops=True)
        assert ctx.has_unit_weights

        for layer in (
            GINConv(output_dim=12, aggregator="sum"),
            GINConv(output_dim=12, aggregator="mean"),
            SAGEConv(output_dim=12, aggregator="mean"),
        ):
            params = layer.init(jax.random.PRNGKey(0), f)

            def loss(p):
                return jnp.sum(layer.apply(p, x, context=ctx) ** 2)

            def loss_plain(p):
                return jnp.sum(layer.apply(p, x, jnp.asarray(ei_sl)) ** 2)

            ei_sl = np.concatenate(
                [ei, np.stack([np.arange(n), np.arange(n)])], axis=1
            ).astype(np.int32)
            with pltpu.force_tpu_interpret_mode():
                v_ctx = loss(params)
                g_ctx = jax.grad(loss)(params)
            v_ref = loss_plain(params)
            g_ref = jax.grad(loss_plain)(params)
            np.testing.assert_allclose(v_ctx, v_ref, rtol=1e-4, atol=1e-4)
            for a, b in zip(
                jax.tree_util.tree_leaves(g_ctx),
                jax.tree_util.tree_leaves(g_ref),
            ):
                # split2 kernel accumulation order vs XLA: ~1e-6 relative.
                np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
