"""Context (kernelized) layer paths must match the plain paths exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from keras_geometric_tpu import GATv2Conv, GCNConv, GINConv, SAGEConv
from keras_geometric_tpu.ops.csr import prepare_graph


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(9)
    n, e, f = 120, 700, 16
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    return n, ei, x, f


def _sorted_ei(ctx):
    m = np.asarray(ctx.edge_mask)
    return jnp.asarray(
        np.stack([np.asarray(ctx.senders)[m], np.asarray(ctx.receivers)[m]])
    )


class TestGCN:
    def test_context_matches_plain(self, case, rng):
        n, ei, x, f = case
        ctx = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
        layer_ctx = GCNConv(output_dim=8, add_self_loops=False, normalize=False)
        layer_plain = GCNConv(output_dim=8)
        params = layer_ctx.init(rng, f)
        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer_ctx.apply(params, x, context=ctx)
        out_plain = layer_plain.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_plain, rtol=1e-4, atol=1e-4)

    def test_widening_layer_propagate_first(self, case, rng):
        # F_in < F_out takes the propagate-first branch (spmm at F_in,
        # transform after): must match the plain transform-first path,
        # values and gradients, since A(xW) = (Ax)W.
        n, ei, x, f = case
        ctx = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
        layer = GCNConv(output_dim=2 * f, add_self_loops=False, normalize=False)
        params = layer.init(rng, f)

        def ctx_loss(p):
            return jnp.sum(layer.apply(p, x, context=ctx) ** 2)

        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer.apply(params, x, context=ctx)
            g_ctx = jax.grad(ctx_loss)(params)
        plain = GCNConv(output_dim=2 * f)
        out_plain = plain.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_plain, rtol=1e-4, atol=1e-4)
        g_plain = jax.grad(
            lambda p: jnp.sum(plain.apply(p, x, jnp.asarray(ei)) ** 2)
        )(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ctx), jax.tree_util.tree_leaves(g_plain)
        ):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    def test_context_gradients(self, case, rng):
        n, ei, x, f = case
        ctx = prepare_graph(ei, n, add_self_loops=True, gcn_normalize=True)
        layer = GCNConv(output_dim=8, add_self_loops=False, normalize=False)
        params = layer.init(rng, f)

        with pltpu.force_tpu_interpret_mode():
            g_ctx = jax.grad(
                lambda p: jnp.sum(layer.apply(p, x, context=ctx) ** 2)
            )(params)
        g_plain = jax.grad(
            lambda p: jnp.sum(
                GCNConv(output_dim=8).apply(p, x, jnp.asarray(ei)) ** 2
            )
        )(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ctx), jax.tree_util.tree_leaves(g_plain)
        ):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


class TestGATv2:
    def test_context_matches_plain(self, case, rng):
        n, ei, x, f = case
        ctx = prepare_graph(ei, n, add_self_loops=True)
        layer_ctx = GATv2Conv(output_dim=6, heads=2, add_self_loops=False)
        layer_plain = GATv2Conv(output_dim=6, heads=2)
        params = layer_ctx.init(rng, f)
        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer_ctx.apply(params, x, context=ctx)
        out_plain = layer_plain.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_plain, rtol=1e-4, atol=1e-4)


class TestGIN:
    @pytest.mark.parametrize("agg", ["sum", "mean", "max"])
    def test_context_matches_plain(self, case, rng, agg):
        n, ei, x, f = case
        ctx = prepare_graph(ei, n)
        layer = GINConv(output_dim=8, aggregator=agg)
        params = layer.init(rng, f)
        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer.apply(params, x, context=ctx)
        out_plain = layer.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_plain, rtol=1e-4, atol=1e-4)


class TestSAGE:
    @pytest.mark.parametrize(
        "agg", ["mean", "sum", "max", "std", "pooling"]
    )
    def test_context_matches_plain(self, case, rng, agg):
        n, ei, x, f = case
        ctx = prepare_graph(ei, n)
        layer = SAGEConv(output_dim=8, aggregator=agg)
        params = layer.init(rng, f)
        with pltpu.force_tpu_interpret_mode():
            out_ctx = layer.apply(params, x, context=ctx)
        out_plain = layer.apply(params, x, jnp.asarray(ei))
        np.testing.assert_allclose(out_ctx, out_plain, rtol=1e-4, atol=1e-4)
