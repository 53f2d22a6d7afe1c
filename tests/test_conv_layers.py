"""Conv layer tests: shapes, golden numerics, gradients, serialization,
masked-padding parity, jit-compilation. Mirrors the reference's per-layer
suites (tests/test_{gcn,gin,gatv2,graphsage}_conv.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_geometric_tpu import GATv2Conv, GCNConv, GINConv, SAGEConv

N, F_IN, F_OUT, E = 6, 8, 4, 10


@pytest.fixture
def graph():
    rng = np.random.default_rng(42)
    x = rng.standard_normal((N, F_IN)).astype(np.float32)
    senders = rng.integers(0, N, E)
    receivers = rng.integers(0, N, E)
    return jnp.asarray(x), jnp.asarray(
        np.stack([senders, receivers]).astype(np.int32)
    )


ALL_LAYERS = [
    GCNConv(output_dim=F_OUT),
    GCNConv(output_dim=F_OUT, add_self_loops=False, normalize=False, use_bias=False),
    GINConv(output_dim=F_OUT, mlp_hidden=(16,)),
    GINConv(output_dim=F_OUT, aggregator="mean", train_eps=True),
    GATv2Conv(output_dim=F_OUT, heads=2),
    GATv2Conv(output_dim=F_OUT, heads=3, concat=False, use_bias=False),
    SAGEConv(output_dim=F_OUT),
    SAGEConv(output_dim=F_OUT, aggregator="pooling", pool_hidden_dim=5),
    SAGEConv(output_dim=F_OUT, aggregator="std", normalize=True, root_weight=False),
]


def out_dim(layer):
    if isinstance(layer, GATv2Conv):
        return layer.out_features
    return layer.output_dim


class TestForward:
    @pytest.mark.parametrize("layer", ALL_LAYERS, ids=lambda l: repr(l)[:50])
    def test_shape_finite(self, layer, graph, rng):
        x, ei = graph
        params = layer.init(rng, F_IN)
        out = layer.apply(params, x, ei)
        assert out.shape == (N, out_dim(layer))
        assert np.all(np.isfinite(np.asarray(out)))

    @pytest.mark.parametrize("layer", ALL_LAYERS, ids=lambda l: repr(l)[:50])
    def test_jit_matches_eager(self, layer, graph, rng):
        x, ei = graph
        params = layer.init(rng, F_IN)
        eager = layer.apply(params, x, ei)
        jitted = jax.jit(lambda p, x, e: layer.apply(p, x, e))(params, x, ei)
        np.testing.assert_allclose(eager, jitted, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("layer", ALL_LAYERS, ids=lambda l: repr(l)[:50])
    def test_edge_index_transpose_equivalent(self, layer, graph, rng):
        x, ei = graph
        params = layer.init(rng, F_IN)
        out1 = layer.apply(params, x, ei)
        out2 = layer.apply(params, x, ei.T)  # [E, 2] form
        np.testing.assert_allclose(out1, out2, rtol=1e-6)


class TestGoldenGCN:
    def test_gcn_manual(self):
        """GCN on a 2-node graph against hand-computed normalization."""
        x = jnp.array([[1.0], [2.0]])
        ei = jnp.array([[0], [1]])  # edge 0 -> 1
        layer = GCNConv(output_dim=1, use_bias=False)
        params = {"kernel": jnp.array([[1.0]])}
        out = layer.apply(params, x, ei)
        # With self-loops: edges (0->1),(0->0),(1->1); in-deg d0=1, d1=2.
        # w(0->1)=1/sqrt(2), w(0->0)=1, w(1->1)=1/2.
        # out0 = 1*1 = 1; out1 = 2*(1/2) + 1*(1/sqrt 2).
        np.testing.assert_allclose(
            np.asarray(out).ravel(),
            [1.0, 1.0 + 1.0 / np.sqrt(2.0)],
            rtol=1e-5,
        )

    def test_no_edges_dense_fallback(self, rng):
        x = jnp.ones((3, F_IN))
        ei = jnp.zeros((2, 0), jnp.int32)
        layer = GCNConv(output_dim=F_OUT)
        params = layer.init(rng, F_IN)
        out = layer.apply(params, x, ei)
        expected = x @ params["kernel"] + params["bias"]
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_empty_graph(self, rng):
        layer = GCNConv(output_dim=F_OUT)
        params = layer.init(rng, F_IN)
        out = layer.apply(params, jnp.zeros((0, F_IN)), jnp.zeros((2, 0), jnp.int32))
        assert out.shape == (0, F_OUT)

    def test_edge_weight_scaling(self, graph, rng):
        x, ei = graph
        layer = GCNConv(output_dim=F_OUT, add_self_loops=False, normalize=False,
                        use_bias=False)
        params = layer.init(rng, F_IN)
        w = jnp.zeros((E,))
        out = layer.apply(params, x, ei, edge_weight=w)
        np.testing.assert_allclose(out, np.zeros((N, F_OUT)), atol=1e-7)


class TestGoldenGIN:
    def test_eps_formula(self, rng):
        """GIN sum aggregation: h' = MLP((1+eps) x + sum_j x_j)."""
        x = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        ei = jnp.array([[0, 1], [1, 0]])  # 0->1, 1->0
        layer = GINConv(output_dim=2, mlp_hidden=(), eps_init=0.5, use_bias=False)
        params = {"mlp": {"dense_0": {"kernel": jnp.eye(2)}}}
        out = layer.apply(params, x, ei)
        expected = 1.5 * np.asarray(x) + np.asarray(x)[::-1]
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_no_edges(self, rng):
        x = jnp.ones((3, 2))
        layer = GINConv(output_dim=2, mlp_hidden=(), eps_init=0.25, use_bias=False)
        params = {"mlp": {"dense_0": {"kernel": jnp.eye(2)}}}
        out = layer.apply(params, x, jnp.zeros((2, 0), jnp.int32))
        np.testing.assert_allclose(out, 1.25 * np.asarray(x), rtol=1e-6)

    def test_invalid_aggregator(self):
        with pytest.raises(ValueError, match="Invalid aggregator"):
            GINConv(output_dim=2, aggregator="std")

    def test_train_eps_gradient(self, graph, rng):
        x, ei = graph
        layer = GINConv(output_dim=F_OUT, train_eps=True)
        params = layer.init(rng, F_IN)

        def loss(p):
            return jnp.sum(layer.apply(p, x, ei) ** 2)

        grads = jax.grad(loss)(params)
        assert np.asarray(grads["eps"]).shape == (1,)
        assert np.all(np.isfinite(np.asarray(grads["eps"])))


class TestGoldenGATv2:
    def test_attention_sums_to_one(self, graph, rng):
        x, ei = graph
        layer = GATv2Conv(output_dim=F_OUT, heads=2)
        params = layer.init(rng, F_IN)
        _, alpha = layer.apply(params, x, ei, return_attention=True)
        # Per receiver, attention weights sum to ~1 (eps-denominator).
        recv = jnp.concatenate([ei[1], jnp.arange(N)])  # self-loops appended
        sums = jax.ops.segment_sum(alpha, recv, N)
        np.testing.assert_allclose(sums, np.ones((N, 2)), rtol=1e-4)

    def test_single_node_self_loop(self, rng):
        x = jnp.ones((1, F_IN))
        ei = jnp.zeros((2, 1), jnp.int32)
        layer = GATv2Conv(output_dim=F_OUT, heads=2)
        params = layer.init(rng, F_IN)
        out = layer.apply(params, x, ei)
        assert out.shape == (1, 2 * F_OUT)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_concat_vs_mean_shapes(self, graph, rng):
        x, ei = graph
        for concat, dim in [(True, 3 * F_OUT), (False, F_OUT)]:
            layer = GATv2Conv(output_dim=F_OUT, heads=3, concat=concat)
            params = layer.init(rng, F_IN)
            assert layer.apply(params, x, ei).shape == (N, dim)


class TestGoldenSAGE:
    def test_mean_formula(self):
        """SAGE mean: out = W_self x + W_neigh mean_j(x_j) with identity W."""
        x = jnp.array([[2.0], [4.0], [6.0]])
        ei = jnp.array([[1, 2], [0, 0]])  # 1->0, 2->0
        layer = SAGEConv(output_dim=1, activation=None, use_bias=False)
        params = {
            "lin_neigh": {"kernel": jnp.array([[1.0]])},
            "lin_self": {"kernel": jnp.array([[1.0]])},
        }
        out = layer.apply(params, x, ei)
        np.testing.assert_allclose(
            np.asarray(out).ravel(), [2.0 + 5.0, 4.0, 6.0], rtol=1e-6
        )

    def test_no_root_weight(self):
        x = jnp.array([[2.0], [4.0]])
        ei = jnp.array([[1], [0]])
        layer = SAGEConv(output_dim=1, activation=None, use_bias=False,
                         root_weight=False)
        params = {"lin_neigh": {"kernel": jnp.array([[1.0]])}}
        out = layer.apply(params, x, ei)
        np.testing.assert_allclose(np.asarray(out).ravel(), [4.0, 0.0], rtol=1e-6)

    def test_l2_normalize(self, graph, rng):
        x, ei = graph
        layer = SAGEConv(output_dim=F_OUT, normalize=True)
        params = layer.init(rng, F_IN)
        out = np.asarray(layer.apply(params, x, ei))
        norms = np.linalg.norm(out, axis=-1)
        ok = norms > 1e-6
        np.testing.assert_allclose(norms[ok], 1.0, rtol=1e-5)

    def test_invalid_aggregator(self):
        with pytest.raises(ValueError, match="Invalid aggregator"):
            SAGEConv(output_dim=2, aggregator="bogus")


class TestMaskedPadding:
    """Padded graphs must produce identical results on the valid prefix."""

    @pytest.mark.parametrize(
        "layer",
        [
            GCNConv(output_dim=F_OUT),
            GINConv(output_dim=F_OUT, aggregator="mean"),
            GATv2Conv(output_dim=F_OUT, heads=2),
            SAGEConv(output_dim=F_OUT, aggregator="max"),
        ],
        ids=lambda l: type(l).__name__,
    )
    def test_padding_parity(self, layer, graph, rng):
        x, ei = graph
        params = layer.init(rng, F_IN)
        base = layer.apply(params, x, ei)

        n_pad, e_pad = N + 3, E + 5
        x_p = jnp.concatenate([x, jnp.zeros((3, F_IN))], axis=0)
        pad_edges = jnp.full((2, 5), n_pad - 1, jnp.int32)
        ei_p = jnp.concatenate([ei, pad_edges], axis=1)
        edge_mask = jnp.arange(e_pad) < E
        node_mask = jnp.arange(n_pad) < N

        out = layer.apply(
            params, x_p, ei_p, edge_mask=edge_mask, node_mask=node_mask
        ) if isinstance(layer, (GCNConv, GATv2Conv)) else layer.apply(
            params, x_p, ei_p, edge_mask=edge_mask
        )
        np.testing.assert_allclose(out[:N], base, rtol=1e-5, atol=1e-6)


class TestSerialization:
    @pytest.mark.parametrize("layer", ALL_LAYERS, ids=lambda l: repr(l)[:50])
    def test_config_roundtrip(self, layer, graph, rng):
        x, ei = graph
        cfg = layer.get_config()
        rebuilt = type(layer).from_config(cfg)
        assert rebuilt == layer  # frozen dataclass equality
        params = layer.init(rng, F_IN)
        np.testing.assert_allclose(
            layer.apply(params, x, ei), rebuilt.apply(params, x, ei), rtol=1e-6
        )


class TestGradients:
    @pytest.mark.parametrize(
        "layer",
        [
            GCNConv(output_dim=F_OUT),
            GINConv(output_dim=F_OUT, mlp_hidden=(8,)),
            GATv2Conv(output_dim=F_OUT, heads=2),
            SAGEConv(output_dim=F_OUT, aggregator="pooling"),
        ],
        ids=lambda l: type(l).__name__,
    )
    def test_finite_nonzero_grads(self, layer, graph, rng):
        x, ei = graph
        params = layer.init(rng, F_IN)

        def loss(p):
            return jnp.sum(layer.apply(p, x, ei) ** 2)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert total > 0
