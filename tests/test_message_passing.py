"""MessagePassing core tests: golden aggregation values, hooks, bipartite,
empty/no-edge contracts (reference analog: tests/test_message_passing.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from keras_geometric_tpu import MessagePassing, propagate


@pytest.fixture
def golden():
    """Reference golden fixture shape (test_message_passing.py:54-80)."""
    x = jnp.asarray(
        np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], np.float32)
    )
    ei = jnp.asarray(np.array([[1, 2, 0, 2], [0, 0, 1, 3]], np.int32))
    return x, ei


class TestGoldenAggregations:
    def test_mean(self, golden):
        x, ei = golden
        out = propagate(x, ei, aggregator="mean")
        expected = [[4.0, 5.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_max(self, golden):
        x, ei = golden
        out = propagate(x, ei, aggregator="max")
        expected = [[5.0, 6.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_sum(self, golden):
        x, ei = golden
        out = propagate(x, ei, aggregator="sum")
        expected = [[8.0, 10.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_min(self, golden):
        x, ei = golden
        out = propagate(x, ei, aggregator="min")
        expected = [[3.0, 4.0], [1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_std(self, golden):
        x, ei = golden
        out = propagate(x, ei, aggregator="std")
        expected = [[1.0, 1.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


class TestShapeContracts:
    def test_empty_graph(self):
        out = propagate(jnp.zeros((0, 3)), jnp.zeros((2, 0), jnp.int32))
        assert out.shape == (0, 3)

    def test_no_edges_returns_zeros(self):
        """Base propagate returns input-dim zeros without update
        (message_passing.py:185-188)."""
        out = propagate(
            jnp.ones((4, 3)), jnp.zeros((2, 0), jnp.int32),
            update_fn=lambda agg, x: agg + 100,
        )
        np.testing.assert_allclose(out, np.zeros((4, 3)))

    def test_bipartite(self):
        x_tgt = jnp.ones((2, 3))
        x_src = 2 * jnp.ones((5, 3))
        ei = jnp.asarray([[0, 4], [1, 1]])
        out = propagate((x_tgt, x_src), ei, aggregator="sum")
        np.testing.assert_allclose(out[1], 4 * np.ones(3))
        np.testing.assert_allclose(out[0], np.zeros(3))


class TestHooks:
    def test_custom_message_and_update(self, golden):
        x, ei = golden
        out = propagate(
            x,
            ei,
            aggregator="sum",
            message_fn=lambda x_i, x_j, ea: x_j * 2,
            update_fn=lambda agg, x: agg + x,
        )
        base = propagate(x, ei, aggregator="sum")
        np.testing.assert_allclose(out, 2 * np.asarray(base) + np.asarray(x),
                                   rtol=1e-5)

    def test_pre_aggregate_post_update(self, golden):
        x, ei = golden
        out = propagate(
            x,
            ei,
            aggregator="sum",
            pre_aggregate_fn=lambda m: m * 0,
            post_update_fn=lambda x_t, u: u + 7,
        )
        np.testing.assert_allclose(out, 7 * np.ones_like(np.asarray(x)))

    def test_edge_attr_passed_to_message(self, golden):
        x, ei = golden
        ea = jnp.arange(4, dtype=jnp.float32)[:, None]
        out = propagate(
            x, ei, aggregator="sum", edge_attr=ea,
            message_fn=lambda x_i, x_j, edge_attr: x_j * edge_attr,
        )
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(out[1], 2 * np.asarray(x)[0], rtol=1e-5)


class TestClassAPI:
    def test_default_class_matches_functional(self, golden):
        x, ei = golden
        mp = MessagePassing(aggregator="mean")
        np.testing.assert_allclose(
            mp([x, ei]), propagate(x, ei, aggregator="mean"), rtol=1e-6
        )

    def test_subclass_hooks(self, golden):
        x, ei = golden

        class Doubler(MessagePassing):
            def message(self, x_i, x_j, edge_attr=None):
                return 2 * x_j

            def update(self, aggregated, x=None):
                return aggregated + 1

        out = Doubler(aggregator="sum")([x, ei])
        base = propagate(x, ei, aggregator="sum")
        np.testing.assert_allclose(out, 2 * np.asarray(base) + 1, rtol=1e-5)

    def test_invalid_inputs(self):
        with pytest.raises(ValueError, match="list or tuple"):
            MessagePassing()(jnp.ones((3, 2)))

    def test_config_roundtrip(self):
        mp = MessagePassing(aggregator="max")
        assert MessagePassing.from_config(mp.get_config()).aggregator == "max"

    def test_jit_compatible(self, golden):
        import jax

        x, ei = golden
        mp = MessagePassing(aggregator="sum")
        out = jax.jit(lambda x, ei: mp([x, ei]))(x, ei)
        np.testing.assert_allclose(out, mp([x, ei]), rtol=1e-6)
