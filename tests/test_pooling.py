"""Pooling/readout layer tests (reference analog: tests/test_pooling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_geometric_tpu import (
    AttentionPooling,
    BatchGlobalPooling,
    GlobalPooling,
    Set2Set,
    batch_pool,
    global_pool,
)


@pytest.fixture
def feats():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((10, 6)).astype(np.float32))


class TestGlobalPooling:
    @pytest.mark.parametrize("pooling,npfn", [
        ("mean", np.mean), ("max", np.max), ("sum", np.sum),
    ])
    def test_matches_numpy(self, feats, pooling, npfn):
        out = global_pool(feats, pooling)
        assert out.shape == (1, 6)
        np.testing.assert_allclose(
            out[0], npfn(np.asarray(feats), axis=0), rtol=1e-5
        )

    def test_invalid(self):
        with pytest.raises(ValueError):
            GlobalPooling(pooling="bogus")

    def test_mask_neutral(self, feats):
        x_pad = jnp.concatenate([feats, 100 * jnp.ones((3, 6))])
        mask = jnp.arange(13) < 10
        for p in ("mean", "max", "sum"):
            np.testing.assert_allclose(
                global_pool(x_pad, p, node_mask=mask),
                global_pool(feats, p),
                rtol=1e-5,
            )


class TestBatchPooling:
    def test_segments(self, feats):
        batch = jnp.asarray(np.repeat([0, 1, 2], [3, 4, 3]).astype(np.int32))
        out = batch_pool(feats, batch, 3, "sum")
        assert out.shape == (3, 6)
        np.testing.assert_allclose(
            out[1], np.asarray(feats)[3:7].sum(0), rtol=1e-5
        )

    def test_mean_count_clamped_to_one(self, feats):
        # Graph 1 empty (no nodes assigned): mean divides by max(count,1)=1.
        batch = jnp.asarray(np.repeat([0, 2], [5, 5]).astype(np.int32))
        out = batch_pool(feats, batch, 3, "mean")
        np.testing.assert_allclose(out[1], np.zeros(6), atol=1e-7)

    def test_module_wrapper(self, feats):
        batch = jnp.zeros(10, jnp.int32)
        layer = BatchGlobalPooling(pooling="max")
        out = layer.apply({}, feats, batch, 1)
        np.testing.assert_allclose(
            out, global_pool(feats, "max"), rtol=1e-5
        )


class TestAttentionPooling:
    def test_shape_and_convexity(self, feats, rng):
        layer = AttentionPooling(attention_dim=4)
        params = layer.init(rng, 6)
        out = layer.apply(params, feats)
        assert out.shape == (1, 6)
        # Weighted sum with softmax weights stays in the convex hull.
        x = np.asarray(feats)
        assert np.all(np.asarray(out)[0] <= x.max(0) + 1e-5)
        assert np.all(np.asarray(out)[0] >= x.min(0) - 1e-5)

    def test_mask_neutral(self, feats, rng):
        layer = AttentionPooling()
        params = layer.init(rng, 6)
        x_pad = jnp.concatenate([feats, 7 * jnp.ones((2, 6))])
        mask = jnp.arange(12) < 10
        np.testing.assert_allclose(
            layer.apply(params, x_pad, node_mask=mask),
            layer.apply(params, feats),
            rtol=1e-5,
        )

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            AttentionPooling(attention_dim=0)
        with pytest.raises(ValueError):
            AttentionPooling(dropout=1.5)


class TestSet2Set:
    def test_output_shape(self, feats, rng):
        layer = Set2Set(output_dim=5, processing_steps=3)
        params = layer.init(rng, 6)
        out = layer.apply(params, feats)
        # [1, lstm_units + F] (attention_pooling.py:209-217)
        assert out.shape == (1, 5 + 6)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_more_steps_changes_output(self, feats, rng):
        p3 = Set2Set(output_dim=5, processing_steps=3)
        p1 = Set2Set(output_dim=5, processing_steps=1)
        params = p3.init(rng, 6)
        o3 = p3.apply(params, feats)
        o1 = p1.apply(params, feats)
        assert not np.allclose(o3, o1)

    def test_gradients_flow(self, feats, rng):
        layer = Set2Set(output_dim=4, processing_steps=2)
        params = layer.init(rng, 6)
        grads = jax.grad(lambda p: jnp.sum(layer.apply(p, feats) ** 2))(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            Set2Set(output_dim=0)
        with pytest.raises(ValueError):
            Set2Set(output_dim=4, processing_steps=0)

    def test_dropout_applied_in_training(self, feats, rng):
        """Dropout hits the attention input during training (reference
        attention_pooling.py:166-172, 202-205) — ADVICE r1: the field was
        validated but never applied."""
        layer = Set2Set(output_dim=4, processing_steps=2, dropout=0.5)
        params = layer.init(rng, 6)
        eval_out = layer.apply(params, feats)
        k = jax.random.PRNGKey(7)
        train_out = layer.apply(params, feats, training=True, rng=k)
        assert not np.allclose(eval_out, train_out)
        # Two different keys give different draws; same key reproduces.
        t2 = layer.apply(
            params, feats, training=True, rng=jax.random.PRNGKey(8)
        )
        assert not np.allclose(train_out, t2)
        np.testing.assert_allclose(
            train_out, layer.apply(params, feats, training=True, rng=k)
        )
        # Without a key, training + dropout must fail loudly.
        with pytest.raises(ValueError, match="rng"):
            layer.apply(params, feats, training=True)
        # Zero rate is identity regardless of mode.
        l0 = Set2Set(output_dim=4, processing_steps=2, dropout=0.0)
        p0 = l0.init(rng, 6)
        np.testing.assert_allclose(
            l0.apply(p0, feats, training=True, rng=k), l0.apply(p0, feats)
        )


class TestPoolingAggregator:
    def test_matches_sage_semantics(self, rng):
        """Standalone learnable pooling aggregator (reference
        aggregators.py:235-274): max over Dense(units, relu) of messages,
        isolated receivers -> 0."""
        from keras_geometric_tpu import PoolingAggregator

        rng_np = np.random.default_rng(11)
        e, f, n, units = 40, 6, 10, 12
        msgs = jnp.asarray(rng_np.standard_normal((e, f)).astype(np.float32))
        recv = jnp.asarray(rng_np.integers(0, n - 1, e).astype(np.int32))
        agg = PoolingAggregator(units=units)
        params = agg.init(rng, f)
        out = agg.apply(params, msgs, recv, n)
        assert out.shape == (n, units)
        # Manual reference: dense+relu then per-receiver max, -inf -> 0.
        k = np.asarray(params["mlp"]["kernel"])
        b = np.asarray(params["mlp"]["bias"])
        pooled = np.maximum(np.asarray(msgs) @ k + b, 0.0)
        want = np.full((n, units), -np.inf, np.float32)
        for i, r in enumerate(np.asarray(recv)):
            want[r] = np.maximum(want[r], pooled[i])
        want[~np.isfinite(want)] = 0.0
        want[np.isneginf(want.max(axis=1))] = 0.0
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

    def test_jit(self, feats, rng):
        layer = Set2Set(output_dim=4)
        params = layer.init(rng, 6)
        eager = layer.apply(params, feats)
        jitted = jax.jit(lambda p, x: layer.apply(p, x))(params, feats)
        np.testing.assert_allclose(eager, jitted, rtol=1e-5, atol=1e-6)
