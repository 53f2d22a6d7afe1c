"""Integration tests: multi-layer models, heterogeneous stacks, training
steps, serialization round-trips (reference analog:
tests/integration/test_model_integration.py:22-343)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import keras_geometric_tpu as kgt
from keras_geometric_tpu.models import GAT, GCN, GIN, GraphClassifier, GraphSAGE, GNNEncoder
from keras_geometric_tpu.training import (
    TrainState,
    make_eval_fn,
    make_node_classification_step,
    masked_accuracy,
)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    n, e, f = 40, 160, 8
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    y = rng.integers(0, 4, n).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(ei), jnp.asarray(y)


class TestEncoders:
    @pytest.mark.parametrize(
        "enc,out",
        [
            (GCN((16, 4)), 4),
            (GIN((16, 4), mlp_hidden=(8,)), 4),
            (GAT((8, 4), heads=2), 8),  # concat heads on final layer
            (GraphSAGE((16, 4), aggregator="max"), 4),
        ],
        ids=["gcn", "gin", "gat", "sage"],
    )
    def test_forward(self, graph, rng, enc, out):
        x, ei, _ = graph
        params = enc.init(rng, x.shape[1])
        h = enc.apply(params, x, ei)
        assert h.shape == (x.shape[0], out)
        assert np.all(np.isfinite(np.asarray(h)))

    def test_three_layer_stack(self, graph, rng):
        x, ei, _ = graph
        enc = GCN((32, 16, 4), dropout_rate=0.2)
        params = enc.init(rng, x.shape[1])
        h_eval = enc.apply(params, x, ei)
        h_train = enc.apply(params, x, ei, training=True, rng=rng)
        assert h_eval.shape == h_train.shape == (x.shape[0], 4)
        assert not np.allclose(h_eval, h_train)  # dropout active

    def test_config_roundtrip(self, graph, rng):
        x, ei, _ = graph
        enc = GAT((8, 4), heads=3, dropout_rate=0.1)
        cfg = enc.get_config()
        rebuilt = GNNEncoder.from_config(cfg)
        assert rebuilt == enc
        params = enc.init(rng, x.shape[1])
        np.testing.assert_allclose(
            enc.apply(params, x, ei), rebuilt.apply(params, x, ei), rtol=1e-6
        )


class TestTrainingStep:
    def test_node_classification_converges(self, graph):
        x, ei, y = graph
        enc = GCN((16, 4))
        params = enc.init(jax.random.PRNGKey(0), x.shape[1])
        tx = optax.adam(0.05)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_node_classification_step(enc, tx)
        mask = jnp.ones(x.shape[0], bool)
        losses = []
        for _ in range(40):
            state, loss = step(state, x, ei, y, mask)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5
        evaluate = make_eval_fn(enc)
        assert float(evaluate(state.params, x, ei, y, mask)) > 0.6

    def test_state_is_pytree(self, graph):
        x, ei, y = graph
        enc = GCN((8, 4))
        params = enc.init(jax.random.PRNGKey(0), x.shape[1])
        tx = optax.sgd(0.1)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        leaves = jax.tree_util.tree_leaves(state)
        assert len(leaves) > 0
        rebuilt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state), leaves
        )
        assert int(rebuilt.step) == 0


class TestGraphClassification:
    def test_classifier_shapes(self, rng):
        clf = GraphClassifier(
            encoder=GIN((8, 8), mlp_hidden=(8,)),
            num_classes=3,
            readout="mean",
            head_hidden=(16,),
        )
        params = clf.init(rng, 5)
        n, e = 20, 60
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((n, 5)).astype(np.float32))
        ei = jnp.asarray(r.integers(0, n, (2, e)).astype(np.int32))
        batch = jnp.asarray(np.repeat([0, 1, 2, 3], 5).astype(np.int32))
        logits = clf.apply(params, x, ei, batch, 4)
        assert logits.shape == (4, 3)

    def test_classifier_config_roundtrip(self, rng):
        clf = GraphClassifier(
            encoder=GIN((8, 4)), num_classes=3, readout="sum"
        )
        cfg = clf.get_config()
        rebuilt = GraphClassifier.from_config(cfg)
        assert rebuilt.encoder == clf.encoder
        assert rebuilt.num_classes == 3


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path, graph):
        from keras_geometric_tpu.training import (
            restore_checkpoint,
            save_checkpoint,
        )

        x, ei, y = graph
        enc = GCN((8, 4))
        params = enc.init(jax.random.PRNGKey(0), x.shape[1])
        tx = optax.adam(0.01)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_node_classification_step(enc, tx, donate=False)
        state, _ = step(state, x, ei, y, jnp.ones(x.shape[0], bool))

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, config=enc.get_config())
        restored = restore_checkpoint(path, target=state)
        for a, b in zip(
            jax.tree_util.tree_leaves(state),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        from keras_geometric_tpu.training import load_config

        cfg = load_config(path + "/model_config.json")
        assert GNNEncoder.from_config(cfg) == enc
