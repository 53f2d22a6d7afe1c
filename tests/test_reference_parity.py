"""Direct numerical parity vs the reference, executed on its JAX backend.

The reference's own ground truth is cross-framework allclose (PyG weight
sync, /root/reference/tests/test_gcn_conv.py:531-631, rtol=1e-4/atol=1e-5).
Here the analogous gold standard is the reference ITSELF: import it from
/root/reference/src under ``KERAS_BACKEND=jax``, push this framework's
initialized parameters into the Keras layer variables, and assert per-layer
outputs allclose — for all four convs, the four readouts, and batching,
including the edge cases the reference pins (isolated nodes, duplicate
edges, no-edge graphs).

Skipped wholesale if keras or the reference tree is unavailable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

os.environ.setdefault("KERAS_BACKEND", "jax")

REF_SRC = "/root/reference/src"
keras = pytest.importorskip("keras")
if keras.backend.backend() != "jax":  # pragma: no cover
    pytest.skip("reference parity needs the jax backend", allow_module_level=True)
if not os.path.isdir(REF_SRC):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF_SRC not in sys.path:
    sys.path.insert(0, REF_SRC)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import keras_geometric as ref  # noqa: E402  (the reference package)
from keras_geometric.layers.pooling import (  # noqa: E402
    AttentionPooling as RefAttentionPooling,
    BatchGlobalPooling as RefBatchGlobalPooling,
    GlobalPooling as RefGlobalPooling,
    Set2Set as RefSet2Set,
)

import keras_geometric_tpu as kgt  # noqa: E402

RTOL, ATOL = 1e-4, 1e-5


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def sync_weights(ref_layer, params, mapping):
    """Assign this framework's params into the reference layer's variables.

    ``mapping``: {reference weight-path suffix -> flattened param key}.
    Every reference variable must be matched exactly once.
    """
    flat = _flatten(params)
    for w in ref_layer.weights:
        hits = [s for s in mapping if w.path.endswith(s)]
        assert hits, f"no mapping for reference weight {w.path}"
        suffix = max(hits, key=len)
        val = flat[mapping[suffix]]
        assert tuple(w.shape) == val.reshape(w.shape).shape
        w.assign(val.reshape(w.shape))


def _graph(n=7, f=5, e=12, seed=0, isolated=True, duplicates=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, f)).astype(np.float32)
    # Keep node n-1 isolated; include duplicate edges.
    hi = n - 1 if isolated else n
    s = rng.integers(0, hi, e).astype(np.int32)
    r = rng.integers(0, hi, e).astype(np.int32)
    if duplicates and e >= 2:
        s[1], r[1] = s[0], r[0]
    return x, np.stack([s, r])


class TestGCNParity:
    @pytest.mark.parametrize("add_self_loops", [True, False])
    @pytest.mark.parametrize("normalize", [True, False])
    @pytest.mark.parametrize("use_bias", [True, False])
    def test_forward(self, add_self_loops, normalize, use_bias):
        x, ei = _graph(seed=1)
        mine = kgt.GCNConv(
            8, use_bias=use_bias, add_self_loops=add_self_loops,
            normalize=normalize,
        )
        params = mine.init(jax.random.PRNGKey(0), x.shape[1])
        theirs = ref.GCNConv(
            8, use_bias=use_bias, add_self_loops=add_self_loops,
            normalize=normalize,
        )
        theirs([x, ei])  # build
        sync_weights(theirs, params, {"kernel": "kernel", "bias": "bias"})
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_edge_weight_reference_ignores_third_input(self):
        """The reference GCNConv.call unpacks only inputs[0:2] — a user
        edge_attr is silently DISCARDED (gcn_conv.py:300-303; only the
        internally computed normalization reaches message()). This
        framework's ``edge_weight`` kwarg is therefore an extension; parity
        holds for the 2-input contract."""
        x, ei = _graph(seed=2)
        w = np.random.default_rng(3).random(ei.shape[1]).astype(np.float32)
        mine = kgt.GCNConv(6)
        params = mine.init(jax.random.PRNGKey(1), x.shape[1])
        theirs = ref.GCNConv(6)
        theirs([x, ei, w])
        sync_weights(theirs, params, {"kernel": "kernel", "bias": "bias"})
        # Reference output is identical with and without the third input.
        np.testing.assert_allclose(
            np.asarray(theirs([x, ei, w])), np.asarray(theirs([x, ei])),
            rtol=0, atol=0,
        )
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei, w]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_no_edges(self):
        x, _ = _graph(seed=4)
        ei = np.zeros((2, 0), np.int32)
        mine = kgt.GCNConv(4)
        params = mine.init(jax.random.PRNGKey(2), x.shape[1])
        theirs = ref.GCNConv(4)
        theirs([x, ei])
        sync_weights(theirs, params, {"kernel": "kernel", "bias": "bias"})
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_context_path(self):
        """Kernelized GraphContext path (Pallas interpret) vs reference."""
        from jax.experimental.pallas import tpu as pltpu

        from keras_geometric_tpu.ops.csr import prepare_graph

        x, ei = _graph(n=40, f=8, e=120, seed=5)
        mine = kgt.GCNConv(8, add_self_loops=False, normalize=False)
        params = mine.init(jax.random.PRNGKey(3), x.shape[1])
        ctx = prepare_graph(ei, 40, add_self_loops=True, gcn_normalize=True)
        theirs = ref.GCNConv(8, add_self_loops=True, normalize=True)
        theirs([x, ei])
        sync_weights(theirs, params, {"kernel": "kernel", "bias": "bias"})
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mine.apply(params, jnp.asarray(x), context=ctx))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)


GIN_MAP = {
    "mlp_hidden_0/kernel": "mlp/dense_0/kernel",
    "mlp_hidden_0/bias": "mlp/dense_0/bias",
    "mlp_hidden_1/kernel": "mlp/dense_1/kernel",
    "mlp_hidden_1/bias": "mlp/dense_1/bias",
    "mlp_output/kernel": "mlp/dense_last/kernel",
    "mlp_output/bias": "mlp/dense_last/bias",
    "eps": "eps",
}


class TestGINParity:
    @pytest.mark.parametrize("aggregator", ["sum", "mean", "max"])
    @pytest.mark.parametrize("hidden", [(), (16,), (16, 16)])
    def test_forward(self, aggregator, hidden):
        x, ei = _graph(seed=6)
        mine = kgt.GINConv(8, mlp_hidden=hidden, aggregator=aggregator)
        params = mine.init(jax.random.PRNGKey(4), x.shape[1])
        theirs = ref.GINConv(8, mlp_hidden=list(hidden), aggregator=aggregator)
        theirs([x, ei])
        mapping = dict(GIN_MAP)
        mapping["mlp_output/kernel"] = f"mlp/dense_{len(hidden)}/kernel"
        mapping["mlp_output/bias"] = f"mlp/dense_{len(hidden)}/bias"
        sync_weights(theirs, params, mapping)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_train_eps(self):
        x, ei = _graph(seed=7)
        mine = kgt.GINConv(5, train_eps=True, eps_init=0.3)
        params = mine.init(jax.random.PRNGKey(5), x.shape[1])
        theirs = ref.GINConv(5, train_eps=True, eps_init=0.3)
        theirs([x, ei])
        mapping = dict(GIN_MAP)
        mapping["mlp_output/kernel"] = "mlp/dense_0/kernel"
        mapping["mlp_output/bias"] = "mlp/dense_0/bias"
        sync_weights(theirs, params, mapping)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_no_edges(self):
        x, _ = _graph(seed=8)
        ei = np.zeros((2, 0), np.int32)
        mine = kgt.GINConv(4, mlp_hidden=(8,))
        params = mine.init(jax.random.PRNGKey(6), x.shape[1])
        theirs = ref.GINConv(4, mlp_hidden=[8])
        theirs([x, ei])
        mapping = dict(GIN_MAP)
        mapping["mlp_output/kernel"] = "mlp/dense_1/kernel"
        mapping["mlp_output/bias"] = "mlp/dense_1/bias"
        sync_weights(theirs, params, mapping)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


GATV2_MAP = {
    "linear_transform/kernel": "kernel",
    "att": "att",
    "final_bias": "bias",
}


class TestGATv2Parity:
    @pytest.mark.parametrize("heads,concat", [(1, True), (3, True), (2, False)])
    def test_forward(self, heads, concat):
        x, ei = _graph(seed=9)
        mine = kgt.GATv2Conv(6, heads=heads, concat=concat)
        params = mine.init(jax.random.PRNGKey(7), x.shape[1])
        theirs = ref.GATv2Conv(6, heads=heads, concat=concat)
        theirs([x, ei])
        sync_weights(theirs, params, GATV2_MAP)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_context_path(self):
        from jax.experimental.pallas import tpu as pltpu

        from keras_geometric_tpu.ops.csr import prepare_graph

        x, ei = _graph(n=40, f=8, e=150, seed=10)
        mine = kgt.GATv2Conv(8, heads=2, add_self_loops=False)
        params = mine.init(jax.random.PRNGKey(8), x.shape[1])
        ctx = prepare_graph(ei, 40, add_self_loops=True)
        theirs = ref.GATv2Conv(8, heads=2, add_self_loops=True)
        theirs([x, ei])
        sync_weights(theirs, params, GATV2_MAP)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mine.apply(params, jnp.asarray(x), context=ctx))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)


SAGE_MAP = {
    "linear_neigh/kernel": "lin_neigh/kernel",
    "linear_self/kernel": "lin_self/kernel",
    "pool_mlp/kernel": "pool_mlp/kernel",
    "pool_mlp/bias": "pool_mlp/bias",
    "bias": "bias",
}


class TestSAGEParity:
    @pytest.mark.parametrize(
        "aggregator", ["mean", "max", "sum", "min", "std", "pooling"]
    )
    def test_aggregators(self, aggregator):
        x, ei = _graph(seed=11)
        mine = kgt.SAGEConv(8, aggregator=aggregator)
        params = mine.init(jax.random.PRNGKey(9), x.shape[1])
        theirs = ref.SAGEConv(8, aggregator=aggregator)
        theirs([x, ei])
        sync_weights(theirs, params, SAGE_MAP)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("root_weight", [True, False])
    @pytest.mark.parametrize("use_bias", [True, False])
    @pytest.mark.parametrize("normalize", [True, False])
    def test_flags(self, root_weight, use_bias, normalize):
        x, ei = _graph(seed=12)
        mine = kgt.SAGEConv(
            6, root_weight=root_weight, use_bias=use_bias,
            normalize=normalize,
        )
        params = mine.init(jax.random.PRNGKey(10), x.shape[1])
        theirs = ref.SAGEConv(
            6, root_weight=root_weight, use_bias=use_bias,
            normalize=normalize,
        )
        theirs([x, ei])
        sync_weights(theirs, params, SAGE_MAP)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_no_edges(self):
        x, _ = _graph(seed=13)
        ei = np.zeros((2, 0), np.int32)
        mine = kgt.SAGEConv(4)
        params = mine.init(jax.random.PRNGKey(11), x.shape[1])
        theirs = ref.SAGEConv(4)
        theirs([x, ei])
        sync_weights(theirs, params, SAGE_MAP)
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ei))
        want = np.asarray(theirs([x, ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


class TestPoolingParity:
    @pytest.mark.parametrize("pooling", ["mean", "max", "sum"])
    def test_global(self, pooling):
        x, _ = _graph(seed=14)
        mine = kgt.GlobalPooling(pooling=pooling)
        got = mine.apply({}, jnp.asarray(x))
        want = np.asarray(RefGlobalPooling(pooling=pooling)(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("pooling", ["mean", "max", "sum"])
    def test_batch_global(self, pooling):
        x, _ = _graph(n=10, seed=15)
        batch = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3], np.int32)
        mine = kgt.BatchGlobalPooling(pooling=pooling)
        got = mine.apply({}, jnp.asarray(x), jnp.asarray(batch), 4)
        want = np.asarray(RefBatchGlobalPooling(pooling=pooling)([x, batch]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    def test_attention(self):
        x, _ = _graph(seed=16)
        mine = kgt.AttentionPooling(attention_dim=16)
        params = mine.init(jax.random.PRNGKey(12), x.shape[1])
        theirs = RefAttentionPooling(attention_dim=16)
        theirs(x)
        sync_weights(theirs, params, {
            "attention_transform/kernel": "attention_transform/kernel",
            "attention_transform/bias": "attention_transform/bias",
            "attention_score/kernel": "attention_score/kernel",
            "attention_score/bias": "attention_score/bias",
        })
        got = mine.apply(params, jnp.asarray(x))
        want = np.asarray(theirs(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("steps", [1, 3])
    def test_set2set(self, steps):
        x, _ = _graph(seed=17)
        mine = kgt.Set2Set(output_dim=8, processing_steps=steps)
        params = mine.init(jax.random.PRNGKey(13), x.shape[1])
        theirs = RefSet2Set(output_dim=8, processing_steps=steps)
        theirs(x)
        sync_weights(theirs, params, {
            "lstm_cell/kernel": "lstm/kernel",
            "lstm_cell/recurrent_kernel": "lstm/recurrent_kernel",
            "lstm_cell/bias": "lstm/bias",
            "attention_dense/kernel": "attention_dense/kernel",
            "attention_dense/bias": "attention_dense/bias",
        })
        got = mine.apply(params, jnp.asarray(x))
        want = np.asarray(theirs(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


class TestBatchingParity:
    def test_batch_graphs(self):
        gs_mine, gs_ref = [], []
        for i, (n, e) in enumerate([(4, 6), (3, 2), (5, 0)]):
            x, ei = _graph(n=n, f=4, e=e, seed=20 + i, isolated=False)
            if e == 0:
                ei = np.zeros((2, 0), np.int32)
            y = np.array([i], np.int32)
            gs_mine.append(kgt.GraphData(x=x, edge_index=ei, y=y))
            gs_ref.append(ref.GraphData(x=x, edge_index=ei, y=y))
        mine = kgt.batch_graphs(gs_mine)
        want = ref.batch_graphs(gs_ref)
        np.testing.assert_allclose(
            np.asarray(mine.x), np.asarray(want.x), rtol=RTOL
        )
        np.testing.assert_array_equal(
            np.asarray(mine.edge_index), np.asarray(want.edge_index)
        )
        np.testing.assert_array_equal(
            np.asarray(mine.batch), np.asarray(want.batch)
        )

    def test_stacked_model(self):
        """2-layer heterogeneous stack end-to-end parity."""
        x, ei = _graph(n=12, f=6, e=30, seed=25)
        gcn_m = kgt.GCNConv(16)
        sage_m = kgt.SAGEConv(8, aggregator="mean")
        p1 = gcn_m.init(jax.random.PRNGKey(20), 6)
        p2 = sage_m.init(jax.random.PRNGKey(21), 16)
        gcn_r = ref.GCNConv(16)
        sage_r = ref.SAGEConv(8, aggregator="mean")
        gcn_r([x, ei])
        h_ref = np.asarray(gcn_r([x, ei]))
        sage_r([h_ref, ei])
        sync_weights(gcn_r, p1, {"kernel": "kernel", "bias": "bias"})
        sync_weights(sage_r, p2, SAGE_MAP)
        h1 = gcn_m.apply(p1, jnp.asarray(x), jnp.asarray(ei))
        got = sage_m.apply(p2, h1, jnp.asarray(ei))
        want = np.asarray(sage_r([np.asarray(gcn_r([x, ei])), ei]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=1e-4)
