"""Neighbor sampler + SAGE minibatch training tests."""

import numpy as np
import optax
import pytest

import jax

from keras_geometric_tpu.data.sampling import NeighborSampler, prefetch
from keras_geometric_tpu.data.datasets import synthetic_planetoid
from keras_geometric_tpu.nn.sage_conv import SAGEConv
from keras_geometric_tpu.training import TrainState
from keras_geometric_tpu.training.sage_minibatch import (
    make_sage_minibatch_step,
    subgraph_to_arrays,
)


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(1)
    n, e = 50, 200
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    return n, ei


class TestSampler:
    def test_edges_are_real(self, small):
        n, ei = small
        sampler = NeighborSampler(ei, n, (5, 3))
        sub = sampler.sample(np.array([0, 1, 2, 3]))
        true_edges = set(zip(ei[0].tolist(), ei[1].tolist()))
        for s_loc, r_loc, mask in sub.layers:
            for j in np.where(mask)[0]:
                g_s = sub.node_map[s_loc[j]]
                g_r = sub.node_map[r_loc[j]]
                assert (g_s, g_r) in true_edges

    def test_fanout_respected(self, small):
        n, ei = small
        sampler = NeighborSampler(ei, n, (4,))
        sub = sampler.sample(np.arange(10))
        s, r, mask = sub.layers[0]
        counts = np.bincount(r[mask], minlength=10)
        assert counts.max() <= 4

    def test_fixed_shapes_across_batches(self, small):
        n, ei = small
        sampler = NeighborSampler(ei, n, (5, 3))
        shapes = set()
        for sub in sampler.epoch(np.arange(n), batch_size=8):
            shapes.add(
                (sub.node_map.shape, tuple(l[0].shape for l in sub.layers))
            )
        assert len(shapes) == 1  # one compile for the whole epoch

    def test_prefetch_preserves_order_and_count(self, small):
        n, ei = small
        sampler = NeighborSampler(ei, n, (3,))
        direct = list(sampler.epoch(np.arange(n), 16, shuffle=False))
        fetched = list(
            prefetch(
                NeighborSampler(ei, n, (3,)).epoch(
                    np.arange(n), 16, shuffle=False
                )
            )
        )
        assert len(direct) == len(fetched)
        for a, b in zip(direct, fetched):
            np.testing.assert_array_equal(a.seed_ids, b.seed_ids)


class TestSageMinibatch:
    def test_training_converges(self):
        g = synthetic_planetoid("cora", seed=5)
        keep = 600
        sel = (g.edge_index[0] < keep) & (g.edge_index[1] < keep)
        ei = g.edge_index[:, sel]
        x, y = g.x[:keep, :64], g.y[:keep]
        c = int(y.max()) + 1

        sampler = NeighborSampler(ei, keep, (10, 5), seed=0)
        layers = (
            SAGEConv(output_dim=32),
            SAGEConv(output_dim=c, activation=None),
        )
        tx = optax.adam(0.01)
        key = jax.random.PRNGKey(0)
        params = {
            "layer_0": layers[0].init(key, x.shape[1]),
            "layer_1": layers[1].init(key, 32),
        }
        state = TrainState.create(params, tx, key)
        step, infer = make_sage_minibatch_step(layers, c, tx)

        losses = []
        for epoch in range(6):
            for sub in sampler.epoch(np.arange(keep), batch_size=64):
                data = subgraph_to_arrays(sub, x, y)
                state, loss = step(state, data)
                losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, (
            losses[:5], losses[-5:]
        )
