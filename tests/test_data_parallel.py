"""Graph-minibatch data parallelism tests on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keras_geometric_tpu.data.datasets import synthetic_graph
from keras_geometric_tpu.models import GIN, GraphClassifier
from keras_geometric_tpu.parallel import make_mesh
from keras_geometric_tpu.parallel.data_parallel import (
    make_dp_graph_classifier_step,
    stack_padded_batches,
)
from keras_geometric_tpu.training import TrainState
from keras_geometric_tpu.utils.data_utils import batch_graphs_padded

pytestmark = pytest.mark.distributed

P_DEV = 8
GRAPHS_PER_SHARD = 4


def make_buckets(rng_seed=0):
    """P buckets of padded graph batches + per-shard labels."""
    rng = np.random.default_rng(rng_seed)
    buckets, ys = [], []
    for p in range(P_DEV):
        gs = []
        y = np.full(GRAPHS_PER_SHARD + 1, -1, np.int32)
        for i in range(GRAPHS_PER_SHARD):
            c = int(rng.integers(3))
            g = synthetic_graph(10 + c, 30, 6, seed=int(rng.integers(1 << 31)))
            g.x[:, c] += 2.0
            gs.append(g)
            y[i] = c
        buckets.append(
            batch_graphs_padded(gs, node_bucket=128, edge_bucket=256)
        )
        ys.append(y)
    return buckets, np.stack(ys)


def test_dp_training_converges():
    mesh = make_mesh((P_DEV,), ("data",))
    model = GraphClassifier(
        encoder=GIN((16, 16)), num_classes=3, readout="mean"
    )
    params = model.init(jax.random.PRNGKey(0), 6)
    tx = optax.adam(0.02)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_dp_graph_classifier_step(
        model, tx, mesh, GRAPHS_PER_SHARD + 1
    )
    losses = []
    for i in range(30):
        buckets, ys = make_buckets(i % 3)
        data = stack_padded_batches(buckets, mesh)
        data["y"] = jax.device_put(
            jnp.asarray(ys),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        )
        state, loss = step(state, data)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
