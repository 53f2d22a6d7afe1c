"""Tensor (feature-dim) model parallelism: TP block == unsharded block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import keras_geometric_tpu as kgt
from keras_geometric_tpu.parallel import make_mesh
from keras_geometric_tpu.parallel.tensor_parallel import (
    column_parallel_dense,
    row_parallel_dense,
    shard_params_tp,
    tp_gcn_block_local,
)

pytestmark = pytest.mark.distributed

T = 8  # model-axis width (all virtual devices)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((T,), ("model",))


@pytest.fixture(scope="module")
def block():
    rng = np.random.default_rng(0)
    n, e, f_in, hidden, f_out = 60, 240, 12, 32, 8
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    ei = np.stack(
        [rng.integers(0, n, e), rng.integers(0, n, e)]
    ).astype(np.int32)
    gcn1 = kgt.GCNConv(hidden, add_self_loops=False, normalize=False)
    gcn2 = kgt.GCNConv(f_out, add_self_loops=False, normalize=False)
    params = {
        "layer_0": gcn1.init(jax.random.PRNGKey(0), f_in),
        "layer_1": gcn2.init(jax.random.PRNGKey(1), hidden),
    }
    ew = np.asarray(kgt.gcn_norm(jnp.asarray(ei), n))
    return x, ei, ew, params, (gcn1, gcn2)


def test_matmul_primitives(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((24, 32)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    want = (x @ w1) @ w2

    w1s = w1.reshape(24, T, 32 // T).transpose(1, 0, 2)
    w2s = w2.reshape(T, 32 // T, 8)

    def body(x, w1s, w2s):
        h = column_parallel_dense(x, w1s[0])
        return row_parallel_dense(h, w2s[0], axis="model")

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P("model"), P("model")),
        out_specs=P(), check_vma=False,
    ))
    np.testing.assert_allclose(fn(x, w1s, w2s), want, rtol=1e-5, atol=1e-5)


def test_tp_gcn_block_matches_unsharded(mesh, block):
    x, ei, ew, params, (gcn1, gcn2) = block
    n = x.shape[0]

    # Unsharded reference: 2 GCN layers with relu between (edge weights
    # precomputed, same preprocessing both sides).
    h = gcn1.apply(params["layer_0"], jnp.asarray(x), jnp.asarray(ei),
                   edge_weight=jnp.asarray(ew))
    h = jax.nn.relu(h)
    want = gcn2.apply(params["layer_1"], h, jnp.asarray(ei),
                      edge_weight=jnp.asarray(ew))

    shards = shard_params_tp(params, T)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(v) for v in xs]), *shards
    )
    senders = jnp.asarray(ei[0])
    receivers = jnp.asarray(ei[1])
    mask = jnp.ones(ei.shape[1], bool)

    def body(p, x):
        p_local = jax.tree_util.tree_map(lambda a: a[0], p)
        return tp_gcn_block_local(
            p_local, x, senders, receivers, jnp.asarray(ew), mask,
            axis="model",
        )

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("model"), P()), out_specs=P(),
        check_vma=False,
    ))
    got = fn(stacked, jnp.asarray(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert got.shape == (n, 8)


def test_tp_gradients_flow(mesh, block):
    x, ei, ew, params, _ = block
    shards = shard_params_tp(params, T)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(v) for v in xs]), *shards
    )
    senders = jnp.asarray(ei[0])
    receivers = jnp.asarray(ei[1])
    mask = jnp.ones(ei.shape[1], bool)

    def loss(p, x):
        def body(p, x):
            p_local = jax.tree_util.tree_map(lambda a: a[0], p)
            out = tp_gcn_block_local(
                p_local, x, senders, receivers, jnp.asarray(ew), mask,
            )
            return jnp.sum(out ** 2)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P("model"), P()), out_specs=P(),
            check_vma=False,
        )(p, x)

    grads = jax.jit(jax.grad(loss))(stacked, jnp.asarray(x))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_2d_graph_model_mesh_matches_unsharded(block):
    """(graph=4, model=2) mesh: nodes sharded over graph, features over
    model — the composed 2-D SPMD block must equal the unsharded one."""
    from keras_geometric_tpu.nn.module import get_activation
    from keras_geometric_tpu.parallel import partition_graph
    from keras_geometric_tpu.parallel.tensor_parallel import (
        tp_graph_gcn_block_local,
    )

    g_ax, t_ax = 4, 2
    mesh2 = make_mesh((g_ax, t_ax), ("graph", "model"))
    x, ei, ew, params, (gcn1, gcn2) = block
    n = x.shape[0]

    # Unsharded reference.
    h = gcn1.apply(params["layer_0"], jnp.asarray(x), jnp.asarray(ei),
                   edge_weight=jnp.asarray(ew))
    h = get_activation("relu")(h)
    want = np.asarray(
        gcn2.apply(params["layer_1"], h, jnp.asarray(ei),
                   edge_weight=jnp.asarray(ew))
    )

    pg = partition_graph(ei, n, g_ax, edge_weight=ew)
    shards = shard_params_tp(params, t_ax)
    k0 = np.stack([s["layer_0"]["kernel"] for s in shards])
    b0 = np.stack([s["layer_0"]["bias"] for s in shards])
    k1 = np.stack([s["layer_1"]["kernel"] for s in shards])
    b1 = np.stack([s["layer_1"]["bias"] for s in shards])
    l = pg.nodes_per_part
    x_pad = np.zeros((g_ax * l, x.shape[1]), np.float32)
    x_pad[:n] = x

    def body(xx, s, r, w, m, k0, b0, k1, b1):
        p = {
            "layer_0": {"kernel": k0[0], "bias": b0[0]},
            "layer_1": {"kernel": k1[0], "bias": b1[0]},
        }
        return tp_graph_gcn_block_local(
            p, xx, s[0], r[0], w[0], m[0]
        )

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh2,
        in_specs=(
            P("graph"), P("graph"), P("graph"), P("graph"), P("graph"),
            P("model"), P("model"), P("model"), P("model"),
        ),
        out_specs=P("graph"),
        check_vma=False,
    ))
    got = np.asarray(fn(
        x_pad, pg.senders_global, pg.receivers_local, pg.edge_weight,
        pg.edge_mask, k0, b0, k1, b1,
    ))[:n]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestGATv2TP:
    """VERDICT r4 item 8: head-axis tensor parallelism for attention."""

    @pytest.fixture(scope="class")
    def gat_block(self):
        rng = np.random.default_rng(5)
        n, e, f_in, f_out, heads = 60, 240, 12, 8, 8
        x = rng.standard_normal((n, f_in)).astype(np.float32)
        ei = np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)]
        ).astype(np.int32)
        layer = kgt.GATv2Conv(f_out, heads=heads, add_self_loops=False)
        params = layer.init(jax.random.PRNGKey(3), f_in)
        return x, ei, params, layer

    @pytest.mark.parametrize("concat", [True, False])
    def test_tp_gatv2_matches_unsharded(self, mesh, gat_block, concat):
        from keras_geometric_tpu.parallel.tensor_parallel import (
            shard_params_gatv2_tp,
            tp_gatv2_block_local,
        )

        x, ei, params, layer = gat_block
        if not concat:
            layer = kgt.GATv2Conv(
                layer.output_dim, heads=layer.heads,
                add_self_loops=False, concat=False,
            )
            params = layer.init(jax.random.PRNGKey(3), x.shape[1])
        want = np.asarray(
            layer.apply(params, jnp.asarray(x), jnp.asarray(ei))
        )
        shards = shard_params_gatv2_tp(params, T)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(v) for v in xs]), *shards
        )
        senders = jnp.asarray(ei[0])
        receivers = jnp.asarray(ei[1])
        mask = jnp.ones(ei.shape[1], bool)

        def body(p, xx):
            p_local = jax.tree_util.tree_map(lambda a: a[0], p)
            return tp_gatv2_block_local(
                p_local, xx, senders, receivers, mask,
                concat=concat, heads_total=layer.heads,
            )

        got = np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("model"), P()), out_specs=P(),
            check_vma=False,
        ))(stacked, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_2d_graph_model_gatv2_matches_unsharded(self, gat_block):
        from keras_geometric_tpu.parallel import partition_graph
        from keras_geometric_tpu.parallel.tensor_parallel import (
            shard_params_gatv2_tp,
            tp_graph_gatv2_block_local,
        )

        g_ax, t_ax = 4, 2
        mesh2 = make_mesh((g_ax, t_ax), ("graph", "model"))
        x, ei, params, layer = gat_block
        n = x.shape[0]
        want = np.asarray(
            layer.apply(params, jnp.asarray(x), jnp.asarray(ei))
        )
        pg = partition_graph(ei, n, g_ax)
        shards = shard_params_gatv2_tp(params, t_ax)
        kk = np.stack([s["kernel"] for s in shards])
        aa = np.stack([s["att"] for s in shards])
        bb = np.stack([s["bias"] for s in shards])
        l = pg.nodes_per_part
        x_pad = np.zeros((g_ax * l, x.shape[1]), np.float32)
        x_pad[:n] = x

        def body(xx, s, r, m, kk, aa, bb):
            p = {"kernel": kk[0], "att": aa[0], "bias": bb[0]}
            return tp_graph_gatv2_block_local(
                p, xx, s[0], r[0], m[0], heads_total=layer.heads,
            )

        got = np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh2,
            in_specs=(
                P("graph"), P("graph"), P("graph"), P("graph"),
                P("model"), P("model"), P("model"),
            ),
            out_specs=P("graph"),
            check_vma=False,
        ))(
            x_pad, pg.senders_global, pg.receivers_local, pg.edge_mask,
            kk, aa, bb,
        ))[:n]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_tp_gatv2_gradients_flow(self, mesh, gat_block):
        from keras_geometric_tpu.parallel.tensor_parallel import (
            shard_params_gatv2_tp,
            tp_gatv2_block_local,
        )

        x, ei, params, layer = gat_block
        shards = shard_params_gatv2_tp(params, T)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(v) for v in xs]), *shards
        )
        senders = jnp.asarray(ei[0])
        receivers = jnp.asarray(ei[1])
        mask = jnp.ones(ei.shape[1], bool)

        def loss(p, xx):
            def body(p, xx):
                p_local = jax.tree_util.tree_map(lambda a: a[0], p)
                out = tp_gatv2_block_local(
                    p_local, xx, senders, receivers, mask,
                    heads_total=layer.heads,
                )
                return jnp.sum(out ** 2)

            return jax.shard_map(
                body, mesh=mesh, in_specs=(P("model"), P()),
                out_specs=P(), check_vma=False,
            )(p, xx)

        grads = jax.jit(jax.grad(loss))(stacked, jnp.asarray(x))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0
